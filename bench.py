#!/usr/bin/env python3
"""Framework benchmark (run by the driver on real TPU hardware).

Prints exactly ONE JSON object line: the headline north-star record
(``metric``/``value``/``unit``/``vs_baseline``) with a ``submetrics`` field
carrying one record per BASELINE.json config — the three north stars plus
per-trainer step throughput for the remaining configs (classic AE, voxel
GAN, DeepSDF autodecoder, point GAN). Round 2 printed a bare ARRAY, which
the driver's single-object parser recorded as ``parsed: null``
(BENCH_r02.json) — hence the object-with-submetrics shape.

North stars (BASELINE.json):

1. ``sdf_mlp_points_per_sec_per_chip`` — fused Pallas grid kernel at the
   flagship workload (progressive hybrid GAN iteration 3: batch 16 x 64^3 =
   4.19M implicit-MLP evaluations per generator forward,
   /root/reference/train_hybrid_progressive_gan.py:37,41,95-96).
   vs_baseline: the reference *algorithm* on the same chip — materialized
   latent-repeat + concat MLP, XLA fp32 (train_hybrid_gan.py:63-66).

2. ``progressive_wgan_gp_steps_per_sec`` — full WGAN-GP training steps at
   32^3 (iteration 2, batch 16): critic update with the gradient-penalty
   double grad every step + generator update every 5th
   (train_hybrid_progressive_gan.py:102-111,135). vs_baseline: identical
   step with the generator volumes computed the reference way (repeat +
   tile + concat MLP, fp32).

3. ``raymarch_shapes_per_sec`` — one full render_image frame at the
   reference settings (800^2, ssaa 2, <=1000 trace iterations, shadow rays,
   ground shadows — rendering/raymarching.py:14,67) of a DeepSDF net
   overfit to the bundled chair. vs_baseline: the reference's raymarch
   algorithm (per-iteration host compaction, <=100k-point eval batches,
   fp32 concat MLP) reproduced on the same chip, compared at reduced
   settings (200^2, ssaa 1, 200 iterations) so the baseline completes in
   bench time; the ratio is conservative (the reference path's per-
   iteration host round trips grow with the iteration budget).

Submetrics additionally cover every BASELINE.json config:
``voxel_gan_steps_per_sec_32`` (config 2, the literally-named north star),
``progressive_wgan_gp_steps_per_sec_64`` (the paper's headline 64^3
iteration-3 workload), ``autoencoder_steps_per_sec_32`` (config 1),
``autodecoder_steps_per_sec`` (config 3),
``point_gan_steps_per_sec_4096`` (config 5b); the progressive step above is
configs 4/5a. See each bench function's docstring for its vs_baseline
definition.

Crash isolation (round-4 hardening; see _run_config): each config runs in
its own try/except with retries (the remote-compile link throws transient
INTERNAL errors — BENCH_r03.json lost a whole sweep to one), and every
completed metric is immediately echoed to stderr as a ``BENCH-PARTIAL``
JSON line so the driver-recorded output tail preserves partial sweeps.
stdout remains exactly one JSON object line. A config that fails all
attempts appears in submetrics as ``{"metric": ..., "error": ...}``.

Timing methodology (see memory/axon notes): kernels and train steps are
timed as K invocations inside one jitted lax.scan reduced to a scalar, and
the per-step time is the MARGINAL cost between a short and a 4x-long scan —
(t_long - t_short) / (3K). The remote-TPU link imposes a ~30 ms fixed cost
per dispatch (measured: a 2048^3-matmul scan's total wall time is ~33 ms at
10 reps and ~59 ms at 300), so a single-length measurement overstates small
per-step times by floor/K; differencing two lengths cancels the floor
exactly. Results must be pulled as VALUES (np.asarray) — on this link
jax.block_until_ready returns before the computation finishes. The raymarch
frame is host wall-clock of the second (steady-state) frame: the frame IS
one dispatch, so wall-clock is the honest end-to-end figure.

The reference repo publishes no numbers of its own (BASELINE.md), so its
algorithms on identical hardware are the honest baselines throughout.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from shapegan_tpu.ops import sdf_mlp
from shapegan_tpu.ops.coords import voxel_coordinates

BATCH = 16
RESOLUTION = 64
SCAN_ITERS = 20  # short-scan length; the marginal window is 3x this
GAN_STEPS = 25

# Persistent compilation cache: the raymarch pipeline compiles ~40 s through
# the remote-compile link; cache so repeated bench runs skip it.
try:
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bench"))
except Exception:
    pass


def make_scan_runner(inner, grid):
    @jax.jit
    def run(lats):
        def body(carry, lat):
            return carry + jnp.sum(inner(grid, lat)), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), lats)
        return total

    return run


def _pull(x):
    return float(np.asarray(x).ravel()[0])  # value fetch forces completion


def time_runner(run, lats, iters):
    """Marginal seconds/iteration between scans over ``lats`` and a 4x tile
    of it (cancels the fixed per-dispatch link cost)."""
    lats_long = jnp.concatenate([lats] * 4, axis=0)
    _pull(run(lats))
    _pull(run(lats_long))  # compile + warm both lengths
    t0 = time.perf_counter()
    _pull(run(lats))
    t1 = time.perf_counter()
    _pull(run(lats_long))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (3 * iters)


def bench_sdf_mlp():
    """North star 1: SDF-MLP points/sec/chip at the flagship grid workload."""
    on_tpu = jax.default_backend() == "tpu"
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    grid = jnp.asarray(voxel_coordinates(RESOLUTION))
    n_points = BATCH * RESOLUTION**3
    lats = jax.random.normal(jax.random.PRNGKey(1), (SCAN_ITERS, BATCH, 128))

    if on_tpu:
        from shapegan_tpu.ops.sdf_mlp_pallas import apply_grid_fused

        fused = lambda g, l: apply_grid_fused(params, g, l)
    else:  # CPU fallback so the script always emits a result
        fused = lambda g, l: sdf_mlp.apply_grid(params, g, l, dtype=jnp.bfloat16)

    def reference_algorithm(g, l):
        # The reference's computation, verbatim semantics: repeat the latent
        # per grid point, tile the grid per shape, run the concat MLP in fp32.
        lat_rep = jnp.repeat(l, g.shape[0], axis=0)
        pts_rep = jnp.tile(g, (l.shape[0], 1))
        return sdf_mlp.apply(params, pts_rep, lat_rep, dtype=jnp.float32)

    t_fused = time_runner(make_scan_runner(fused, grid), lats, SCAN_ITERS)
    t_reference = time_runner(make_scan_runner(reference_algorithm, grid), lats, SCAN_ITERS)

    return {
        "metric": "sdf_mlp_points_per_sec_per_chip",
        "value": round(n_points / t_fused, 1),
        "unit": "points/s",
        "vs_baseline": round(t_reference / t_fused, 3),
    }


def bench_gan_steps(iteration: int = 2, n_steps: int = GAN_STEPS, suffix: str = ""):
    """North star 2: progressive WGAN-GP steps/sec with the GP double-grad
    included (reference train_hybrid_progressive_gan.py:102-111,135).

    iteration=2 is 32^3 (the BENCH config); iteration=3 is the paper's
    headline 64^3 workload (batch 16 x 64^3 = 4.19M MLP evals per G forward,
    train_hybrid_progressive_gan.py:37,41). At 64^3 the literal reference
    formulation (materialize the [B*P, 128] latent repeat, store fp32
    activations for the backward) needs ~20 GB of HBM and cannot run on a
    16 GB chip, so the 64^3 baseline gets the strongest memory-feasible
    rendition of the reference algorithm: the same fp32 concat MLP evaluated
    in 16k-point chunks (per-chunk latent repeat, like the reference's own
    evaluate_in_batches, model/sdf_net.py:63-75) under jax.checkpoint for
    the generator backward. That only makes the baseline faster than a
    literal translation would be, so the ratio is conservative."""
    import optax

    from shapegan_tpu.models.progressive_gan import RESOLUTIONS, ProgressiveDiscriminator
    from shapegan_tpu.ops.losses import gradient_penalty
    from shapegan_tpu.train import hybrid_progressive_gan as prog
    from shapegan_tpu.train.hybrid_gan import generate_volumes, generate_volumes_inference

    batch = 16
    res = RESOLUTIONS[iteration]
    net, disc, g_params0, d_params0 = prog.create_models(seed=0)
    # The reference critic genuinely computes the zero-padded entry conv
    # (model/progressive_gan.py:9-16); ours slices the kernel to the one
    # real input channel (bit-exact). Baseline gets the reference critic.
    disc_ref = ProgressiveDiscriminator(entry_slice=False)
    g_tx = optax.rmsprop(1e-4)
    d_tx = optax.rmsprop(1e-4)
    grid = jnp.asarray(voxel_coordinates(res))
    data = jax.random.uniform(
        jax.random.PRNGKey(3), (batch, res, res, res), minval=-0.1, maxval=0.1
    )

    def make_runner(gen_train, gen_infer, disc):
        def d_loss(d_params, g_params, real, rng):
            z_rng, gp_rng = jax.random.split(rng)
            z = jax.random.normal(z_rng, (batch, 128))
            fake = jax.lax.stop_gradient(gen_infer(g_params, z))
            critic = lambda x: disc.apply(
                {"params": d_params}, x, iteration=iteration, fade_in_progress=1.0
            )
            gp = gradient_penalty(critic, gp_rng, real, fake, weight=10.0)
            return jnp.mean(critic(fake)) - jnp.mean(critic(real)) + gp

        def g_loss(g_params, d_params, rng):
            z = jax.random.normal(rng, (batch, 128))
            fake = gen_train(g_params, z)
            return -jnp.mean(
                disc.apply({"params": d_params}, fake, iteration=iteration, fade_in_progress=1.0)
            )

        @jax.jit
        def run(g_params, d_params, real, steps):
            g_opt = g_tx.init(g_params)
            d_opt = d_tx.init(d_params)

            def body(carry, step):
                g_params, g_opt, d_params, d_opt = carry
                rng = jax.random.fold_in(jax.random.PRNGKey(7), step)
                d_grads = jax.grad(d_loss)(d_params, g_params, real, rng)
                d_upd, d_opt = d_tx.update(d_grads, d_opt, d_params)
                d_params = optax.apply_updates(d_params, d_upd)

                def g_update(args):
                    g_params, g_opt = args
                    g_grads = jax.grad(g_loss)(g_params, d_params, jax.random.fold_in(rng, 1))
                    g_upd, g_opt = g_tx.update(g_grads, g_opt, g_params)
                    return optax.apply_updates(g_params, g_upd), g_opt

                g_params, g_opt = jax.lax.cond(
                    step % 5 == 0, g_update, lambda a: a, (g_params, g_opt)
                )
                return (g_params, g_opt, d_params, d_opt), None

            carry, _ = jax.lax.scan(body, (g_params, g_opt, d_params, d_opt), steps)
            return sum(
                l.ravel()[0].astype(jnp.float32) for l in jax.tree.leaves(carry)
            )[None]

        return run

    def time_step_runner(run, *args):
        short = jnp.arange(n_steps)
        long = jnp.arange(4 * n_steps)
        _pull(run(*args, short))
        _pull(run(*args, long))
        t0 = time.perf_counter()
        _pull(run(*args, short))
        t1 = time.perf_counter()
        _pull(run(*args, long))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (3 * n_steps)

    ours = make_runner(
        lambda p, z: generate_volumes(net, p, grid, z, res),
        lambda p, z: generate_volumes_inference(net, p, grid, z, res),
        disc,
    )

    def ref_volumes(p, z):
        lat_rep = jnp.repeat(z, grid.shape[0], axis=0)
        pts_rep = jnp.tile(grid, (z.shape[0], 1))
        out = sdf_mlp.apply(p, pts_rep, lat_rep, dtype=jnp.float32)
        return out.reshape(batch, res, res, res)

    def ref_volumes_chunked(p, z, chunk=16384):
        # 64^3 baseline: same fp32 concat MLP, chunked so it fits (docstring).
        chunks = grid.reshape(-1, chunk, 3)

        @jax.checkpoint
        def eval_chunk(p, z, c):
            lat_rep = jnp.repeat(z, chunk, axis=0)
            pts_rep = jnp.tile(c, (z.shape[0], 1))
            out = sdf_mlp.apply(p, pts_rep, lat_rep, dtype=jnp.float32)
            return out.reshape(z.shape[0], chunk)

        out = jax.lax.map(lambda c: eval_chunk(p, z, c), chunks)
        return jnp.moveaxis(out, 0, 1).reshape(batch, res, res, res)

    ref_gen = ref_volumes if res**3 * batch <= 16 * 32**3 else ref_volumes_chunked
    baseline = make_runner(ref_gen, ref_gen, disc_ref)

    t_ours = time_step_runner(ours, g_params0, d_params0, data)
    t_base = time_step_runner(baseline, g_params0, d_params0, data)

    return {
        "metric": "progressive_wgan_gp_steps_per_sec" + suffix,
        "value": round(1.0 / t_ours, 2),
        "unit": "steps/s",
        "vs_baseline": round(t_base / t_ours, 3),
    }


def _timed_state_scan(step, init_state, n_steps):
    """Marginal seconds/step of a state-carrying training step: the
    difference between a 4x-long and a short jitted scan divided by the step
    delta (cancels the fixed per-dispatch link cost; states evolve through
    the carry, so iterations are genuinely serialized)."""

    @jax.jit
    def run(state, steps):
        def body(carry, i):
            return step(carry, i), None

        final, _ = jax.lax.scan(body, state, steps)
        # Depend on EVERY leaf of the final state: flax TrainState's first
        # leaf is the scalar step counter, and returning only it lets XLA
        # dead-code-eliminate the whole params/optimizer chain across all
        # iterations (observed: 446k "steps/s").
        return sum(
            l.ravel()[0].astype(jnp.float32) for l in jax.tree.leaves(final)
        )[None]

    short = jnp.arange(n_steps)
    long = jnp.arange(4 * n_steps)
    _pull(run(init_state, short))
    _pull(run(init_state, long))  # compile + warm both lengths
    t0 = time.perf_counter()
    _pull(run(init_state, short))
    t1 = time.perf_counter()
    _pull(run(init_state, long))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (3 * n_steps)


def bench_voxel_gan():
    """BASELINE.json config 2 + the literally-named north-star metric
    ``voxel-GAN steps/sec at 32^3``: one fused G+D(fake)+D(real) train step
    of the plain voxel GAN (train/gan.py semantics: non-saturating G loss,
    BCE D losses, Adam 1e-3/1e-5, batch 64 — reference train_gan.py:28-39,
    65-86). vs_baseline: the identical step under fp32-highest matmul/conv
    precision — the reference's fp32 cuDNN numerics — over our production
    precision policy."""
    from shapegan_tpu.train import gan as gan_train

    generator, discriminator, g_state, d_state = gan_train.create_states(jax.random.PRNGKey(0))
    batch = jax.random.uniform(jax.random.PRNGKey(1), (64, 32, 32, 32), minval=-1, maxval=1)

    def step(carry, i):
        g_state, d_state = carry
        rng = jax.random.fold_in(jax.random.PRNGKey(5), i)
        g_state, d_state, _, _ = gan_train.train_step(
            generator, discriminator, g_state, d_state, batch, rng
        )
        return (g_state, d_state)

    t_ours = _timed_state_scan(step, (g_state, d_state), GAN_STEPS)

    def step_hi(carry, i):
        with jax.default_matmul_precision("highest"):
            return step(carry, i)

    t_ref = _timed_state_scan(step_hi, (g_state, d_state), GAN_STEPS)
    return {
        "metric": "voxel_gan_steps_per_sec_32",
        "value": round(1.0 / t_ours, 2),
        "unit": "steps/s",
        "vs_baseline": round(t_ref / t_ours, 3),
    }


def bench_autoencoder():
    """BASELINE.json config 1: classic AE train step at 32^3, batch 32
    (reference train_autoencoder.py:22,35 — x32 sign-weighted L1, Adam 5e-5).
    vs_baseline as in bench_voxel_gan."""
    from shapegan_tpu.models.autoencoder import Autoencoder
    from shapegan_tpu.train import autoencoder as ae

    model = Autoencoder(is_variational=False)
    state = ae.create_state(model, jax.random.PRNGKey(0))
    batch = jax.random.uniform(jax.random.PRNGKey(1), (32, 32, 32, 32), minval=-1, maxval=1)

    def step(carry, i):
        rng = jax.random.fold_in(jax.random.PRNGKey(5), i)
        new_state, _, _ = ae.train_step(model, carry, batch, rng)
        return new_state

    t_ours = _timed_state_scan(step, state, GAN_STEPS)

    def step_hi(carry, i):
        with jax.default_matmul_precision("highest"):
            return step(carry, i)

    t_ref = _timed_state_scan(step_hi, state, GAN_STEPS)
    return {
        "metric": "autoencoder_steps_per_sec_32",
        "value": round(1.0 / t_ours, 2),
        "unit": "steps/s",
        "vs_baseline": round(t_ref / t_ours, 3),
    }


def bench_autodecoder():
    """BASELINE.json config 3: DeepSDF autodecoder step — batch 20k points,
    both Adams + latent L2 reg (reference train_sdf_autodecoder.py:26,44-45,
    88). vs_baseline: the reference's formulation on the same chip — gather
    [N, 128] latent rows per point and run the fp32 concat MLP
    (train_sdf_autodecoder.py:78-87) — vs our production step (same gather,
    bf16 matmul inputs with fp32 master weights)."""
    import optax

    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.train import sdf_autodecoder as ad

    model_count, pc_size, batch = 8, 25000, 20000
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.uniform(-1, 1, (model_count * pc_size, 3)).astype(np.float32))
    sdf = jnp.asarray(
        np.clip(rng.normal(0, 0.05, model_count * pc_size), -0.1, 0.1).astype(np.float32)
    )
    net = SDFNet()
    net_tx, code_tx = optax.adam(1e-5), optax.adam(1e-5)
    params = net.init(jax.random.PRNGKey(0))
    codes = jax.random.normal(jax.random.PRNGKey(1), (model_count, 128)) * 1e-4
    step_fn, _ = ad.make_train_step(net, net_tx, code_tx, pc_size)
    batches = jnp.asarray(
        rng.integers(0, model_count * pc_size, (GAN_STEPS, batch)), jnp.int32
    )

    def step(carry, i):
        params, codes, net_opt, code_opt = carry
        # Modulo: the 4x-long timing scan must cycle fresh index sets, not
        # clamp to the last row (bench_profile.autodecoder_breakdown does the
        # same).
        params, codes, net_opt, code_opt, _ = step_fn(
            params, codes, net_opt, code_opt, points, sdf, batches[i % GAN_STEPS]
        )
        return (params, codes, net_opt, code_opt)

    state = (params, codes, net_tx.init(params), code_tx.init(codes))
    t_ours = _timed_state_scan(step, state, GAN_STEPS)

    # Reference formulation: per-point latent row gather + fp32 concat MLP.
    def ref_step(carry, i):
        params, codes, net_opt, code_opt = carry
        indices = batches[i % GAN_STEPS]
        shape_indices = indices // pc_size

        def loss_fn(p, c):
            batch_codes = c[shape_indices]
            out = sdf_mlp.apply(p, points[indices], batch_codes, dtype=jnp.float32)
            return jnp.mean(jnp.abs(out - sdf[indices])) + ad.SIGMA * jnp.mean(
                batch_codes**2
            )

        (net_g, code_g) = jax.grad(loss_fn, argnums=(0, 1))(params, codes)
        upd, net_opt = net_tx.update(net_g, net_opt, params)
        params = optax.apply_updates(params, upd)
        cupd, code_opt = code_tx.update(code_g, code_opt, codes)
        codes = optax.apply_updates(codes, cupd)
        return (params, codes, net_opt, code_opt)

    t_ref = _timed_state_scan(ref_step, state, GAN_STEPS)
    return {
        "metric": "autodecoder_steps_per_sec",
        "value": round(1.0 / t_ours, 2),
        "unit": "steps/s",
        "vs_baseline": round(t_ref / t_ours, 3),
    }


def bench_autodecoder_big_batch(batch: int = 65536):
    """Config 3b: the autodecoder's opt-in big-batch mode
    (train_sdf_autodecoder: ``batch_size=65536 scale_lr``) in points/s.

    vs_baseline basis: WORKLOAD-EXTENDED — the baseline is the reference
    formulation (fp32 concat MLP, both Adams) at the reference's OWN batch
    of 20k points (its semantics; BASELINE.md's rowwise-kernel rejection
    shows that step is HBM-latency-bound, so throughput at 20k is the
    formulation ceiling ~1.4x). The big batch amortizes the per-step floor;
    the multiplier therefore measures precision policy + batch amortization
    together and is NOT commensurable with the same-workload rows."""
    import optax

    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.train import sdf_autodecoder as ad

    model_count, pc_size, ref_batch = 8, 25000, 20000
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.uniform(-1, 1, (model_count * pc_size, 3)).astype(np.float32))
    sdf = jnp.asarray(
        np.clip(rng.normal(0, 0.05, model_count * pc_size), -0.1, 0.1).astype(np.float32)
    )
    net = SDFNet()
    # lr follows the trainer's scale_lr rule; it does not affect step time.
    net_tx, code_tx = optax.adam(1e-5 * batch / ref_batch), optax.adam(1e-5 * batch / ref_batch)
    params = net.init(jax.random.PRNGKey(0))
    codes = jax.random.normal(jax.random.PRNGKey(1), (model_count, 128)) * 1e-4
    step_fn, _ = ad.make_train_step(net, net_tx, code_tx, pc_size)
    n_steps = max(4, GAN_STEPS // 4)  # 3.3x the work per step of config 3
    batches = jnp.asarray(
        rng.integers(0, model_count * pc_size, (n_steps, batch)), jnp.int32
    )

    def step(carry, i):
        params, codes, net_opt, code_opt = carry
        params, codes, net_opt, code_opt, _ = step_fn(
            params, codes, net_opt, code_opt, points, sdf, batches[i % n_steps]
        )
        return (params, codes, net_opt, code_opt)

    state = (params, codes, net_tx.init(params), code_tx.init(codes))
    t_ours = _timed_state_scan(step, state, n_steps)

    # Baseline: the reference formulation at ITS batch (reuse config 3's
    # measured reference by re-running it here at ref_batch).
    ref_tx = optax.adam(1e-5)
    ref_batches = jnp.asarray(
        rng.integers(0, model_count * pc_size, (GAN_STEPS, ref_batch)), jnp.int32
    )

    def ref_step(carry, i):
        params, codes, net_opt, code_opt = carry
        indices = ref_batches[i % GAN_STEPS]
        shape_indices = indices // pc_size

        def loss_fn(p, c):
            batch_codes = c[shape_indices]
            out = sdf_mlp.apply(p, points[indices], batch_codes, dtype=jnp.float32)
            return jnp.mean(jnp.abs(out - sdf[indices])) + ad.SIGMA * jnp.mean(
                batch_codes**2
            )

        (net_g, code_g) = jax.grad(loss_fn, argnums=(0, 1))(params, codes)
        upd, net_opt = ref_tx.update(net_g, net_opt, params)
        params = optax.apply_updates(params, upd)
        cupd, code_opt = ref_tx.update(code_g, code_opt, codes)
        codes = optax.apply_updates(codes, cupd)
        return (params, codes, net_opt, code_opt)

    ref_state = (params, codes, ref_tx.init(params), ref_tx.init(codes))
    t_ref = _timed_state_scan(ref_step, ref_state, GAN_STEPS)
    return {
        "metric": "autodecoder_points_per_sec_big_batch",
        "value": round(batch / t_ours / 1e6, 2),
        "unit": "M points/s",
        "vs_baseline": round((batch / t_ours) / (ref_batch / t_ref), 3),
    }


def bench_point_gan():
    """BASELINE.json config 5b: point-GAN WGAN-GP steps at curriculum stage
    (4096 points, batch 32) — critic step every batch + generator every 5th
    (reference train_point_gan.py:31-38,61-77). vs_baseline: fp32 activations
    at fp32-highest matmul precision (reference fp32 cuBLAS numerics) —
    built from a SEPARATE fp32-dtype model pair, since the production models
    carry bf16 compute dtype and a precision context alone would not undo
    their activation casts."""
    import optax

    from shapegan_tpu.train import point_gan

    n_points, batch = 4096, 32
    u = jax.random.uniform(jax.random.PRNGKey(1), (batch, n_points, 4), minval=-1, maxval=1)
    u_pos, u_dist = u[..., :3], u[..., 3:]
    g_tx = optax.rmsprop(1e-4)
    d_tx = optax.rmsprop(1e-4)

    def make_step(dtype):
        generator, discriminator, g_params, d_params = point_gan.create_models(
            seed=0, dtype=dtype)
        d_step, g_step = point_gan.make_steps(generator, discriminator, g_tx, d_tx)

        def step(carry, i):
            g_params, g_opt, d_params, d_opt = carry
            rng = jax.random.fold_in(jax.random.PRNGKey(5), i)
            drng, grng = jax.random.split(rng)
            d_params, d_opt, _, _ = d_step(g_params, d_params, d_opt, u_pos, u_dist, drng)

            def g_update(args):
                g_params, g_opt = args
                return g_step(g_params, g_opt, d_params, u_pos, grng)[:2]

            g_params, g_opt = jax.lax.cond(i % 5 == 0, g_update, lambda a: a, (g_params, g_opt))
            return (g_params, g_opt, d_params, d_opt)

        return step, (g_params, g_tx.init(g_params), d_params, d_tx.init(d_params))

    step, state = make_step(point_gan.COMPUTE_DTYPE)
    t_ours = _timed_state_scan(step, state, GAN_STEPS)

    step_f32, state_f32 = make_step(jnp.float32)

    def step_hi(carry, i):
        with jax.default_matmul_precision("highest"):
            return step_f32(carry, i)

    t_ref = _timed_state_scan(step_hi, state_f32, GAN_STEPS)
    return {
        "metric": "point_gan_steps_per_sec_4096",
        "value": round(1.0 / t_ours, 2),
        "unit": "steps/s",
        "vs_baseline": round(t_ref / t_ours, 3),
    }


def _overfit_chair(steps=800):
    """Fit a zero-latent SDFNet to the bundled chair so the raymarch metric
    traces a realistic surface (an untrained net all-misses instantly)."""
    import optax

    from shapegan_tpu.data.mesh_io import load_mesh
    from shapegan_tpu.data.mesh_to_sdf import sample_sdf_near_surface
    from shapegan_tpu.examples import example_chair_path
    from shapegan_tpu.models.sdf_net import SDFNet

    mesh = load_mesh(example_chair_path()).scaled_to_unit_sphere()
    points, sdf = sample_sdf_near_surface(mesh, 200000)
    sdf = np.clip(sdf, -0.1, 0.1)
    points_j, sdf_j = jnp.asarray(points), jnp.asarray(np.asarray(sdf, np.float32))

    net = SDFNet(latent_code_size=0)
    params = net.init(jax.random.PRNGKey(0))
    code = jnp.zeros(0)
    tx = optax.adam(1e-4)

    @jax.jit
    def fit(params, idx_all):
        opt_state = tx.init(params)

        def body(carry, idx):
            params, opt_state = carry

            def loss_fn(p):
                out = net.apply_grid(p, points_j[idx], code[None])[0]
                return jnp.mean(jnp.abs(out - sdf_j[idx]))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, _), losses = jax.lax.scan(body, (params, opt_state), idx_all)
        return params, losses[-1]

    rng = np.random.default_rng(0)
    idx_all = jnp.asarray(rng.integers(0, len(points), (steps, 16384)))
    params, loss = fit(params, idx_all)
    return net, jax.block_until_ready(params), np.zeros(0, np.float32)


def _reference_raymarch_seconds(params, latent, resolution, iterations):
    """The reference raymarch ALGORITHM on this chip: per-iteration host
    compaction by fancy indexing (raymarching.py:106-122), SDF evaluation in
    <=100k-point fp32 concat-MLP batches padded to power-of-two buckets (XLA
    needs static shapes; the padding only makes the baseline FASTER than a
    shape-per-compile emulation), autograd normals and 200-step shadow/ground
    passes with the same loop. Host round trip every iteration, as in torch."""
    from shapegan_tpu.render.raymarching import CAMERA_POSITION, LIGHT_POSITION

    latent_j = jnp.asarray(latent)

    def eval_padded(pts):
        n = pts.shape[0]
        bucket = 1 << max(7, (n - 1).bit_length())
        padded = np.concatenate([pts, np.zeros((bucket - n, 3), np.float32)])
        lat_rep = jnp.repeat(latent_j[None, :], bucket, axis=0)
        out = _eval_jit(jnp.asarray(padded), lat_rep)
        return np.asarray(out)[:n]

    @jax.jit
    def _eval_jit(pts, lat_rep):
        return sdf_mlp.apply(params, pts, lat_rep, dtype=jnp.float32)

    @jax.jit
    def _normals_jit(pts, lat_rep):
        f = lambda q: jnp.sum(sdf_mlp.apply(params, q, lat_rep, dtype=jnp.float32))
        return jax.grad(f)(pts)

    def normals_padded(pts):
        n = pts.shape[0]
        bucket = 1 << max(7, (n - 1).bit_length())
        padded = np.concatenate([pts, np.zeros((bucket - n, 3), np.float32)])
        lat_rep = jnp.repeat(latent_j[None, :], bucket, axis=0)
        return np.asarray(_normals_jit(jnp.asarray(padded), lat_rep))[:n]

    def trace(points, directions, iters, threshold, clamp, kind):
        points = points.copy()
        active = np.arange(points.shape[0])
        hit = np.zeros(points.shape[0], dtype=bool)
        for _ in range(iters):
            if active.size == 0:
                break
            sdf = np.clip(eval_padded(points[active]), -clamp, clamp)
            points[active] += directions[active] * sdf[:, None]
            hits = (sdf > 0) & (sdf < threshold)
            if kind == "shadow":
                misses = points[active][:, 1] > 1.0
            else:
                misses = np.linalg.norm(points[active], axis=1) > 1.0
            hit[active[hits]] = True
            active = active[~hits & ~misses]
        hit[active] = True  # budget exhaustion counts as hit (reference :122)
        return points, hit

    # Camera rays (same math as render_image).
    cam = CAMERA_POSITION
    fwd = -cam / np.linalg.norm(cam)
    right = np.cross(fwd, [0.0, 1.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    up /= np.linalg.norm(up)
    lin = np.linspace(-1, 1, resolution)
    u, v = np.meshgrid(lin, lin)
    uv = np.stack([u.ravel(), v.ravel()], axis=1)
    focal = 1.0 / np.tan(np.arcsin(1.0 / np.linalg.norm(cam)))
    dirs = (uv[:, :1] * right + uv[:, 1:] * up + focal * fwd).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = np.tile(cam, (uv.shape[0], 1)).astype(np.float32)
    b = 2 * np.einsum("ij,ij->i", pts, dirs)
    disc = b * b - 4 * (np.dot(cam, cam) - 1.0)
    entered = disc >= 0
    pts[entered] += dirs[entered] * ((-b[entered] - np.sqrt(disc[entered])) / 2)[:, None]

    t0 = time.perf_counter()
    traced, hit = trace(pts[entered], dirs[entered], iterations, 0.0005, 0.02, "primary")
    model_points = traced[hit]
    if model_points.shape[0]:
        normals_padded(model_points)
        to_light = LIGHT_POSITION[None, :] - model_points
        to_light /= np.linalg.norm(to_light, axis=1, keepdims=True)
        trace(model_points + to_light * 0.1, to_light, 200, 0.001, 0.1, "shadow")
        # Ground pass: shadow-trace the below-model rays toward the light.
        ground = dirs[:, 1] < 0
        g = pts[ground] if ground.any() else np.zeros((0, 3), np.float32)
        if g.shape[0]:
            gl = LIGHT_POSITION[None, :] - g
            gl /= np.linalg.norm(gl, axis=1, keepdims=True)
            trace(g + gl * 0.1, gl, 200, 0.001, 0.1, "shadow")
    return time.perf_counter() - t0


def bench_raymarch():
    """North star 3: shapes/sec for a full reference-settings raymarched
    frame (the whole frame is one device dispatch — see render/raymarching)."""
    from shapegan_tpu.render.raymarching import render_image

    net, params, code = _overfit_chair()

    render_image(net, params, code)  # compile + warm
    t0 = time.perf_counter()
    render_image(net, params, code)
    t_frame = time.perf_counter() - t0

    # vs_baseline at reduced settings (200^2, ssaa 1, 200 iterations): the
    # reference algorithm's per-iteration host round trips make full settings
    # impractical inside a bench budget; the reduced ratio is conservative.
    small = dict(resolution=200, ssaa=1, iterations=200)
    render_image(net, params, code, **small)  # compile
    t1 = time.perf_counter()
    render_image(net, params, code, **small)
    t_ours_small = time.perf_counter() - t1
    t_ref_small = _reference_raymarch_seconds(params, code, 200, 200)

    return {
        "metric": "raymarch_shapes_per_sec",
        "value": round(1.0 / t_frame, 3),
        "unit": "shapes/s",
        "vs_baseline": round(t_ref_small / t_ours_small, 3),
    }


def _run_config(name, fn, retries=2, retry_sleep=5.0):
    """Run one bench config with crash isolation.

    Round 3's sweep died at config 6/7 on a transient remote-compile link
    error and — because results were only printed at the very end — lost
    every already-measured metric (BENCH_r03.json rc=1, parsed null). Each
    config therefore (a) retries on failure (the link errors are transient;
    a genuine bug just fails all attempts and is recorded as an error
    submetric), and (b) is emitted to stderr the moment it completes — the
    driver records the output tail, so completed metrics survive any later
    crash while stdout stays a single JSON object line."""
    import sys

    last = None
    for attempt in range(1 + retries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — crash isolation is the point
            last = e
            msg = f"{type(e).__name__}: {e}"
            print(f"BENCH-ERROR {name} attempt {attempt + 1}/{1 + retries}: "
                  f"{msg[:400]}", file=sys.stderr, flush=True)
            time.sleep(retry_sleep)
    return {"metric": name, "error": f"{type(last).__name__}: {last}"[:500]}


def main():
    import sys

    configs = [
        ("sdf_mlp_points_per_sec_per_chip", bench_sdf_mlp),     # north star 1 (headline)
        ("voxel_gan_steps_per_sec_32", bench_voxel_gan),        # north star 2, literally named
        ("progressive_wgan_gp_steps_per_sec", bench_gan_steps), # flagship @ 32^3
        ("progressive_wgan_gp_steps_per_sec_64",                # flagship @ 64^3 (paper headline)
         lambda: bench_gan_steps(iteration=3, n_steps=8, suffix="_64")),
        ("raymarch_shapes_per_sec", bench_raymarch),            # north star 3
        ("autoencoder_steps_per_sec_32", bench_autoencoder),    # config 1
        ("autodecoder_steps_per_sec", bench_autodecoder),       # config 3
        ("autodecoder_points_per_sec_big_batch",                # config 3b (opt-in mode)
         bench_autodecoder_big_batch),
        ("point_gan_steps_per_sec_4096", bench_point_gan),      # config 5b
    ]
    submetrics = []
    for name, fn in configs:
        record = _run_config(name, fn)
        submetrics.append(record)
        print("BENCH-PARTIAL " + json.dumps(record), file=sys.stderr, flush=True)
    headline = next((dict(r) for r in submetrics if "error" not in r), dict(submetrics[0]))
    headline["submetrics"] = submetrics
    print(json.dumps(headline), flush=True)


def _fail_fast_if_backend_hung(timeout_s: float = 180.0) -> None:
    """A dead remote-TPU tunnel makes the first jax.devices() touch hang
    FOREVER (observed for hours); probe the backend (in a throwaway
    subprocess, shapegan_tpu.util.probe_jax_backend) so the bench fails fast
    with a diagnostic instead of hanging the driver's whole bench window."""
    import sys

    from shapegan_tpu.util import probe_jax_backend

    count, detail = probe_jax_backend(timeout_s)
    if count >= 0:
        return
    print(f"bench.py: JAX backend unreachable ({detail}); "
          "refusing to hang — is the TPU tunnel up?", file=sys.stderr)
    raise SystemExit(1)


if __name__ == "__main__":
    _fail_fast_if_backend_hung()
    main()
