#!/usr/bin/env python3
"""Per-stage timing breakdown of the progressive WGAN-GP training step.

Answers "where does the step time go" for the flagship trainer at a given
growth iteration (default 2 → 32^3, batch 16, the BENCH config): generator
volume evaluation (fwd and fwd+bwd), critic forward, critic fwd+bwd, the
gradient-penalty double grad, the full critic/generator steps, and the
optimizer update. Each stage is timed device-side as K invocations inside a
jitted lax.scan (tunnel-latency-free; same methodology as bench.py).

Usage: python bench_profile.py [iteration=N] [batch=N] [reps=N]
       python bench_profile.py raymarch=1 [resolution=N]   # live-lane decay
       python bench_profile.py stages=1                    # raymarch stage budget
       python bench_profile.py coherence=1                 # block coherence of live lanes
       python bench_profile.py autodecoder=1 [reps=N]      # autodecoder step breakdown
       python bench_profile.py point_gan=1 [reps=N]        # point-GAN step breakdown

Reference workload being decomposed:
/root/reference/train_hybrid_progressive_gan.py:102-111 (GP), :135-149 (G
step), :153-166 (D step).
"""

import os
import sys
import time

import jax

try:  # persistent compile cache: tunnel compiles are 40-90 s each
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bench"))
except Exception:
    pass
import jax.numpy as jnp
import numpy as np
import optax

from shapegan_tpu.models.progressive_gan import RESOLUTIONS
from shapegan_tpu.ops.coords import voxel_coordinates
from shapegan_tpu.ops.losses import gradient_penalty
from shapegan_tpu.train import hybrid_progressive_gan as prog
from shapegan_tpu.train.hybrid_gan import generate_volumes, generate_volumes_inference


def parse_args(argv):
    opts = {"iteration": 2, "batch": 16, "reps": 20, "raymarch": 0, "resolution": 400,
            "stages": 0, "autodecoder": 0, "point_gan": 0, "coherence": 0, "stash": 0}
    for arg in argv:
        if "=" in arg:
            k, v = arg.split("=", 1)
            if k in opts:
                opts[k] = int(v)
    return opts


def timed_scan(fn, reps, *args):
    """Marginal seconds per invocation of ``fn(*args, fold_key)`` between a
    short and a 4x-long jitted scan.

    Differencing cancels the remote link's ~30 ms fixed per-dispatch cost
    (which otherwise drowns sub-ms stages at small rep counts). Every leaf
    of the first argument is gated through a data-dependent ``where`` on the
    carry so every iteration's input is opaque to XLA — neither
    loop-invariant hoisting nor linearity-based distribution (conv(a + eps)
    = conv(a) + conv(eps)) can remove the measured work. Results are pulled
    as VALUES: on this link jax.block_until_ready returns early."""

    def make(n):
        @jax.jit
        def run(args):
            def body(carry, step):
                first, rest = args[0], args[1:]
                # Gate EVERY leaf: gating only one leaf leaves the subgraphs
                # that precede that leaf's layer loop-invariant, and XLA
                # hoists them (observed: critic stages measuring ~0 ms).
                gated = jax.tree.map(
                    lambda l: jnp.where(carry > -1.0, l, jnp.zeros_like(l)), first
                )
                out = fn(gated, *rest,
                         jax.random.fold_in(jax.random.PRNGKey(11), step))
                return carry + out.astype(jnp.float32), None

            total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return total

        return run

    short, long = make(reps), make(4 * reps)
    float(np.asarray(short(args)))
    float(np.asarray(long(args)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(short(args)))
    t1 = time.perf_counter()
    float(np.asarray(long(args)))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (3 * reps)


def main():
    opts = parse_args(sys.argv[1:])
    iteration, batch, reps = opts["iteration"], opts["batch"], opts["reps"]
    res = RESOLUTIONS[iteration]
    print(f"# progressive WGAN-GP step breakdown @ {res}^3, batch {batch}, "
          f"{reps} reps, backend={jax.default_backend()}")

    net, disc, g_params, d_params = prog.create_models(seed=0)
    g_tx = optax.rmsprop(1e-4)
    d_tx = optax.rmsprop(1e-4)
    g_opt = g_tx.init(g_params)
    d_opt = d_tx.init(d_params)
    grid = jnp.asarray(voxel_coordinates(res))
    real = jax.random.uniform(
        jax.random.PRNGKey(3), (batch, res, res, res), minval=-0.1, maxval=0.1
    )

    critic = lambda p, x: disc.apply(
        {"params": p}, x, iteration=iteration, fade_in_progress=1.0
    )

    rows = []

    def stage(name, fn, *args):
        t = timed_scan(fn, reps, *args)
        rows.append((name, t))
        print(f"{name:<34s} {t * 1e3:8.2f} ms")

    # --- generator volume evaluation (the fused MLP kernel) ---------------
    def g_fwd(g_params, key):
        z = jax.random.normal(key, (batch, 128))
        return jnp.sum(generate_volumes_inference(net, g_params, grid, z, res))

    stage("G volumes fwd (inference kernel)", g_fwd, g_params)

    def g_fwd_bwd(g_params, key):
        z = jax.random.normal(key, (batch, 128))

        def loss(p):
            return jnp.sum(generate_volumes(net, p, grid, z, res))

        grads = jax.grad(loss)(g_params)
        return jax.tree.leaves(grads)[0].ravel()[0]

    stage("G volumes fwd+bwd (trainable)", g_fwd_bwd, g_params)

    # --- critic ----------------------------------------------------------
    def d_fwd(d_params, real, key):
        del key
        return jnp.sum(critic(d_params, real))

    stage("critic fwd", d_fwd, d_params, real)

    def d_fwd_bwd(d_params, real, key):
        del key
        grads = jax.grad(lambda p: jnp.sum(critic(p, real)))(d_params)
        return jax.tree.leaves(grads)[0].ravel()[0]

    stage("critic fwd+bwd (params)", d_fwd_bwd, d_params, real)

    # --- step-level rows: EVOLVING-chain ablations ------------------------
    # Step times MUST be measured with the params evolving through the scan
    # carry. timed_scan's constant-params trick is fine for the stages above
    # (their work depends on a fresh per-step key) but lets XLA hoist/CSE
    # the critic subgraphs across iterations in full-step measurements —
    # the r3-early "GP double-grad <0.3 ms" figure was such an artifact
    # (evolving chain: ~3.5 ms). Ablation differences against the full
    # evolving D step give each stage's true marginal cost.
    fake_const = jax.random.uniform(
        jax.random.PRNGKey(5), (batch, res, res, res), minval=-0.1, maxval=0.1
    )

    from bench import _timed_state_scan

    def make_d_step(with_gp, with_fake_gen):
        def d_loss(d_params, rng):
            z_rng, gp_rng = jax.random.split(rng)
            if with_fake_gen:
                z = jax.random.normal(z_rng, (batch, 128))
                fake = jax.lax.stop_gradient(
                    generate_volumes_inference(net, g_params, grid, z, res)
                )
            else:
                fake = fake_const
            loss = jnp.mean(critic(d_params, fake)) - jnp.mean(critic(d_params, real))
            if with_gp:
                loss += gradient_penalty(
                    lambda x: critic(d_params, x), gp_rng, real, fake, 10.0
                )
            return loss

        def step(carry, i):
            d_params, opt = carry
            rng = jax.random.fold_in(jax.random.PRNGKey(11), i)
            grads = jax.grad(d_loss)(d_params, rng)
            upd, opt = d_tx.update(grads, opt, d_params)
            return optax.apply_updates(d_params, upd), opt

        return step

    def g_step(carry, i):
        def g_loss(g_params, rng):
            z = jax.random.normal(rng, (batch, 128))
            fake = generate_volumes(net, g_params, grid, z, res)
            return -jnp.mean(critic(d_params, fake))

        g_params_c, opt = carry
        grads = jax.grad(g_loss)(g_params_c, jax.random.fold_in(jax.random.PRNGKey(13), i))
        upd, opt = g_tx.update(grads, opt, g_params_c)
        return optax.apply_updates(g_params_c, upd), opt

    def chain_time(step, state):
        # One timing protocol repo-wide: bench._timed_state_scan (marginal
        # cost between a short and 4x-long scan, value-pulled).
        return _timed_state_scan(step, state, reps)

    d_state = (d_params, d_opt)
    t_full = chain_time(make_d_step(True, True), d_state)
    t_nogp = chain_time(make_d_step(False, True), d_state)
    t_nofake = chain_time(make_d_step(True, False), d_state)
    t_g = chain_time(g_step, (g_params, g_opt))

    def row(name, t):
        print(f"{name:<34s} {t * 1e3:8.2f} ms")

    row("full critic step (evolving)", t_full)
    row("  - fake generation (ablated)", t_full - t_nofake)
    row("  - GP double-grad (ablated)", t_full - t_nogp)
    row("  - base WGAN critic (residual)", t_nofake + t_nogp - t_full)
    row("full generator step (evolving)", t_g)
    per_batch = t_full + t_g / 5.0
    print(f"{'amortized per-batch (D + G/5)':<34s} {per_batch * 1e3:8.2f} ms "
          f"-> {1.0 / per_batch:.1f} steps/s")


def _dispatch():
    opts = parse_args(sys.argv[1:])
    if opts["raymarch"]:
        raymarch_decay(resolution=opts["resolution"])
    elif opts["stages"]:
        raymarch_stage_budget()
    elif opts["coherence"]:
        raymarch_block_coherence()
    elif opts["autodecoder"]:
        autodecoder_breakdown(reps=opts["reps"])
    elif opts["stash"]:
        stash_breakdown(batch=opts["batch"], reps=opts["reps"])
    elif opts["point_gan"]:
        point_gan_breakdown(reps=opts["reps"])
    else:
        main()


def point_gan_breakdown(n_points=4096, batch=32, reps=20):
    """Where the point-GAN WGAN-GP step goes (bench.py config 5b workload).
    Evolving-chain ablations via bench._timed_state_scan: full D step /
    no-GP / no-fake-generation / G step. Decides whether the SDFGenerator
    (its own 8-layer MLP with additive latent injection) or the PointNet
    critic deserves kernel work."""
    import optax

    from bench import _timed_state_scan
    from shapegan_tpu.train import point_gan

    print(f"# point-GAN WGAN-GP step breakdown @ {n_points} pts, batch {batch}, "
          f"{reps} reps, backend={jax.default_backend()}")
    generator, discriminator, g_params, d_params = point_gan.create_models(seed=0)
    g_tx = optax.rmsprop(1e-4)
    d_tx = optax.rmsprop(1e-4)
    u = jax.random.uniform(jax.random.PRNGKey(1), (batch, n_points, 4), minval=-1, maxval=1)
    u_pos, u_dist = u[..., :3], u[..., 3:]
    fake_const = jax.random.uniform(
        jax.random.PRNGKey(2), (batch, n_points, 1), minval=-0.1, maxval=0.1
    )

    def make_d_step(with_gp, with_fake_gen):
        def d_loss(d_params, rng):
            z_rng, gp_rng = jax.random.split(rng)
            if with_fake_gen:
                z = jax.random.normal(z_rng, (batch, point_gan.LATENT_SIZE))
                fake = jax.lax.stop_gradient(
                    generator.apply({"params": g_params}, u_pos, z)
                )
            else:
                fake = fake_const
            critic = lambda dist: discriminator.apply(
                {"params": d_params}, u_pos, dist)[..., 0]
            loss = jnp.mean(critic(fake)) - jnp.mean(critic(u_dist))
            if with_gp:
                alpha = jax.random.uniform(gp_rng, (batch, 1, 1))
                interp = alpha * u_dist + (1.0 - alpha) * fake
                grads = jax.grad(lambda d: jnp.sum(critic(d)))(interp)
                norms = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2)) + 1e-12)
                loss += point_gan.GRADIENT_PENALTY * jnp.mean((norms - 1.0) ** 2)
            return loss

        def step(carry, i):
            d_params, opt = carry
            grads = jax.grad(d_loss)(d_params, jax.random.fold_in(jax.random.PRNGKey(11), i))
            upd, opt = d_tx.update(grads, opt, d_params)
            return optax.apply_updates(d_params, upd), opt

        return step

    # Production G step runs the generator fp32 (point_gan.make_steps).
    generator_g = generator.clone(dtype=jnp.float32)

    def g_step(carry, i):
        def g_loss(gp, rng):
            z = jax.random.normal(rng, (batch, point_gan.LATENT_SIZE))
            fake = generator_g.apply({"params": gp}, u_pos, z)
            return -jnp.mean(discriminator.apply({"params": d_params}, u_pos, fake)[..., 0])

        gp_c, opt = carry
        grads = jax.grad(g_loss)(gp_c, jax.random.fold_in(jax.random.PRNGKey(13), i))
        upd, opt = g_tx.update(grads, opt, gp_c)
        return optax.apply_updates(gp_c, upd), opt

    d_state = (d_params, d_tx.init(d_params))
    t_full = _timed_state_scan(make_d_step(True, True), d_state, reps)
    t_nogp = _timed_state_scan(make_d_step(False, True), d_state, reps)
    t_nofake = _timed_state_scan(make_d_step(True, False), d_state, reps)
    t_g = _timed_state_scan(g_step, (g_params, g_tx.init(g_params)), reps)

    # fp32-activation full critic step (the pre-round-4 production numerics):
    # a separate fp32-dtype model pair over the SAME params — a precision
    # context alone would not undo the production models' bf16 casts.
    gen_f32, disc_f32, _, _ = point_gan.create_models(seed=0, dtype=jnp.float32)

    def d_step_f32(carry, i):
        def d_loss(d_params, rng):
            z_rng, gp_rng = jax.random.split(rng)
            z = jax.random.normal(z_rng, (batch, point_gan.LATENT_SIZE))
            fake = jax.lax.stop_gradient(gen_f32.apply({"params": g_params}, u_pos, z))
            critic = lambda dist: disc_f32.apply(
                {"params": d_params}, u_pos, dist)[..., 0]
            loss = jnp.mean(critic(fake)) - jnp.mean(critic(u_dist))
            alpha = jax.random.uniform(gp_rng, (batch, 1, 1))
            interp = alpha * u_dist + (1.0 - alpha) * fake
            grads = jax.grad(lambda d: jnp.sum(critic(d)))(interp)
            norms = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2)) + 1e-12)
            return loss + point_gan.GRADIENT_PENALTY * jnp.mean((norms - 1.0) ** 2)

        d_params, opt = carry
        grads = jax.grad(d_loss)(d_params, jax.random.fold_in(jax.random.PRNGKey(11), i))
        upd, opt = d_tx.update(grads, opt, d_params)
        return optax.apply_updates(d_params, upd), opt

    t_full_f32 = _timed_state_scan(d_step_f32, d_state, reps)

    def row(name, t):
        print(f"{name:<34s} {t * 1e3:8.2f} ms")

    row("full critic step (evolving)", t_full)
    row("full critic step, fp32 activations", t_full_f32)
    row("  - fake generation (ablated)", t_full - t_nofake)
    row("  - GP double-grad (ablated)", t_full - t_nogp)
    row("  - base WGAN critic (residual)", t_nofake + t_nogp - t_full)
    row("full generator step (evolving)", t_g)
    per_batch = t_full + t_g / 5.0
    print(f"{'amortized per-batch (D + G/5)':<34s} {per_batch * 1e3:8.2f} ms "
          f"-> {1.0 / per_batch:.1f} steps/s")


def stash_breakdown(res=64, batch=16, reps=10):
    """Activation-stash backward vs in-kernel recompute at the flagship
    16x64^3 fused-grid workload (BASELINE.md names the HBM activation stash
    as the only remaining algorithmic lever — the recompute backward runs at
    ~98% of its in-kernel-recompute roofline).

    Stash sets are 0-indexed h-chain positions (ops/sdf_mlp_pallas.py):
    (2,4,6) = h3/h5/h7 kills 3 of the 6 recompute matmuls for 3x2.15 GB of
    bf16 HBM at this workload; (1,2,4,6) kills 4 for 8.6 GB; (1..6) kills
    all 6 for 12.9 GB (too large to coexist with the critic in the real
    step — measured here to bound the ceiling). SGD-eps chains keep the
    scan serial so nothing hoists."""
    from bench import _timed_state_scan
    from shapegan_tpu.ops import sdf_mlp
    from shapegan_tpu.ops.coords import voxel_coordinates
    from shapegan_tpu.ops.sdf_mlp_pallas import (
        _stash_fwd_call,
        apply_grid_fused,
        apply_grid_trainable,
        apply_grid_trainable_stash,
    )

    print(f"# activation-stash backward @ {batch}x{res}^3 "
          f"({batch * res**3 / 1e6:.2f}M points), {reps} reps, "
          f"backend={jax.default_backend()}")
    grid = jnp.asarray(voxel_coordinates(res))
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    z0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 128))

    def row(name, t):
        print(f"{name:<44s} {t * 1e3:8.2f} ms")
        return t

    # --- forward only: what do the stash writes cost? ---------------------
    def fwd_chain(fn):
        def step(carry, i):
            p, z = carry
            out = fn(p, grid, z)
            return p, z + jnp.sum(out) * 1e-12  # consume -> serial chain
        return step

    t_fwd = row("fwd (plain fused kernel)",
                _timed_state_scan(fwd_chain(apply_grid_fused), (params, z0), reps))
    for stash in ((2, 4, 6), (1, 2, 3, 4, 5, 6)):
        t = row(f"fwd + stash writes {stash}",
                _timed_state_scan(
                    fwd_chain(lambda p, g, z, s=stash: _stash_fwd_call(p, g, z, 512, s)[0]),
                    (params, z0), reps))
        row(f"  stash-write delta {stash}", t - t_fwd)

    # --- fwd+bwd: recompute kernel vs stash variants -----------------------
    def grad_chain(fn):
        def step(carry, i):
            p, z = carry
            gp, gz = jax.grad(lambda p, z: jnp.sum(fn(p, grid, z)),
                              argnums=(0, 1))(p, z)
            p = jax.tree.map(lambda a, g: a - 1e-9 * g, p, gp)
            return p, z - 1e-9 * gz
        return step

    t_rec = row("fwd+bwd (in-kernel recompute, production)",
                _timed_state_scan(grad_chain(apply_grid_trainable), (params, z0), reps))
    for stash in ((2, 4, 6), (1, 2, 4, 6), (1, 2, 3, 4, 5, 6)):
        fn = lambda p, g, z, s=stash: apply_grid_trainable_stash(p, g, z, 512, s)
        t = row(f"fwd+bwd stash {stash}",
                _timed_state_scan(grad_chain(fn), (params, z0), reps))
        row(f"  vs recompute {stash}", t - t_rec)


def autodecoder_breakdown(model_count=8, pc_size=25000, batch=20000, reps=25):
    """Where the DeepSDF autodecoder step goes (bench.py config 3 workload:
    batch 20k points, both Adams, latent L2 reg). Evolving-chain ablations —
    params/codes ride the scan carry so XLA cannot hoist or CSE any stage
    across iterations (same pitfall as the progressive-step decomposition).

    Rows: full step (ours) / no-optimizer (tiny-SGD chain keeps seriality) /
    fwd-only / remat fwd+bwd (isolates stored-activation HBM traffic) /
    reference fp32 full step. Decides whether a fused custom-VJP points
    kernel (in-kernel recompute, per-point latents) is worth building."""
    import optax

    from bench import _timed_state_scan
    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.ops import sdf_mlp
    from shapegan_tpu.train import sdf_autodecoder as ad

    print(f"# autodecoder step breakdown @ batch {batch}, {model_count} shapes x "
          f"{pc_size} pts, {reps} reps, backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.uniform(-1, 1, (model_count * pc_size, 3)).astype(np.float32))
    sdf = jnp.asarray(np.clip(rng.normal(0, 0.05, model_count * pc_size), -0.1, 0.1)
                      .astype(np.float32))
    net = SDFNet()
    net_tx, code_tx = optax.adam(1e-5), optax.adam(1e-5)
    params = net.init(jax.random.PRNGKey(0))
    codes = jax.random.normal(jax.random.PRNGKey(1), (model_count, 128)) * 1e-4
    batches = jnp.asarray(rng.integers(0, model_count * pc_size, (reps, batch)), jnp.int32)

    def batch_of(i):
        return batches[i % reps]

    def make_loss(indices, dtype):
        shape_indices = indices // pc_size
        bp, bs = points[indices], sdf[indices]

        def loss_fn(p, c):
            bc = c[shape_indices]
            out = net.apply(p, bp, bc, dtype=dtype)
            return jnp.mean(jnp.abs(out - bs)) + ad.SIGMA * jnp.mean(bc**2)

        return loss_fn

    rows = []

    def row(name, t):
        rows.append((name, t))
        print(f"{name:<38s} {t * 1e6:9.1f} us -> {1.0 / t:8.1f} steps/s")

    # Full production step (gather + bf16 MLP + both Adams).
    step_fn, _ = ad.make_train_step(net, net_tx, code_tx, pc_size)

    def full_step(carry, i):
        p, c, no, co = carry
        p, c, no, co, _ = step_fn(p, c, no, co, points, sdf, batch_of(i))
        return p, c, no, co

    state4 = (params, codes, net_tx.init(params), code_tx.init(codes))
    row("full step (ours, bf16)", _timed_state_scan(full_step, state4, reps))

    # No optimizer: grads applied as a tiny SGD so the chain stays serial
    # but Adam's moment read/write traffic is ablated.
    def grad_step(carry, i):
        p, c = carry
        ng, cg = jax.grad(make_loss(batch_of(i), ad.COMPUTE_DTYPE), argnums=(0, 1))(p, c)
        p = jax.tree.map(lambda a, g: a - 1e-9 * g, p, ng)
        c = c - 1e-9 * cg
        return p, c

    row("fwd+bwd only (SGD-eps chain)", _timed_state_scan(grad_step, (params, codes), reps))

    # Remat: recompute activations in the backward instead of storing them —
    # approximates what the fused custom-VJP kernel buys on HBM traffic.
    def remat_grad_step(carry, i):
        p, c = carry
        loss_fn = make_loss(batch_of(i), ad.COMPUTE_DTYPE)
        ng, cg = jax.grad(jax.checkpoint(loss_fn), argnums=(0, 1))(p, c)
        p = jax.tree.map(lambda a, g: a - 1e-9 * g, p, ng)
        c = c - 1e-9 * cg
        return p, c

    row("fwd+bwd remat (SGD-eps chain)",
        _timed_state_scan(remat_grad_step, (params, codes), reps))

    # Forward only.
    def fwd_step(carry, i):
        p, c = carry
        loss = make_loss(batch_of(i), ad.COMPUTE_DTYPE)(p, c)
        return p, c + loss * 1e-12

    row("fwd only (loss chain)", _timed_state_scan(fwd_step, (params, codes), reps))

    # Fused rowwise custom-VJP kernel (ops/sdf_mlp_pallas.apply_rowwise) in
    # the full step — the candidate replacement for the XLA apply; compiled
    # kernels only (interpret mode would swamp the timing off-TPU).
    if jax.default_backend() == "tpu":
        from shapegan_tpu.ops.sdf_mlp_pallas import apply_rowwise

        def make_fused_loss(indices):
            shape_indices = indices // pc_size
            bp, bs = points[indices], sdf[indices]

            def loss_fn(p, c):
                bc = c[shape_indices]
                out = apply_rowwise(p, bp, bc, dtype=ad.COMPUTE_DTYPE)
                return jnp.mean(jnp.abs(out - bs)) + ad.SIGMA * jnp.mean(bc**2)

            return loss_fn

        def fused_step(carry, i):
            p, c, no, co = carry
            ng, cg = jax.grad(make_fused_loss(batch_of(i)), argnums=(0, 1))(p, c)
            upd, no = net_tx.update(ng, no, p)
            p = optax.apply_updates(p, upd)
            cupd, co = code_tx.update(cg, co, c)
            c = optax.apply_updates(c, cupd)
            return p, c, no, co

        row("full step (ours, fused rowwise)",
            _timed_state_scan(fused_step, state4, reps))

    # Reference formulation: fp32 concat MLP, same gather + optimizers.
    def ref_step(carry, i):
        p, c, no, co = carry
        ng, cg = jax.grad(make_loss(batch_of(i), jnp.float32), argnums=(0, 1))(p, c)
        upd, no = net_tx.update(ng, no, p)
        p = optax.apply_updates(p, upd)
        cupd, co = code_tx.update(cg, co, c)
        c = optax.apply_updates(c, cupd)
        return p, c, no, co

    row("full step (reference fp32)", _timed_state_scan(ref_step, state4, reps))

    t = dict(rows)
    full = t["full step (ours, bf16)"]
    fb = t["fwd+bwd only (SGD-eps chain)"]
    print(f"{'  - optimizer traffic (ablated)':<38s} {(full - fb) * 1e6:9.1f} us")
    print(f"{'  - bwd cost (fwd+bwd - fwd)':<38s} "
          f"{(fb - t['fwd only (loss chain)']) * 1e6:9.1f} us")
    print(f"{'  - remat delta (store - recompute)':<38s} "
          f"{(fb - t['fwd+bwd remat (SGD-eps chain)']) * 1e6:9.1f} us")


def raymarch_decay(resolution=400, iterations=500):
    """Primary-trace live-lane decay on the overfit chair: active-lane count
    after every iteration, full width (no compaction). The fractions drive
    `_default_schedule`'s bucket sizes in render/raymarching.py — a bucket
    must hold every surviving ACTIVE lane or stragglers degrade to hits."""
    import bench
    from shapegan_tpu.ops import sdf_mlp
    from shapegan_tpu.render.raymarching import CAMERA_POSITION, camera_rays

    net, params, code = bench._overfit_chair()
    params = sdf_mlp.fold_latent(params, jnp.asarray(code))
    latent = jnp.zeros(0, jnp.float32)

    cam = np.asarray(CAMERA_POSITION, np.float32)
    pts, dirs, entered = camera_rays(cam, resolution, xp=np)

    from shapegan_tpu.ops.sdf_mlp_pallas import apply_grid_best

    @jax.jit
    def run(points, directions, status0):
        def body(carry, _):
            points, status = carry
            active = status == 0
            sdf = jnp.clip(apply_grid_best(params, points, latent[None, :])[0], -0.02, 0.02)
            points = points + directions * jnp.where(active, sdf, 0.0)[:, None]
            hits = active & (sdf > 0) & (sdf < 0.0005)
            misses = active & (jnp.linalg.norm(points, axis=1) > 1.0)
            status = jnp.where(hits, 1, jnp.where(misses, 2, status))
            return (points, status), jnp.sum(status == 0)

        (_, status), counts = jax.lax.scan(body, (points, status0), None, length=iterations)
        return counts

    status0 = jnp.where(jnp.asarray(entered), 0, 2).astype(jnp.int32)
    counts = np.asarray(run(jnp.asarray(pts), jnp.asarray(dirs), status0))
    n = resolution * resolution
    print(f"# primary-trace active-lane decay, {resolution}^2 rays (n={n})")
    print(f"iter 0: {float(np.sum(entered))/n:.3f} entered")
    for it in (10, 20, 30, 40, 60, 80, 100, 150, 200, 300, 400, 500):
        if it <= iterations:
            print(f"iter {it:4d}: {counts[it-1]/n:.4f} active")
    tail = int(np.argmax(counts == 0)) if (counts == 0).any() else iterations
    print(f"all-resolved at iter {tail}")


def raymarch_block_coherence(size=1600, chunks=11):
    """Block-level coherence of the live lane set during the primary trace.

    Decides whether compaction should gather contiguous lane *blocks*
    (n/B gather descriptors instead of n — TPU random row transfers cost
    ~15-25 ns per descriptor regardless of row width) at the price of a
    block staying live while ANY of its lanes is. Measured on the overfit
    chair (round 4): the early trace is block-coherent (B=32 within 5% of
    the lane fraction at iter 0) but the post-iter-100 plateau — grazing-ray
    oscillators, where the tail burns its masked iterations — is scattered
    (lane 0.139 vs 0.286 at B=32, 0.366 at B=128), so block compaction
    LOSES ~30n evals/frame against the ~16n-equivalent it saves in
    compaction cost. Kept as the measurement behind that rejection
    (BASELINE.md round-4 finding 3)."""
    import bench
    from shapegan_tpu.ops import sdf_mlp
    from shapegan_tpu.render import raymarching as rm

    net, params0, code = bench._overfit_chair()
    latent0 = jnp.asarray(np.zeros(0, np.float32))
    params = sdf_mlp.fold_latent(params0, latent0)
    latent = latent0[:0]
    cam = jnp.asarray(rm.CAMERA_POSITION, jnp.float32)
    points, dirs, entered = rm.camera_rays(cam, size, xp=jnp)
    status = jnp.where(entered, rm._ACTIVE, rm._MISS)
    n = size * size
    blocks = [b for b in (32, 128, 256, 1024, 4096) if n % b == 0]

    @jax.jit
    def chunk20(points, status):
        return rm._trace_staged("primary", params, latent, points, dirs,
                                status, 20, 0.0005, 0.02, 0.0, 1.0, ())

    print(f"# primary-trace live-lane block coherence, {size}^2 rays")
    print(f"{'iter':>5s} {'lane':>7s} " + " ".join(f"B{b:>5d}" for b in blocks))
    for step in range(chunks):
        active = np.asarray(status) == rm._ACTIVE
        cols = " ".join(
            f"{active.reshape(-1, b).any(axis=1).mean():6.4f}" for b in blocks)
        print(f"{step * 20:5d} {active.mean():7.4f} " + cols)
        points, status = chunk20(points, status)


def raymarch_stage_budget(size=1600, iterations=1000):
    """Per-stage budget of the reference-settings frame (800², ssaa 2):
    cumulative jitted sub-pipelines of render/raymarching._render_pixels
    (rays+entry → +primary trace → +normals → +shadow trace → full frame);
    consecutive differences are the stage costs. Each prefix is one device
    dispatch, so the link's ~30 ms floor cancels in the differences."""
    import bench
    from shapegan_tpu.ops import sdf_mlp
    from shapegan_tpu.render import raymarching as rm

    net, params0, code = bench._overfit_chair()
    latent0 = jnp.asarray(np.zeros(0, np.float32))
    n = size * size
    f32 = jnp.float32

    def frame_prefix(params, stage):
        """Stages 0..3 of _render_pixels (same math, truncated)."""
        params = sdf_mlp.fold_latent(params, latent0)
        latent = latent0[:0]
        cam = jnp.asarray(rm.CAMERA_POSITION, f32)
        points, dirs, entered = rm.camera_rays(cam, size, xp=jnp)
        if stage == 0:
            return jnp.sum(points)
        status = jnp.where(entered, rm._ACTIVE, rm._MISS)
        sched = rm._default_schedule("primary", n, iterations)
        points, status = rm._trace_staged(
            "primary", params, latent, points, dirs, status, iterations,
            0.0005, 0.02, 0.0, 1.0, sched, tail_cap=rm.TAIL_ITERS if sched else None)
        if stage == 1:
            return jnp.sum(points) + jnp.sum(status)
        normal = rm._points_gradient(params, points, latent)
        normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=1, keepdims=True), 1e-12)
        if stage == 2:
            return jnp.sum(points) + jnp.sum(status) + jnp.sum(normal)
        model_mask = (status == rm._HIT) | (status == rm._ACTIVE)
        any_hit = jnp.any(model_mask)
        ground_plane = jnp.min(jnp.where(model_mask, points[:, 1], jnp.inf))
        ground = (dirs[:, 1] < 0) & ~model_mask & any_hit
        t = (points[:, 1] - ground_plane) / jnp.where(dirs[:, 1] < 0, dirs[:, 1], -1.0)
        g_pts = points - dirs * t[:, None]
        ground &= jnp.sqrt(g_pts[:, 0] ** 2 + g_pts[:, 2] ** 2) < 3
        shadow_mask = model_mask | ground
        shadow_points = jnp.where(model_mask[:, None], points,
                                  jnp.where(ground[:, None], g_pts, 3.0))
        light = jnp.asarray(rm.LIGHT_POSITION, f32)
        shadow = rm._shadow_factor(params, latent, shadow_points, shadow_mask,
                                   light, 0.001, 0.0, 1.0)
        return jnp.sum(points) + jnp.sum(status) + jnp.sum(normal) + jnp.sum(shadow)

    prefixes = [jax.jit(lambda p, s=s: frame_prefix(p, s)) for s in range(4)]

    def timeit(fn, *args, reps=3):
        # Warm-up must be pulled as a VALUE: on this link block_until_ready
        # returns before the computation finishes (bench.py methodology
        # note), so a block_until_ready warm-up bleeds into the timed window.
        float(np.asarray(fn(*args)).sum())
        vals, t0 = [], time.perf_counter()
        for _ in range(reps):
            vals.append(fn(*args))
        _ = [float(np.asarray(v).sum()) for v in vals]  # value fetch forces completion
        return (time.perf_counter() - t0) / reps

    times = [timeit(fn, params0) for fn in prefixes]

    def full(params):
        cam = np.asarray(rm.CAMERA_POSITION, np.float32)
        fwd = -cam / np.linalg.norm(cam)
        right = np.cross(fwd, [0.0, 1.0, 0.0]); right /= np.linalg.norm(right)
        up = np.cross(fwd, right); up /= np.linalg.norm(up)
        return rm._render_pixels(
            params, latent0, jnp.asarray(cam), jnp.asarray(right), jnp.asarray(up),
            jnp.asarray(fwd), jnp.asarray(rm.LIGHT_POSITION, np.float32),
            size=size, iterations=iterations, threshold=0.0005, sdf_offset=0.0,
            radius=1.0, vertical_cutoff=None, color=(0.8, 0.1, 0.1), ssaa=2)

    t_full = timeit(full, params0)

    print(f"# raymarch stage budget, {size}^2 SSAA rays, {iterations} iter budget")
    labels = ["rays + sphere entry", "primary trace", "surface normals",
              "shadow trace (model+ground merged)"]
    prev = 0.0
    for label, t in zip(labels, times):
        print(f"{label:<38s} {(t - prev) * 1e3:9.1f} ms  (cum {t:.3f} s)")
        prev = t
    print(f"{'shading + SSAA downsample + u8 (rest)':<38s} {(t_full - prev) * 1e3:9.1f} ms")
    print(f"{'FULL FRAME':<38s} {t_full * 1e3:9.1f} ms  -> {1.0 / t_full:.3f} shapes/s")


if __name__ == "__main__":
    _dispatch()
