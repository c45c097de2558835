#!/usr/bin/env python3
"""Per-stage timing breakdown of the progressive WGAN-GP training step.

Answers "where does the step time go" for the flagship trainer at a given
growth iteration (default 2 → 32^3, batch 16, the BENCH config): generator
volume evaluation (fwd and fwd+bwd), critic forward, critic fwd+bwd, the
gradient-penalty double grad, the full critic/generator steps, and the
optimizer update. Each stage is timed device-side as K invocations inside a
jitted lax.scan (tunnel-latency-free; same methodology as bench.py).

Usage: python bench_profile.py [iteration=N] [batch=N] [reps=N]

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
    opts = {"iteration": 2, "batch": 16, "reps": 20}
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
    (which otherwise drowns sub-ms stages at small rep counts). The first
    argument's first leaf is gated through a data-dependent ``where`` on the
    carry so every iteration's input is opaque to XLA — neither
    loop-invariant hoisting nor linearity-based distribution (conv(a + eps)
    = conv(a) + conv(eps)) can remove the measured work. Results are pulled
    as VALUES: on this link jax.block_until_ready returns early."""

    def make(n):
        @jax.jit
        def run(args):
            def body(carry, step):
                first, rest = args[0], args[1:]
                leaves, treedef = jax.tree.flatten(first)
                leaves[0] = jnp.where(
                    carry > -1.0, leaves[0], jnp.zeros_like(leaves[0])
                )
                out = fn(jax.tree.unflatten(treedef, leaves), *rest,
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

    # --- gradient penalty double grad ------------------------------------
    fake_fixed = jax.block_until_ready(
        generate_volumes_inference(
            net, g_params, grid, jax.random.normal(jax.random.PRNGKey(5), (batch, 128)), res
        )
    )

    def gp_only(d_params, real, fake, key):
        grads = jax.grad(
            lambda p: gradient_penalty(lambda x: critic(p, x), key, real, fake, 10.0)
        )(d_params)
        return jax.tree.leaves(grads)[0].ravel()[0]

    stage("GP double-grad (d/d d_params)", gp_only, d_params, real, fake_fixed)

    # --- full steps (same losses as bench.py) -----------------------------
    def d_loss(d_params, g_params, real, rng):
        z_rng, gp_rng = jax.random.split(rng)
        z = jax.random.normal(z_rng, (batch, 128))
        fake = jax.lax.stop_gradient(generate_volumes_inference(net, g_params, grid, z, res))
        gp = gradient_penalty(lambda x: critic(d_params, x), gp_rng, real, fake, 10.0)
        return jnp.mean(critic(d_params, fake)) - jnp.mean(critic(d_params, real)) + gp

    def d_step(d_params, d_opt, g_params, real, key):
        grads = jax.grad(d_loss)(d_params, g_params, real, key)
        upd, new_opt = d_tx.update(grads, d_opt, d_params)
        new_params = optax.apply_updates(d_params, upd)
        return jax.tree.leaves(new_params)[0].ravel()[0]

    stage("full critic step (incl. G fake)", d_step, d_params, d_opt, g_params, real)

    def g_loss(g_params, d_params, rng):
        z = jax.random.normal(rng, (batch, 128))
        fake = generate_volumes(net, g_params, grid, z, res)
        return -jnp.mean(critic(d_params, fake))

    def g_step(g_params, g_opt, d_params, key):
        grads = jax.grad(g_loss)(g_params, d_params, key)
        upd, new_opt = g_tx.update(grads, g_opt, g_params)
        new_params = optax.apply_updates(g_params, upd)
        return jax.tree.leaves(new_params)[0].ravel()[0]

    stage("full generator step", g_step, g_params, g_opt, d_params)

    # --- optimizer alone --------------------------------------------------
    zero_grads = jax.tree.map(jnp.zeros_like, d_params)

    def opt_only(d_params, d_opt, key):
        del key
        upd, _ = d_tx.update(zero_grads, d_opt, d_params)
        return jax.tree.leaves(optax.apply_updates(d_params, upd))[0].ravel()[0]

    stage("critic optimizer update alone", opt_only, d_params, d_opt)

    # Effective per-batch time: D step every batch + G step every 5th
    # (reference :135).
    t = dict(rows)
    per_batch = t["full critic step (incl. G fake)"] + t["full generator step"] / 5.0
    print(f"{'amortized per-batch (D + G/5)':<34s} {per_batch * 1e3:8.2f} ms "
          f"-> {1.0 / per_batch:.1f} steps/s")


if __name__ == "__main__":
    main()
