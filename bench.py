#!/usr/bin/env python3
"""Framework benchmark (run by the driver on real TPU hardware).

Measures the north-star metric from BASELINE.json — SDF-MLP points/sec/chip —
at the flagship workload (progressive hybrid GAN iteration 3: batch 16 x 64^3
= 4.19M implicit-MLP evaluations per generator forward,
/root/reference/train_hybrid_progressive_gan.py:37,41,95-96).

  value       : points/sec of the fused Pallas grid kernel
                (shapegan_tpu/ops/sdf_mlp_pallas.py)
  vs_baseline : speedup over the reference *algorithm* on the same chip —
                the materialized latent-repeat + concat MLP exactly as the
                reference computes it (train_hybrid_gan.py:63-66), jitted by
                XLA in fp32. (The reference repo publishes no numbers of its
                own — BASELINE.md — so its algorithm on identical hardware is
                the honest baseline.)

Timing methodology: K kernel invocations with distinct latents inside one
jitted lax.scan reduced to a scalar — device-side throughput, free of host
dispatch/tunnel latency.

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

from shapegan_tpu.ops import sdf_mlp
from shapegan_tpu.ops.coords import voxel_coordinates

BATCH = 16
RESOLUTION = 64
SCAN_ITERS = 10


def make_scan_runner(inner, grid):
    @jax.jit
    def run(lats):
        def body(carry, lat):
            return carry + jnp.sum(inner(grid, lat)), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), lats)
        return total

    return run


def time_runner(run, lats):
    float(run(lats))  # compile + execute once; scalar pull forces completion
    t0 = time.perf_counter()
    float(run(lats))
    return (time.perf_counter() - t0) / SCAN_ITERS


def main():
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

    t_fused = time_runner(make_scan_runner(fused, grid), lats)
    t_reference = time_runner(make_scan_runner(reference_algorithm, grid), lats)

    print(
        json.dumps(
            {
                "metric": "sdf_mlp_points_per_sec_per_chip",
                "value": round(n_points / t_fused, 1),
                "unit": "points/s",
                "vs_baseline": round(t_reference / t_fused, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
