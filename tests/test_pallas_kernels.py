"""Fused Pallas kernels under interpret mode (runs on the CPU test platform;
the same kernels are exercised compiled on TPU by bench.py and the trainers)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from shapegan_tpu.ops import sdf_mlp
from shapegan_tpu.ops.coords import voxel_coordinates
from shapegan_tpu.ops.sdf_mlp_pallas import apply_grid_fused, apply_grid_trainable


def test_fused_forward_matches_xla_interpreted():
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    grid = jnp.asarray(voxel_coordinates(8))  # 512 points = 1 tile
    lats = jax.random.normal(jax.random.PRNGKey(1), (2, 128))
    expected = np.asarray(sdf_mlp.apply_grid(params, grid, lats, dtype=jnp.bfloat16))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(apply_grid_fused(params, grid, lats))
    np.testing.assert_allclose(out, expected, atol=2e-2)


def test_fused_vjp_matches_xla_interpreted():
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    grid = jnp.asarray(voxel_coordinates(8))
    lats = jax.random.normal(jax.random.PRNGKey(1), (2, 128))
    cot = jax.random.normal(jax.random.PRNGKey(2), (2, grid.shape[0]))

    def loss(f):
        return lambda p, g, l: jnp.sum(f(p, g, l) * cot)

    # The invariant: the fused bf16 kernel's gradient error vs fp32 ground
    # truth must be comparable to the bf16 XLA path's own error vs fp32
    # (both carry independent bf16 rounding; comparing bf16 to bf16 directly
    # just measures 2x that noise).
    truth = jax.grad(
        loss(lambda p, g, l: sdf_mlp.apply_grid(p, g, l, dtype=jnp.float32)),
        argnums=(0, 1, 2),
    )(params, grid, lats)
    bf16 = jax.grad(
        loss(lambda p, g, l: sdf_mlp.apply_grid(p, g, l, dtype=jnp.bfloat16)),
        argnums=(0, 1, 2),
    )(params, grid, lats)
    with pltpu.force_tpu_interpret_mode():
        fused = jax.grad(loss(apply_grid_trainable), argnums=(0, 1, 2))(params, grid, lats)

    for t, b, f in zip(jax.tree.leaves(truth), jax.tree.leaves(bf16), jax.tree.leaves(fused)):
        t, b, f = np.asarray(t), np.asarray(b), np.asarray(f)
        scale = max(np.abs(t).max(), 1e-6)
        err_bf16 = np.abs(b - t).max() / scale
        err_fused = np.abs(f - t).max() / scale
        assert err_fused < 2.0 * err_bf16 + 0.02, (err_fused, err_bf16)
