"""Grid/point-space coordinate conventions.

This module is the single source of truth for how a flat point list maps onto
a voxel volume. The reference defines this in ``util.get_voxel_coordinates``
(/root/reference/util.py:60-74): an ``np.meshgrid`` over [-1, 1]^3 followed by
``swapaxes(1, 2)`` — which is exactly 'ij'-indexed (x-major) ordering. We
implement it directly in 'ij' form; every consumer (dense grid evaluation,
voxel reshape before the discriminator, text slices, mesh extraction) relies
on ``points.reshape(res, res, res)`` being indexed ``[x][y][z]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _voxel_coordinates_np(resolution: int, size: float, center: tuple) -> np.ndarray:
    axes = [
        np.linspace(center[i] - size, center[i] + size, resolution, dtype=np.float64)
        for i in range(3)
    ]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)  # [res,res,res,3]
    return np.ascontiguousarray(grid.reshape(-1, 3).astype(np.float32))


def voxel_coordinates(resolution: int = 32, size: float = 1.0, center=0.0) -> np.ndarray:
    """Flat [res^3, 3] grid coordinates in x-major ('ij') order.

    Semantics match /root/reference/util.py:60-74 (meshgrid + axis swap ==
    'ij' indexing). Returned as numpy; wrap in jnp.asarray at the jit
    boundary. Cached per (resolution, size, center).
    """
    if isinstance(center, (int, float)):
        center = (float(center),) * 3
    return _voxel_coordinates_np(int(resolution), float(size), tuple(center))


def voxel_coordinate_grid(resolution: int = 32, size: float = 1.0, center=0.0) -> np.ndarray:
    """[res, res, res, 3] coordinate grid (same ordering, unflattened)."""
    return voxel_coordinates(resolution, size, center).reshape(resolution, resolution, resolution, 3)


@functools.lru_cache(maxsize=None)
def unit_sphere_mask(resolution: int, radius: float = 1.1) -> np.ndarray:
    """Boolean [res,res,res] mask of grid points with ||p|| < radius.

    The reference evaluates the implicit network only inside a radius-1.1
    sphere when voxelizing (/root/reference/model/sdf_net.py:7-19). On TPU we
    prefer evaluating the full dense grid (static shapes, no gather) and
    masking afterwards; this mask reproduces the same voxel output: cells
    outside the sphere are assigned SDF +1.
    """
    pts = voxel_coordinates(resolution)
    return (np.linalg.norm(pts, axis=1) < radius).reshape(resolution, resolution, resolution)


def sample_unit_sphere(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Sample ~uniform points in the unit ball, jit-friendly (static shape).

    Instead of rejection sampling (data-dependent shape), draw a direction
    from an isotropic normal and a radius from the correct cubic CDF — exactly
    uniform in the ball and fully vectorized.
    """
    k1, k2 = jax.random.split(key)
    direction = jax.random.normal(k1, (n, 3), dtype=dtype)
    direction = direction / (jnp.linalg.norm(direction, axis=1, keepdims=True) + 1e-12)
    radius = jax.random.uniform(k2, (n, 1), dtype=dtype) ** (1.0 / 3.0)
    return direction * radius
