"""Quantitative evaluation: point-cloud sampling + shape metrics.

Parity with /root/reference/metrics.py: sample surface point clouds from a
trained generator (``sample_point_clouds``) and from dataset voxels
(``sample_from_voxels``), rescaled to the half-unit sphere/cube convention
(:12-16), written as .npy for downstream metric computation.

Beyond parity: the reference computes its Chamfer/FPD numbers *outside* the
repo (SURVEY.md §4); here :func:`chamfer_distance`, :func:`coverage` and
:func:`minimum_matching_distance` are provided in-framework as jitted
pairwise computations.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def rescale_point_cloud(points: np.ndarray, method: str = "sphere") -> np.ndarray:
    """Normalize a cloud to the half-unit sphere ('sphere') or half-unit cube
    ('cube') — the reference's comparison convention (metrics.py:12-16)."""
    points = points - points.mean(axis=0, keepdims=True)
    if method == "sphere":
        scale = np.linalg.norm(points, axis=1).max() * 2.0
    elif method == "cube":
        scale = np.abs(points).max() * 2.0
    else:
        raise ValueError(method)
    return (points / max(scale, 1e-12)).astype(np.float32)


def sample_point_clouds(net, params, latent_codes, point_count: int = 2048,
                        voxel_resolution: int = 32, rescale: str = "sphere",
                        seed: int = 0) -> np.ndarray:
    """[N, point_count, 3] surface samples from generator latent codes
    (reference sample_point_clouds, metrics.py:18-29)."""
    clouds = np.zeros((len(latent_codes), point_count, 3), dtype=np.float32)
    for i, code in enumerate(latent_codes):
        mesh = net.get_mesh(params, code, voxel_resolution=voxel_resolution)
        if mesh is None:
            continue
        clouds[i] = rescale_point_cloud(mesh.sample(point_count, seed=seed + i), rescale)
    return clouds


def sample_from_voxels(voxels: np.ndarray, point_count: int = 2048, rescale: str = "sphere",
                       seed: int = 0) -> np.ndarray:
    """Surface samples from dataset voxel volumes via in-framework mesh
    extraction (reference sample_from_voxels, metrics.py:31-45)."""
    from shapegan_tpu.data.mesh_io import TriangleMesh
    from shapegan_tpu.ops.mesh_extract import extract_mesh

    clouds = np.zeros((len(voxels), point_count, 3), dtype=np.float32)
    for i, volume in enumerate(voxels):
        res = volume.shape[0]
        padded = np.pad(volume, 1, mode="constant", constant_values=1.0)
        vertices, faces = extract_mesh(padded, spacing=2.0 / res)
        if vertices.shape[0] == 0:
            continue
        mesh = TriangleMesh(vertices, faces)
        clouds[i] = rescale_point_cloud(mesh.sample(point_count, seed=seed + i), rescale)
    return clouds


@jax.jit
def chamfer_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """Symmetric Chamfer distance between two point sets [Na, 3], [Nb, 3]."""
    d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return jnp.mean(jnp.min(d2, axis=1)) + jnp.mean(jnp.min(d2, axis=0))


def pairwise_chamfer(set_a: np.ndarray, set_b: np.ndarray) -> np.ndarray:
    """[len(a), len(b)] Chamfer matrix between two sets of clouds."""
    out = np.zeros((len(set_a), len(set_b)), dtype=np.float32)
    for i, a in enumerate(set_a):
        for j, b in enumerate(set_b):
            out[i, j] = float(chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    return out


def minimum_matching_distance(generated: np.ndarray, reference: np.ndarray) -> float:
    """MMD-CD: mean over reference clouds of the closest generated cloud."""
    d = pairwise_chamfer(generated, reference)
    return float(d.min(axis=0).mean())


def coverage(generated: np.ndarray, reference: np.ndarray) -> float:
    """COV-CD: fraction of reference clouds that are some generated cloud's
    nearest neighbor."""
    d = pairwise_chamfer(generated, reference)
    return float(len(np.unique(d.argmin(axis=1))) / len(reference))
