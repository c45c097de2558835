"""Iso-surface extraction from dense SDF volumes, on-TPU.

Replaces the reference's dependency on ``skimage.measure.marching_cubes``
(/root/reference/model/sdf_net.py:103, rendering/__init__.py:120,
metrics.py:39) with a fully vectorized **marching tetrahedra** implementation
that runs under jit: every cube cell is split into 6 tetrahedra sharing the
main diagonal, each tetrahedron emits 0-2 triangles through a 16-case lookup
table, and all work is static-shape (bounded triangle buffers + validity
masks; the data-dependent compaction happens host-side on the results).

Marching tetrahedra produces a correct, watertight triangulation of the same
zero level set as marching cubes (it has no ambiguous cases at all), at the
cost of ~2x the triangle count. Triangle orientation is enforced at runtime:
each triangle is flipped so its normal points away from the centroid of its
tetrahedron's inside (SDF < level) corners.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Cube corner offsets, index = bit order (x, y, z).
_CUBE_CORNERS = np.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [0, 1, 0],
        [1, 1, 0],
        [0, 0, 1],
        [1, 0, 1],
        [0, 1, 1],
        [1, 1, 1],
    ],
    dtype=np.int32,
)

# 6-tetrahedra decomposition of the cube around the 0-7 main diagonal.
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    dtype=np.int32,
)

# Tet edges: edge e connects corners _EDGE_ENDS[e].
_EDGE_ENDS = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int32)

# Triangulation per inside-bitmask (bit i set = tet corner i has SDF < level).
# Each entry: up to 2 triangles of edge indices, -1 = unused. Winding is
# normalized at runtime, so only the edge sets and quad splits matter here.
_TRI_TABLE = -np.ones((16, 2, 3), dtype=np.int32)
_TRI_TABLE[0b0001, 0] = (0, 1, 2)
_TRI_TABLE[0b0010, 0] = (0, 3, 4)
_TRI_TABLE[0b0100, 0] = (1, 3, 5)
_TRI_TABLE[0b1000, 0] = (2, 4, 5)
_TRI_TABLE[0b0011] = ((1, 3, 4), (1, 4, 2))
_TRI_TABLE[0b0101] = ((0, 3, 5), (0, 5, 2))
_TRI_TABLE[0b1001] = ((0, 4, 5), (0, 5, 1))
_TRI_TABLE[0b0110] = ((0, 4, 5), (0, 5, 1))
_TRI_TABLE[0b1010] = ((0, 3, 5), (0, 5, 2))
_TRI_TABLE[0b1100] = ((1, 3, 4), (1, 4, 2))
_TRI_TABLE[0b0111, 0] = (2, 4, 5)
_TRI_TABLE[0b1011, 0] = (1, 3, 5)
_TRI_TABLE[0b1101, 0] = (0, 3, 4)
_TRI_TABLE[0b1110, 0] = (0, 1, 2)


@functools.partial(jax.jit, static_argnums=(1,))
def _march_kernel(voxels: jax.Array, level: float):
    """Emit a bounded triangle soup from a [R, R, R] volume.

    Returns (triangles [T, 3, 3] in index space, valid [T] bool) where
    T = (R-1)^3 * 6 * 2.
    """
    r = voxels.shape[0]
    n = r - 1  # cells per axis

    cell_idx = jnp.stack(
        jnp.meshgrid(jnp.arange(n), jnp.arange(n), jnp.arange(n), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)  # [C, 3]

    # Corner values per cell: [C, 8]
    corner_vals = jnp.stack(
        [
            voxels[o[0] : o[0] + n, o[1] : o[1] + n, o[2] : o[2] + n].reshape(-1)
            for o in _CUBE_CORNERS
        ],
        axis=-1,
    )
    corner_pos = cell_idx[:, None, :].astype(jnp.float32) + jnp.asarray(
        _CUBE_CORNERS, dtype=jnp.float32
    )  # [C, 8, 3]

    tets = jnp.asarray(_TETS)
    tet_vals = corner_vals[:, tets]  # [C, 6, 4]
    tet_pos = corner_pos[:, tets]  # [C, 6, 4, 3]

    inside = tet_vals < level  # [C, 6, 4]
    case = (
        inside[..., 0].astype(jnp.int32)
        + 2 * inside[..., 1].astype(jnp.int32)
        + 4 * inside[..., 2].astype(jnp.int32)
        + 8 * inside[..., 3].astype(jnp.int32)
    )  # [C, 6]

    # Interpolated point on each of the 6 tet edges: [C, 6, 6, 3]
    ends = jnp.asarray(_EDGE_ENDS)
    va = jnp.take_along_axis(tet_vals, jnp.broadcast_to(ends[:, 0], tet_vals.shape[:2] + (6,)), axis=-1)
    vb = jnp.take_along_axis(tet_vals, jnp.broadcast_to(ends[:, 1], tet_vals.shape[:2] + (6,)), axis=-1)
    pa = tet_pos[:, :, ends[:, 0], :]
    pb = tet_pos[:, :, ends[:, 1], :]
    denom = vb - va
    t = jnp.where(jnp.abs(denom) > 1e-12, (level - va) / jnp.where(denom == 0, 1.0, denom), 0.5)
    t = jnp.clip(t, 0.0, 1.0)
    edge_points = pa + t[..., None] * (pb - pa)  # [C, 6, 6, 3]

    # Gather triangles through the case table: [C, 6, 2, 3] edge ids.
    tri_edges = jnp.asarray(_TRI_TABLE)[case]  # [C, 6, 2, 3]
    valid = tri_edges[..., 0] >= 0  # [C, 6, 2]
    safe_edges = jnp.maximum(tri_edges, 0)
    tris = jnp.take_along_axis(
        edge_points[:, :, None, :, :],  # [C, 6, 1, 6, 3]
        safe_edges[..., None].astype(jnp.int32),  # [C, 6, 2, 3, 1]
        axis=3,
    )  # [C, 6, 2, 3, 3]

    # Orientation: flip so the normal points away from the inside centroid.
    n_in = jnp.sum(inside.astype(jnp.float32), axis=-1)  # [C, 6]
    n_in_safe = jnp.maximum(n_in, 1.0)
    inside_centroid = (
        jnp.sum(tet_pos * inside[..., None].astype(jnp.float32), axis=2) / n_in_safe[..., None]
    )  # [C, 6, 3]
    tri_centroid = jnp.mean(tris, axis=3)  # [C, 6, 2, 3]
    normal = jnp.cross(tris[..., 1, :] - tris[..., 0, :], tris[..., 2, :] - tris[..., 0, :])
    outward = jnp.sum(normal * (tri_centroid - inside_centroid[:, :, None, :]), axis=-1) >= 0
    flipped = tris[..., jnp.array([0, 2, 1]), :]
    tris = jnp.where(outward[..., None, None], tris, flipped)

    return tris.reshape(-1, 3, 3), valid.reshape(-1)


def extract_mesh(voxels, level: float = 0.0, spacing: float = 1.0, origin=None):
    """Extract the ``level`` iso-surface from a dense volume.

    Args:
      voxels: [R, R, R] SDF volume (numpy or JAX), 'ij' (x-major) indexed as
        produced by :func:`shapegan_tpu.ops.coords.voxel_coordinates`.
      level: iso value.
      spacing: world-space size of one voxel step (skimage-compatible:
        vertex positions = index * spacing).
      origin: optional [3] world offset added to vertices.

    Returns:
      (vertices [V, 3] float32, faces [F, 3] int32) — a triangle soup
      (use ``TriangleMesh.weld()`` to merge shared vertices).
    """
    voxels = jnp.asarray(voxels, dtype=jnp.float32)
    tris, valid = _march_kernel(voxels, float(level))
    tris = np.asarray(tris)
    valid = np.asarray(valid)
    tris = tris[valid]  # [F, 3, 3]
    tris = tris * float(spacing)
    if origin is not None:
        tris = tris + np.asarray(origin, dtype=np.float32)
    # Drop degenerate (zero-area) triangles produced by level-exact corners.
    a = tris[:, 1] - tris[:, 0]
    b = tris[:, 2] - tris[:, 0]
    area2 = np.linalg.norm(np.cross(a, b), axis=1)
    tris = tris[area2 > 1e-12]
    vertices = tris.reshape(-1, 3).astype(np.float32)
    faces = np.arange(vertices.shape[0], dtype=np.int32).reshape(-1, 3)
    return vertices, faces


def marching_cubes(voxels, level: float = 0.0, spacing=(1.0, 1.0, 1.0)):
    """skimage.measure.marching_cubes-compatible facade.

    Returns (vertices, faces, normals, values) like the reference call sites
    expect (/root/reference/model/sdf_net.py:103). Normals are per-vertex
    face normals of the triangle soup.
    """
    if isinstance(spacing, (int, float)):
        spacing = (spacing,) * 3
    if len(set(spacing)) != 1:
        raise NotImplementedError("anisotropic spacing not supported")
    vertices, faces = extract_mesh(voxels, level=level, spacing=spacing[0])
    tri = vertices.reshape(-1, 3, 3)
    fnormals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    norms = np.linalg.norm(fnormals, axis=1, keepdims=True)
    fnormals = fnormals / np.maximum(norms, 1e-12)
    normals = np.repeat(fnormals, 3, axis=0)
    values = np.zeros(vertices.shape[0], dtype=np.float32)
    return vertices, faces, normals, values
