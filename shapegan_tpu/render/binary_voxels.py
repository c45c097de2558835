"""Binary voxel meshing: one cube face between every occupied/empty neighbor
pair (parity with /root/reference/rendering/binary_voxels_to_mesh.py, but
emitting an indexed TriangleMesh from a single vectorized face table instead
of six hand-unrolled per-axis blocks)."""

from __future__ import annotations

import numpy as np

from shapegan_tpu.data.mesh_io import TriangleMesh

# For each (axis, direction): the four face-corner offsets, CCW as seen from
# the face normal side, relative to the occupied voxel's min corner.
_FACE_CORNERS = {
    (0, +1): [(1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1)],
    (0, -1): [(0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0)],
    (1, +1): [(0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0)],
    (1, -1): [(0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)],
    (2, +1): [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],
    (2, -1): [(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0)],
}


def create_binary_voxel_mesh(voxels: np.ndarray, threshold: float = 0.0) -> TriangleMesh:
    """Cube-face mesh of all occupied (< threshold) voxels, in voxel index
    space (vertices in [0, res]³)."""
    occupied = np.pad(np.asarray(voxels) < threshold, 1, mode="constant")

    triangles = []
    for (axis, direction), corners in _FACE_CORNERS.items():
        shift_a = [slice(None)] * 3
        shift_b = [slice(None)] * 3
        if direction > 0:
            shift_a[axis] = slice(None, -1)
            shift_b[axis] = slice(1, None)
        else:
            shift_a[axis] = slice(1, None)
            shift_b[axis] = slice(None, -1)
        faces = occupied[tuple(shift_a)] & ~occupied[tuple(shift_b)]
        cells = np.argwhere(faces)
        if cells.shape[0] == 0:
            continue
        # For direction<0 the slice starts at 1, so the occupied voxel's
        # padded index is cells + e_axis; un-pad by subtracting 1 everywhere.
        if direction < 0:
            cells = cells + np.eye(3, dtype=cells.dtype)[axis][None, :]
        base = cells - 1  # occupied voxel's min corner in unpadded index space
        quad = base[:, None, :] + np.asarray(corners)[None, :, :]  # [F, 4, 3]
        tri1 = quad[:, [0, 1, 2], :]
        tri2 = quad[:, [0, 2, 3], :]
        triangles.append(tri1)
        triangles.append(tri2)

    if not triangles:
        return TriangleMesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    tris = np.concatenate(triangles).astype(np.float32)
    vertices = tris.reshape(-1, 3)
    faces = np.arange(vertices.shape[0], dtype=np.int32).reshape(-1, 3)
    return TriangleMesh(vertices, faces).weld(decimals=4)
