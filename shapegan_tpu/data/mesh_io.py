"""Triangle mesh container + OBJ/STL IO + sampling.

The reference leans on ``trimesh`` for mesh loading, unit-cube/sphere
normalization and surface sampling (/root/reference/prepare_shapenet_dataset.py,
model/sdf_net.py:111-116). This module provides the in-framework equivalent:
a small numpy mesh type with area-weighted surface sampling, OBJ and binary
STL round-tripping, and the two normalization conventions used throughout the
pipeline.
"""

from __future__ import annotations

import struct

import numpy as np


class TriangleMesh:
    """An indexed triangle mesh: ``vertices`` [V, 3] float32, ``faces`` [F, 3] int32."""

    def __init__(self, vertices, faces, vertex_normals=None):
        self.vertices = np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
        self.faces = np.asarray(faces, dtype=np.int32).reshape(-1, 3)
        self._vertex_normals = vertex_normals

    # ------------------------------------------------------------- geometry

    @property
    def triangles(self) -> np.ndarray:
        return self.vertices[self.faces]  # [F, 3, 3]

    @property
    def face_normals(self) -> np.ndarray:
        tri = self.triangles
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        return n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)

    @property
    def face_areas(self) -> np.ndarray:
        tri = self.triangles
        return 0.5 * np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)

    @property
    def area(self) -> float:
        return float(self.face_areas.sum())

    @property
    def vertex_normals(self) -> np.ndarray:
        if self._vertex_normals is None:
            normals = np.zeros_like(self.vertices)
            fn = self.face_normals * self.face_areas[:, None]
            for i in range(3):
                np.add.at(normals, self.faces[:, i], fn)
            self._vertex_normals = normals / np.maximum(
                np.linalg.norm(normals, axis=1, keepdims=True), 1e-12
            )
        return self._vertex_normals

    @property
    def bounding_box(self):
        return self.vertices.min(axis=0), self.vertices.max(axis=0)

    @property
    def bounding_radius(self) -> float:
        return float(np.linalg.norm(self.vertices, axis=1).max())

    def sample(self, count: int, seed: int | None = None, return_normals: bool = False):
        """Area-weighted uniform surface sampling (trimesh.Mesh.sample parity)."""
        rng = np.random.default_rng(seed)
        areas = self.face_areas
        probabilities = areas / max(areas.sum(), 1e-12)
        face_idx = rng.choice(len(self.faces), size=count, p=probabilities)
        tri = self.triangles[face_idx]
        u, v = rng.random((2, count)).astype(np.float32)
        flip = u + v > 1.0
        u[flip], v[flip] = 1.0 - u[flip], 1.0 - v[flip]
        pts = tri[:, 0] + u[:, None] * (tri[:, 1] - tri[:, 0]) + v[:, None] * (tri[:, 2] - tri[:, 0])
        if return_normals:
            return pts.astype(np.float32), self.face_normals[face_idx]
        return pts.astype(np.float32)

    # -------------------------------------------------------- normalization

    def scaled_to_unit_sphere(self) -> "TriangleMesh":
        """Center on the bounding-box midpoint and scale so the farthest
        vertex sits on the unit sphere (mesh_to_sdf's convention used by the
        reference's point-sample prep)."""
        lo, hi = self.bounding_box
        center = (lo + hi) / 2.0
        v = self.vertices - center
        scale = np.linalg.norm(v, axis=1).max()
        return TriangleMesh(v / max(scale, 1e-12), self.faces)

    def scaled_to_unit_cube(self) -> "TriangleMesh":
        """Center and scale so the longest bounding-box side is 2 (fills
        [-1, 1]^3; the reference's voxelization convention)."""
        lo, hi = self.bounding_box
        center = (lo + hi) / 2.0
        v = self.vertices - center
        scale = (hi - lo).max() / 2.0
        return TriangleMesh(v / max(scale, 1e-12), self.faces)

    # ---------------------------------------------------------------- misc

    def weld(self, decimals: int = 6) -> "TriangleMesh":
        """Merge duplicate vertices (rounds coordinates to ``decimals``).
        Needed after triangle-soup extraction to get shared vertex normals."""
        rounded = np.round(self.vertices, decimals)
        unique, inverse = np.unique(rounded, axis=0, return_inverse=True)
        faces = inverse[self.faces]
        # Drop degenerate faces created by welding.
        ok = (
            (faces[:, 0] != faces[:, 1])
            & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2])
        )
        return TriangleMesh(unique, faces[ok])

    def __repr__(self):
        return f"TriangleMesh(V={len(self.vertices)}, F={len(self.faces)})"

    # ------------------------------------------------------------------ IO

    def save(self, path: str) -> None:
        if path.endswith(".obj"):
            save_obj(self, path)
        elif path.endswith(".stl"):
            save_stl(self, path)
        else:
            raise ValueError(f"unsupported mesh format: {path}")


def load_mesh(path: str) -> TriangleMesh:
    if path.endswith(".obj"):
        return load_obj(path)
    if path.endswith(".stl"):
        return load_stl(path)
    raise ValueError(f"unsupported mesh format: {path}")


# ---------------------------------------------------------------------- OBJ


def load_obj(path: str) -> TriangleMesh:
    vertices, faces = [], []
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                vertices.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) for tok in line.split()[1:]]
                idx = [i - 1 if i > 0 else len(vertices) + i for i in idx]
                for k in range(1, len(idx) - 1):  # fan-triangulate polygons
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return TriangleMesh(np.array(vertices, dtype=np.float32), np.array(faces, dtype=np.int32))


def save_obj(mesh: TriangleMesh, path: str) -> None:
    with open(path, "w") as f:
        for v in mesh.vertices:
            f.write(f"v {v[0]:.8f} {v[1]:.8f} {v[2]:.8f}\n")
        for face in mesh.faces + 1:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")


# ---------------------------------------------------------------------- STL


def load_stl(path: str) -> TriangleMesh:
    with open(path, "rb") as f:
        header = f.read(5)
        f.seek(0)
        if header == b"solid":
            data = f.read().decode(errors="replace")
            if "facet" in data:
                return _load_stl_ascii(data)
            f.seek(0)
        return _load_stl_binary(f.read())


def _load_stl_ascii(data: str) -> TriangleMesh:
    vertices = []
    for line in data.splitlines():
        line = line.strip()
        if line.startswith("vertex"):
            parts = line.split()
            vertices.append([float(parts[1]), float(parts[2]), float(parts[3])])
    vertices = np.array(vertices, dtype=np.float32)
    faces = np.arange(len(vertices), dtype=np.int32).reshape(-1, 3)
    return TriangleMesh(vertices, faces).weld()


def _load_stl_binary(raw: bytes) -> TriangleMesh:
    count = struct.unpack("<I", raw[80:84])[0]
    records = np.frombuffer(raw[84 : 84 + count * 50], dtype=np.uint8).reshape(count, 50)
    tri = records[:, 12:48].copy().view(np.float32).reshape(count, 3, 3)
    vertices = tri.reshape(-1, 3)
    faces = np.arange(len(vertices), dtype=np.int32).reshape(-1, 3)
    return TriangleMesh(vertices, faces).weld()


def save_stl(mesh: TriangleMesh, path: str) -> None:
    tri = mesh.triangles
    normals = mesh.face_normals
    count = len(tri)
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", count))
        record = np.zeros((count, 50), dtype=np.uint8)
        record[:, 0:12] = normals.astype("<f4").view(np.uint8).reshape(count, 12)
        record[:, 12:48] = tri.astype("<f4").reshape(count, 9).view(np.uint8).reshape(count, 36)
        f.write(record.tobytes())
