"""Bundled example fixtures.

The reference ships ``examples/chair.obj`` for its single-shape overfit demo
(/root/reference/demo_training.py:13-16). We generate an equivalent fixture
procedurally — a chair built from box/capsule SDF primitives, meshed with the
framework's own extractor — so no binary assets live in the repo.
"""

from __future__ import annotations

import os

import numpy as np


def example_chair_sdf(points: np.ndarray) -> np.ndarray:
    """Analytic SDF of a simple chair (seat + backrest + 4 legs) in [-1, 1]^3."""
    from shapegan_tpu.data.synthetic import box_sdf

    parts = [
        box_sdf(points, half_extents=(0.45, 0.05, 0.45), center=(0.0, -0.1, 0.0)),   # seat
        box_sdf(points, half_extents=(0.45, 0.45, 0.06), center=(0.0, 0.3, -0.39)),  # back
    ]
    for sx in (-0.38, 0.38):
        for sz in (-0.38, 0.38):
            parts.append(
                box_sdf(points, half_extents=(0.05, 0.35, 0.05), center=(sx, -0.5, sz))
            )
    return np.minimum.reduce(parts)


def example_chair_mesh(resolution: int = 64):
    """TriangleMesh of the example chair."""
    from shapegan_tpu.data.mesh_io import TriangleMesh
    from shapegan_tpu.ops.coords import voxel_coordinate_grid
    from shapegan_tpu.ops.mesh_extract import extract_mesh

    sdf = example_chair_sdf(voxel_coordinate_grid(resolution)).astype(np.float32)
    vertices, faces = extract_mesh(
        sdf, spacing=2.0 / (resolution - 1), origin=(-1.0, -1.0, -1.0)
    )
    return TriangleMesh(vertices, faces).weld()


def example_chair_path(resolution: int = 64) -> str:
    """Path to examples/chair.obj, generating it on first use."""
    directory = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(directory, "chair.obj")
    if not os.path.exists(path):
        example_chair_mesh(resolution).save(path)
    return path
