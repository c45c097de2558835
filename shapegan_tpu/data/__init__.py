"""Datasets, synthetic SDF shapes, mesh IO and the offline prep pipeline."""

from shapegan_tpu.data.datasets import VoxelDataset, PointDataset, BatchLoader  # noqa: F401
from shapegan_tpu.data.mesh_io import TriangleMesh  # noqa: F401
