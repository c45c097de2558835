#!/usr/bin/env python3
"""Visual walkthrough of the data-preparation pipeline on the example chair.

Role parity with /root/reference/demo_data_preparation.py: shows/saves each
prep artifact — the mesh, voxelizations at multiple resolutions, uniform and
near-surface SDF point samples — as matplotlib figures under
``screenshots/data_preparation/``.
"""

import os

import numpy as np

from shapegan_tpu.data.mesh_io import load_mesh
from shapegan_tpu.data.mesh_to_sdf import MeshSDF, mesh_to_voxels, sample_uniform_sdf, sample_surface_sdf
from shapegan_tpu.examples import example_chair_path
from shapegan_tpu.util import create_text_slice, ensure_directory


def scatter_sdf(ax, data, title):
    points, sdf = data[:, :3], data[:, 3]
    colors = np.where(sdf[:, None] < 0, [[0.1, 0.1, 0.9]], [[0.9, 0.1, 0.1]])
    ax.scatter(points[:, 0], points[:, 2], points[:, 1], c=colors, s=1)
    ax.set_title(title)


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = "screenshots/data_preparation"
    ensure_directory(out_dir)

    mesh = load_mesh(example_chair_path())
    print(f"example mesh: {mesh}")

    # 1. voxelizations
    fig = plt.figure(figsize=(12, 4))
    for i, res in enumerate((8, 16, 32)):
        voxels = mesh_to_voxels(mesh, voxel_resolution=res)
        print(f"\nvoxels at {res}^3:")
        print(create_text_slice(np.clip(voxels / 0.1, -1, 1)))
        ax = fig.add_subplot(1, 3, i + 1, projection="3d")
        occ = np.argwhere(voxels < 0)
        ax.scatter(occ[:, 0], occ[:, 2], occ[:, 1], s=2)
        ax.set_title(f"occupied voxels {res}^3")
    fig.savefig(os.path.join(out_dir, "voxels.png"), dpi=100)
    plt.close(fig)

    # 2. point samples
    unit = mesh.scaled_to_unit_sphere()
    oracle = MeshSDF(unit)
    uniform = sample_uniform_sdf(unit, 4000, rng=np.random.default_rng(0), oracle=oracle)
    surface = sample_surface_sdf(unit, 4000, rng=np.random.default_rng(0), oracle=oracle, seed=0)
    fig = plt.figure(figsize=(10, 5))
    scatter_sdf(fig.add_subplot(1, 2, 1, projection="3d"), uniform, "uniform samples")
    scatter_sdf(fig.add_subplot(1, 2, 2, projection="3d"), surface, "near-surface samples")
    fig.savefig(os.path.join(out_dir, "points.png"), dpi=100)
    plt.close(fig)
    print(f"figures saved under {out_dir}/")


if __name__ == "__main__":
    main()
