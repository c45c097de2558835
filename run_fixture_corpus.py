#!/usr/bin/env python3
"""End-to-end L0→L3 pipeline run on a corpus of pathological meshes.

ShapeNet cannot be downloaded in this environment, so the corpus is built
from shapegan_tpu.data.fixtures: open shells, double-walled boxes,
self-intersecting unions, degenerate triangle soups, chair-likes, and
watertight controls — the failure modes ShapeNetCore.v2 actually contains
(the reference pipeline is proven on it, /root/reference/README.md:29-63).

Stages (each idempotent, like the reference's prep):
  1. write the corpus of .obj files;
  2. prepare: voxels [8,16,32] + uniform/surface samples + DeepSDF clouds
     via the scan-sign oracle, with .badmesh quarantine;
  3. combine clouds + write train/test splits;
  4. train the classic autoencoder a few epochs on the corpus voxels;
  5. train the DeepSDF autodecoder a few epochs on the combined clouds;
  6. render a create_plot-style reconstruction grid from the trained AE.

Prints a summary of artifact counts and wall-clock per stage; record the
numbers in BASELINE.md. Usage:

    python run_fixture_corpus.py [workdir] [count=12] [epochs=3] [cpu]
"""

import os
import sys
import time

import numpy as np


def main():
    argv = [a for a in sys.argv[1:] if "=" not in a]
    opts = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    if "cpu" in argv:
        # Same escape hatch as every trainer CLI's `cpu` token (guards
        # against an already-initialized backend instead of silently
        # no-op'ing; must run before any backend touch).
        from shapegan_tpu.core.config import _force_cpu_backend

        _force_cpu_backend()
        argv.remove("cpu")
    workdir = argv[0] if argv else "fixture_corpus_run"
    run(workdir, count=int(opts.get("count", 12)), epochs=int(opts.get("epochs", 3)))


def run(workdir, count=12, epochs=3, uniform_count=16384, cloud_count=50000,
        voxel_resolutions=(8, 16, 32)):
    from shapegan_tpu.data.fixtures import make_fixture_corpus
    from shapegan_tpu.data.prepare import (
        PrepareConfig,
        combine_sdf_clouds,
        process_mesh_files,
        write_split_file,
    )

    os.makedirs(workdir, exist_ok=True)
    timings = {}

    # 1-2. corpus + prepare
    t0 = time.time()
    mesh_dir = os.path.join(workdir, "meshes")
    paths = make_fixture_corpus(mesh_dir, count=count, seed=0)
    config = PrepareConfig(
        output_dir=os.path.join(workdir, "data", "fixtures"),
        voxel_resolutions=list(voxel_resolutions),
        uniform_count=uniform_count, surface_count=uniform_count,
        cloud_count=cloud_count,
    )
    results = process_mesh_files(paths, config)
    timings["prepare"] = time.time() - t0
    n_ok = results.count("ok") + results.count("skipped")
    n_bad = results.count("bad")

    # 3. combine + splits
    t0 = time.time()
    combine_sdf_clouds(config, out_dir=os.path.join(workdir, "data"))
    write_split_file(config, train_fraction=0.9)
    timings["combine"] = time.time() - t0

    # 4. classic AE on the corpus voxels (32^3)
    from shapegan_tpu.core.config import TrainConfig
    from shapegan_tpu.train import autoencoder as ae

    t0 = time.time()
    vox_dir = os.path.join(config.output_dir, "voxels_32")
    ae_cfg = TrainConfig(
        classic=True, nogui=True, epochs=epochs, seed=0,
        data_dir=os.path.join(workdir, "data"), category="fixtures",
        model_dir=os.path.join(workdir, "models"),
        plot_dir=os.path.join(workdir, "plots"),
    )
    os.makedirs(ae_cfg.plot_dir, exist_ok=True)
    ae_state = ae.train(ae_cfg)
    timings["train_ae"] = time.time() - t0

    # 5. DeepSDF autodecoder on the combined clouds
    from shapegan_tpu.train import sdf_autodecoder as ad

    t0 = time.time()
    ad_cfg = TrainConfig(
        nogui=True, epochs=epochs, seed=0,
        data_dir=os.path.join(workdir, "data"),
        model_dir=os.path.join(workdir, "models"),
        plot_dir=os.path.join(workdir, "plots"),
        extras={"pointcloud_size": str(config.cloud_count)},
    )
    ad.train(ad_cfg)
    timings["train_autodecoder"] = time.time() - t0

    # 6. reconstruction grid (create_plot 'autoencoder' recipe shape)
    t0 = time.time()
    import jax

    from shapegan_tpu.data.datasets import VoxelDataset
    from shapegan_tpu.models.autoencoder import Autoencoder

    dataset = VoxelDataset.glob(os.path.join(vox_dir, "*.npy"))
    batch = np.stack([dataset[i] for i in range(min(4, len(dataset)))])
    model = Autoencoder(is_variational=False)
    recon = model.apply(
        {"params": ae_state.params, "batch_stats": ae_state.batch_stats},
        batch, train=False,
    )
    from shapegan_tpu.util import create_text_slice

    for name, vol in (("data", batch[0]), ("reconstruction", np.asarray(recon)[0])):
        print(f"--- {name} slice ---")
        print(create_text_slice(vol))
    grid_path = os.path.join(workdir, "plots", "fixture_reconstructions.npy")
    np.save(grid_path, np.asarray(recon))
    timings["plot"] = time.time() - t0

    print("\n=== fixture corpus pipeline summary ===")
    print(f"meshes: {count} written, {n_ok} prepared, {n_bad} quarantined (.badmesh)")
    for res in config.voxel_resolutions:
        d = os.path.join(config.output_dir, f"voxels_{res}")
        print(f"voxels_{res}: {len(os.listdir(d))} files")
    for sub in ("uniform", "surface", "cloud"):
        d = os.path.join(config.output_dir, sub)
        print(f"{sub}: {len(os.listdir(d))} files")
    pts = np.load(os.path.join(workdir, "data", "sdf_points.npy"), mmap_mode="r")
    print(f"combined cloud: {pts.shape[0]} points")
    for k, v in timings.items():
        print(f"{k}: {v:.1f}s")


if __name__ == "__main__":
    main()
