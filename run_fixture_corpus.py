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

  7. QUALITY GATE: reconstruct every trained shape from its latent code,
     compute per-shape Chamfer + MMD-CD + COV-CD against ground-truth
     surface samples of the corpus meshes (shapegan_tpu.metrics), and
     overfit ONE shape to assert reconstruction Chamfer below a hard
     threshold. The pipeline FAILS (exit 1) if generative quality
     regresses, not just if the loss goes NaN (reference quality metrics:
     /root/reference/metrics.py:18-45, computed out-of-repo there).

Prints a summary of artifact counts and wall-clock per stage; record the
numbers in BASELINE.md. Usage:

    python run_fixture_corpus.py [workdir] [count=12] [epochs=3] [cpu]
        [ad_epochs=40] [overfit_epochs=150] [recon_max=...] [mmd_max=...]
        [cov_min=...] [overfit_max=...]

Calibrating DEFAULT_GATES (how the shipped thresholds were produced): run
the pipeline once to populate a workdir, then re-run with larger epoch
budgets and read the printed quality numbers, e.g.

    python run_fixture_corpus.py /tmp/corpus ad_epochs=160
    python run_fixture_corpus.py /tmp/corpus ad_epochs=400

(stages 1-3 are idempotent and reuse the prepared data). Set each *_max
gate ~2x above the best measured value and cov_min ~0.7x below, so the
gate absorbs run-to-run noise but trips on a broken trainer.
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
    run(
        workdir,
        count=int(opts.get("count", 12)),
        epochs=int(opts.get("epochs", 3)),
        ad_epochs=int(opts["ad_epochs"]) if "ad_epochs" in opts else None,
        overfit_epochs=int(opts.get("overfit_epochs", 150)),
        gates={k: float(opts[k]) for k in ("recon_max", "mmd_max", "cov_min", "overfit_max")
               if k in opts},
    )


# Quality-gate thresholds, calibrated on the reference corpus run recorded in
# BASELINE.md (count=12 epochs=3 ad_epochs=40 overfit_epochs=150 on one v5e).
# They are regression guards around the measured numbers — generous enough
# for run-to-run noise, tight enough that a silently-broken trainer (wrong
# sign convention, dead latents, optimizer bug) trips them.
DEFAULT_GATES = {
    "recon_max": 0.020,   # mean per-shape reconstruction Chamfer (squared-d)
    "mmd_max": 0.020,     # MMD-CD of reconstructions vs corpus clouds
    "cov_min": 0.5,       # COV-CD: recons must cover >= half the corpus
    "overfit_max": 0.010,  # single-shape overfit reconstruction Chamfer
}


def run(workdir, count=12, epochs=3, uniform_count=16384, cloud_count=50000,
        voxel_resolutions=(8, 16, 32), ad_epochs=None, overfit_epochs=150,
        gates=None):
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
    # The autodecoder epoch is cheap (~30 steps on this corpus) and the
    # quality gate needs enough of them that reconstruction Chamfer is a
    # signal rather than noise — default to 40 independent of `epochs`.
    ad_cfg = TrainConfig(
        nogui=True, epochs=ad_epochs if ad_epochs is not None else max(epochs, 40), seed=0,
        data_dir=os.path.join(workdir, "data"),
        model_dir=os.path.join(workdir, "models"),
        plot_dir=os.path.join(workdir, "plots"),
        extras={"pointcloud_size": str(config.cloud_count)},
    )
    ad_params, ad_latents = ad.train(ad_cfg)
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

    # 7. quantitative quality gate
    t0 = time.time()
    thresholds = dict(DEFAULT_GATES)
    thresholds.update(gates or {})
    quality = quality_gate(
        workdir, config, ad_params, ad_latents, overfit_epochs=overfit_epochs,
    )
    timings["quality_gate"] = time.time() - t0

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

    print("\n=== quality gate ===")
    failures = evaluate_gates(quality, thresholds, verbose=True)
    if quality["empty_meshes"]:
        print(f"note: {quality['empty_meshes']} latent codes decoded to empty meshes")

    # Machine-readable GATE record beside the perf BENCH record (same scheme
    # as run_gan_gate.py), so quality regressions are round-recordable.
    import json

    record = {
        "gate": "autodecoder",
        "quality": quality,
        "thresholds": thresholds,
        "config": {"count": count, "epochs": epochs,
                   "ad_epochs": ad_epochs, "overfit_epochs": overfit_epochs},
        "pass": not failures,
        "failures": failures,
    }
    with open(os.path.join(workdir, "gate_autodecoder.json"), "w") as f:
        json.dump(record, f, indent=1)
    print("GATE " + json.dumps(record))
    if failures:
        raise SystemExit(f"QUALITY GATE FAILED: {', '.join(failures)}")
    print("quality gate: PASS")
    return quality


def evaluate_gates(quality, thresholds, verbose=False):
    """Compare measured quality metrics against thresholds; return the list
    of failed metric names (empty = gate passes)."""
    checks = (
        ("recon_chamfer", quality["recon_chamfer"], "<=", thresholds["recon_max"]),
        ("mmd_cd", quality["mmd_cd"], "<=", thresholds["mmd_max"]),
        ("cov_cd", quality["cov_cd"], ">=", thresholds["cov_min"]),
        ("overfit_chamfer", quality["overfit_chamfer"], "<=", thresholds["overfit_max"]),
    )
    failures = []
    for name, value, op, bound in checks:
        ok = value <= bound if op == "<=" else value >= bound
        if verbose:
            print(f"{name}: {value:.5f} ({op} {bound:g}) {'PASS' if ok else 'FAIL'}")
        if not ok:
            failures.append(name)
    return failures


def quality_gate(workdir, config, ad_params, ad_latents, overfit_epochs=150,
                 point_count=2048):
    """Chamfer/MMD/COV of autodecoder reconstructions vs corpus ground truth,
    plus a single-shape overfit reconstruction check.

    Ground-truth clouds are sampled from the prepared meshes; both sides go
    through :func:`shapegan_tpu.metrics.rescale_point_cloud`, so the
    half-unit-sphere comparison convention of the reference
    (/root/reference/metrics.py:12-16) holds regardless of prep-time
    normalization details.
    """
    import jax.numpy as jnp

    from shapegan_tpu.data.mesh_io import load_mesh
    from shapegan_tpu.metrics import pairwise_chamfer, rescale_point_cloud
    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.train import sdf_autodecoder as ad

    net = SDFNet()

    # Shape order in the combined cloud = sorted cloud file stems
    # (data/prepare.py:169-171) = sorted prepared mesh ids.
    cloud_dir = os.path.join(config.output_dir, "cloud")
    stems = sorted(os.path.splitext(f)[0] for f in os.listdir(cloud_dir)
                   if f.endswith(".npy"))
    mesh_dir = os.path.join(workdir, "meshes")
    gt = np.stack([
        rescale_point_cloud(
            load_mesh(os.path.join(mesh_dir, stem + ".obj")).sample(point_count, seed=i)
        )
        for i, stem in enumerate(stems)
    ])

    def reconstruct(params, code, seed):
        mesh = net.get_mesh(params, jnp.asarray(code), voxel_resolution=64)
        if mesh is None:
            return None
        return rescale_point_cloud(mesh.sample(point_count, seed=seed))

    recon, empty = [], 0
    for i in range(len(stems)):
        cloud = reconstruct(ad_params, np.asarray(ad_latents)[i], seed=100 + i)
        if cloud is None:
            empty += 1
            # An empty decode is maximally bad: stand in a far-away dummy
            # cloud so MMD/recon Chamfer punish it instead of skipping it.
            cloud = np.full((point_count, 3), 10.0, np.float32)
        recon.append(cloud)
    recon = np.stack(recon)

    d = pairwise_chamfer(recon, gt)
    recon_chamfer = float(np.mean(np.diag(d)))
    mmd_cd = float(d.min(axis=0).mean())
    cov_cd = float(len(np.unique(d.argmin(axis=1))) / len(gt))

    # Single-shape overfit: slice shape 0's rows out of the combined cloud
    # and run the same trainer on them alone, long enough to overfit.
    overfit_dir = os.path.join(workdir, "overfit")
    os.makedirs(overfit_dir, exist_ok=True)
    pts = np.load(os.path.join(workdir, "data", "sdf_points.npy"), mmap_mode="r")
    vals = np.load(os.path.join(workdir, "data", "sdf_values.npy"), mmap_mode="r")
    n = config.cloud_count
    np.save(os.path.join(overfit_dir, "sdf_points.npy"), np.asarray(pts[:n]))
    np.save(os.path.join(overfit_dir, "sdf_values.npy"), np.asarray(vals[:n]))
    from shapegan_tpu.core.config import TrainConfig

    overfit_cfg = TrainConfig(
        nogui=True, epochs=overfit_epochs, seed=0,
        data_dir=overfit_dir,
        model_dir=os.path.join(overfit_dir, "models"),
        plot_dir=os.path.join(overfit_dir, "plots"),
        extras={"pointcloud_size": str(n)},
    )
    of_params, of_latents = ad.train(overfit_cfg)
    of_cloud = reconstruct(of_params, np.asarray(of_latents)[0], seed=999)
    if of_cloud is None:
        overfit_chamfer = float("inf")
    else:
        from shapegan_tpu.metrics import chamfer_distance

        overfit_chamfer = float(chamfer_distance(jnp.asarray(of_cloud), jnp.asarray(gt[0])))

    return {
        "recon_chamfer": recon_chamfer,
        "mmd_cd": mmd_cd,
        "cov_cd": cov_cd,
        "overfit_chamfer": overfit_chamfer,
        "empty_meshes": empty,
    }


if __name__ == "__main__":
    main()
