#!/usr/bin/env python3
"""Hyperparameter scan for the progressive-GAN quality gate's small-scale
regime (iteration 0, 8^3, synthetic shapes).

The round-5 gate run showed the reference cadence (G every 5th batch,
RMSprop 1e-4) mean-collapses at gate scale: with 64 synthetic shapes the
loader yields 4 batches/epoch, so the generator gets <1 update/epoch
(~200 per 250-epoch iteration vs ~12.5k in the reference's real-data runs)
and converges to the constant field matching the data mean (+0.096) with
zero negative voxels — every sampled mesh empty (see BASELINE.md, "GAN
quality gate" section). This scan measures which (g_every, learn_rate)
rebalance actually forms shapes within the gate budget, at iteration 0
where epochs are cheap.

Usage: python scripts/prog_gate_scan.py [workdir] [epochs=500] [shapes=64]
"""

import json
import os
import shutil
import sys
import time

import numpy as np


def main():
    opts = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    argv = [a for a in sys.argv[1:] if "=" not in a]
    workdir = argv[0] if argv else "/tmp/prog_scan"
    epochs = int(opts.get("epochs", 500))
    shapes = int(opts.get("shapes", 64))
    seed = int(opts.get("seed", 0))

    if "cpu" in argv:
        from shapegan_tpu.core.config import _force_cpu_backend

        _force_cpu_backend()
    else:
        from shapegan_tpu.util import probe_jax_backend

        count, detail = probe_jax_backend(180.0)
        if count < 0:
            raise SystemExit(f"prog_gate_scan: JAX backend unreachable ({detail})")

    import jax

    from shapegan_tpu import checkpoints
    from shapegan_tpu.core.config import TrainConfig
    from shapegan_tpu.data.synthetic import make_voxel_dataset
    from shapegan_tpu.metrics import (
        coverage,
        minimum_matching_distance,
        sample_from_voxels,
        sample_point_clouds,
    )
    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.train import hybrid_progressive_gan as prog

    gt_voxels = make_voxel_dataset(24, 64, rescale=False, seed=seed)
    gt_clouds = sample_from_voxels(gt_voxels, point_count=2048, seed=seed)

    variants = [
        {"name": "g1_lr3e4", "g_every": 1, "learn_rate": 3e-4},
        {"name": "g1_lr1e3", "g_every": 1, "learn_rate": 1e-3},
        {"name": "g1_g1e3_d3e4", "g_every": 1, "learn_rate": 1e-3, "d_learn_rate": 3e-4},
        {"name": "g2_lr1e3", "g_every": 2, "learn_rate": 1e-3},
    ]
    net = SDFNet()
    g0 = net.init(jax.random.PRNGKey(0))
    codes = np.asarray(jax.random.normal(jax.random.PRNGKey(seed + 11), (16, 128)))
    results = []
    for v in variants:
        vdir = os.path.join(workdir, v["name"])
        shutil.rmtree(vdir, ignore_errors=True)
        os.makedirs(os.path.join(vdir, "plots"), exist_ok=True)
        cfg = TrainConfig(
            nogui=True, synthetic=shapes, epochs=epochs, iteration=0, seed=seed,
            batch_size=16, model_dir=os.path.join(vdir, "models"),
            plot_dir=os.path.join(vdir, "plots"),
            extras={"save_every": 100,
                    **{k: v[k] for k in ("g_every", "learn_rate", "d_learn_rate")
                       if k in v}},
        )
        t0 = time.time()
        prog.train(cfg)
        wall = time.time() - t0
        params = checkpoints.load(
            g0, prog.G_NAME.format(0), base=os.path.join(vdir, "models")
        )
        # Occupancy of the raw 32^3 field + mesh-based MMD/COV.
        occ = []
        for c in codes[:8]:
            vox = np.asarray(net.get_voxels(params, c, voxel_resolution=32))
            occ.append(float((vox < 0).mean()))
        clouds = sample_point_clouds(
            net, params, codes, point_count=2048, voxel_resolution=32, seed=seed + 11
        )
        empty = int(np.sum(~clouds.any(axis=(1, 2))))
        nonzero = clouds[clouds.any(axis=(1, 2))]
        mmd = minimum_matching_distance(nonzero, gt_clouds) if len(nonzero) else float("inf")
        cov = coverage(nonzero, gt_clouds) if len(nonzero) else 0.0
        row = dict(v, wall_s=round(wall, 1), occupancy=[round(o, 4) for o in occ],
                   empty=empty, mmd_cd=round(mmd, 5), cov_cd=round(cov, 4))
        results.append(row)
        print("RESULT", json.dumps(row), flush=True)

    print("\n=== scan summary (iteration 0, 8^3, %d epochs, %d shapes) ===" % (epochs, shapes))
    for r in results:
        print(f"{r['name']}: empty={r['empty']}/16 mmd={r['mmd_cd']} cov={r['cov_cd']} "
              f"mean_occ={np.mean(r['occupancy']):.4f} wall={r['wall_s']}s")
    with open(os.path.join(workdir, "scan.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
