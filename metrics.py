#!/usr/bin/env python3
"""Sample evaluation point clouds from trained models / datasets.

CLI parity with /root/reference/metrics.py modes (:48-91):
    python3 metrics.py sample       # clouds from the current sdf_net checkpoint
    python3 metrics.py checkpoints  # clouds from every epoch snapshot
    python3 metrics.py dataset      # clouds from dataset voxel volumes
    python3 metrics.py test         # quick chamfer self-test
Outputs .npy clouds under data/eval/; additionally prints in-framework
Chamfer-based MMD/COV when both generated and dataset clouds exist.
"""

import os
import sys

import numpy as np

from shapegan_tpu import checkpoints
from shapegan_tpu.core.config import parse_cli
from shapegan_tpu.metrics import (
    coverage,
    minimum_matching_distance,
    sample_from_voxels,
    sample_point_clouds,
)
from shapegan_tpu.models import LATENT_CODES_FILENAME
from shapegan_tpu.models.sdf_net import SDFNet
from shapegan_tpu.train.common import resolve_voxel_dataset
from shapegan_tpu.util import ensure_directory

SAMPLE_COUNT = 64
POINT_COUNT = 2048
OUT_DIR = "data/eval"


def load_net(config, epoch=None):
    import jax

    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    params = checkpoints.load(params, "sdf_net", epoch=epoch, base=config.model_dir)
    codes = checkpoints.load_array(LATENT_CODES_FILENAME, epoch=epoch, base=config.model_dir)
    return net, params, codes


def main():
    config = parse_cli()
    ensure_directory(OUT_DIR)
    mode = sys.argv[1] if len(sys.argv) > 1 else "sample"

    if mode == "sample":
        net, params, codes = load_net(config)
        idx = np.random.default_rng(0).choice(len(codes), min(SAMPLE_COUNT, len(codes)), replace=False)
        clouds = sample_point_clouds(net, params, codes[idx], POINT_COUNT)
        np.save(os.path.join(OUT_DIR, "generated.npy"), clouds)
        print(f"wrote {clouds.shape} -> {OUT_DIR}/generated.npy")
    elif mode == "checkpoints":
        import glob

        for path in sorted(glob.glob(os.path.join(config.model_dir, "checkpoints", "sdf_net-epoch-*.npz"))):
            epoch = int(path.split("-epoch-")[1].split(".")[0])
            try:
                net, params, codes = load_net(config, epoch=epoch)
            except FileNotFoundError:
                continue
            idx = np.random.default_rng(0).choice(len(codes), min(SAMPLE_COUNT, len(codes)), replace=False)
            clouds = sample_point_clouds(net, params, codes[idx], POINT_COUNT)
            np.save(os.path.join(OUT_DIR, f"generated-epoch-{epoch:05d}.npy"), clouds)
            print(f"epoch {epoch}: wrote {clouds.shape}")
    elif mode == "dataset":
        dataset = resolve_voxel_dataset(config, resolution=32)
        idx = np.random.default_rng(0).choice(len(dataset), min(SAMPLE_COUNT, len(dataset)), replace=False)
        voxels = np.stack([dataset[int(i)] for i in idx])
        clouds = sample_from_voxels(voxels, POINT_COUNT)
        np.save(os.path.join(OUT_DIR, "dataset.npy"), clouds)
        print(f"wrote {clouds.shape} -> {OUT_DIR}/dataset.npy")
    elif mode == "test":
        rng = np.random.default_rng(0)
        a = rng.normal(size=(512, 3)).astype(np.float32)
        from shapegan_tpu.metrics import chamfer_distance

        print("chamfer(a, a) =", float(chamfer_distance(a, a)))
        print("chamfer(a, a+0.1) =", float(chamfer_distance(a, a + 0.1)))
    else:
        raise SystemExit(f"unknown mode {mode}")

    gen_path = os.path.join(OUT_DIR, "generated.npy")
    data_path = os.path.join(OUT_DIR, "dataset.npy")
    if os.path.exists(gen_path) and os.path.exists(data_path):
        generated = np.load(gen_path)
        reference = np.load(data_path)
        print("MMD-CD:", minimum_matching_distance(generated, reference))
        print("COV-CD:", coverage(generated, reference))


if __name__ == "__main__":
    main()
