#!/usr/bin/env python3
"""Latent-space traversal video frames for a trained DeepSDF autodecoder.

Role parity with /root/reference/demo_sdf_net.py: pick random latent codes
from the trained table, interpolate a smooth (Catmull-Rom spline) path
through them, and render one raymarched frame per step into
``screenshots/sdf_net_animation/``.

    python3 demo_sdf_net.py [samples=N] [frames_per_transition=N] [resolution=N]
"""

import os

import numpy as np
import jax

from shapegan_tpu import checkpoints
from shapegan_tpu.core.config import parse_cli
from shapegan_tpu.models import LATENT_CODES_FILENAME
from shapegan_tpu.models.sdf_net import SDFNet
from shapegan_tpu.render.raymarching import render_image
from shapegan_tpu.util import ensure_directory


def catmull_rom(points: np.ndarray, steps: int) -> np.ndarray:
    """Smooth closed spline through control points [N, D] with ``steps``
    samples per segment."""
    n = len(points)
    out = []
    for i in range(n):
        p0, p1, p2, p3 = (points[(i + k - 1) % n] for k in range(4))
        for s in range(steps):
            t = s / steps
            out.append(
                0.5
                * (
                    2 * p1
                    + (-p0 + p2) * t
                    + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t**2
                    + (-p0 + 3 * p1 - 3 * p2 + p3) * t**3
                )
            )
    return np.asarray(out)


def main():
    config = parse_cli()
    sample_count = int(config.extras.get("samples", 30))
    frames_per_transition = int(config.extras.get("frames_per_transition", 60))
    resolution = int(config.extras.get("resolution", 800))

    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    params = checkpoints.load(params, "sdf_net", base=config.model_dir)
    codes = checkpoints.load_array(LATENT_CODES_FILENAME, base=config.model_dir)

    rng = np.random.default_rng(config.seed)
    keys = codes[rng.choice(len(codes), min(sample_count, len(codes)), replace=False)]
    path = catmull_rom(keys, frames_per_transition)

    out_dir = "screenshots/sdf_net_animation"
    ensure_directory(out_dir)
    for i, code in enumerate(path):
        filename = os.path.join(out_dir, f"frame-{i:05d}.png")
        if os.path.exists(filename):
            continue
        image = render_image(net, params, code.astype(np.float32), resolution=resolution)
        image.save(filename)
        print(f"frame {i + 1}/{len(path)}")


if __name__ == "__main__":
    main()
