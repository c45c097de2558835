#!/usr/bin/env python3
"""Voxel GAN latent-space interpolation demo.

Role parity with /root/reference/demo_gan.py: load a trained generator
checkpoint, continuously interpolate between random latent codes, and show
the decoded voxel volumes (viewer when available; otherwise saves frames).

    python3 demo_gan.py [wgan] [frames=N] [nogui]
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from shapegan_tpu import LATENT_CODE_SIZE, checkpoints
from shapegan_tpu.core.config import parse_cli
from shapegan_tpu.train.common import make_viewer, maybe_print_slice
from shapegan_tpu.train.gan import create_states
from shapegan_tpu.util import ensure_directory

TRANSITION_FRAMES = 40


def main():
    config = parse_cli()
    name = "wgan-generator" if config.extras.get("wgan") else "generator"
    frames = int(config.extras.get("frames", 200))

    generator, _, g_state, _ = create_states(jax.random.PRNGKey(0))
    restored = checkpoints.load(
        {"params": g_state.params, "batch_stats": g_state.batch_stats},
        name, base=config.model_dir,
    )

    @jax.jit
    def decode(z):
        return generator.apply(
            {"params": restored["params"], "batch_stats": restored["batch_stats"]},
            z[None, :], train=False,
        )[0]

    viewer = make_viewer(config.nogui)
    rng = np.random.default_rng(0)
    previous = jnp.asarray(rng.normal(size=LATENT_CODE_SIZE).astype(np.float32))
    target = jnp.asarray(rng.normal(size=LATENT_CODE_SIZE).astype(np.float32))
    ensure_directory("screenshots/gan_interpolation")

    for frame in range(frames):
        t = (frame % TRANSITION_FRAMES) / TRANSITION_FRAMES
        if frame > 0 and frame % TRANSITION_FRAMES == 0:
            previous, target = target, jnp.asarray(
                rng.normal(size=LATENT_CODE_SIZE).astype(np.float32)
            )
        code = previous * (1 - t) + target * t
        voxels = decode(code)
        if viewer is not None:
            viewer.set_voxels(jax.device_get(voxels))
            time.sleep(1 / 30)
        elif frame % TRANSITION_FRAMES == 0:
            maybe_print_slice(voxels, config.show_slice)
    if viewer is not None:
        viewer.stop()


if __name__ == "__main__":
    main()
