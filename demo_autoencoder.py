#!/usr/bin/env python3
"""Autoencoder reconstruction / latent-interpolation demo.

Role parity with /root/reference/demo_autoencoder.py: encode dataset samples
with a trained (V)AE checkpoint and morph between consecutive shapes'
latent codes in the viewer.

    python3 demo_autoencoder.py [classic] [synthetic=N] [nogui] [show_slice]
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from shapegan_tpu import checkpoints
from shapegan_tpu.core.config import parse_cli
from shapegan_tpu.models.autoencoder import Autoencoder
from shapegan_tpu.train.autoencoder import create_state
from shapegan_tpu.train.common import make_viewer, maybe_print_slice, resolve_voxel_dataset

TRANSITION_FRAMES = 30


def main():
    config = parse_cli()
    model = Autoencoder(is_variational=not config.classic)
    state = create_state(model, jax.random.PRNGKey(0))
    restored = checkpoints.load(
        {"params": state.params, "batch_stats": state.batch_stats},
        model.checkpoint_name, base=config.model_dir,
    )
    variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}

    dataset = resolve_voxel_dataset(config, resolution=32)

    @jax.jit
    def encode(x):
        return model.apply(variables, x[None], train=False, method=Autoencoder.encode)[0]

    @jax.jit
    def decode(z):
        return model.apply(variables, z[None], train=False, method=Autoencoder.decode)[0]

    viewer = make_viewer(config.nogui)
    rng = np.random.default_rng(0)
    order = rng.permutation(len(dataset))
    previous = encode(jnp.asarray(dataset[int(order[0])]))

    # headless runs bound the tour (epochs=N transitions); viewer runs loop on
    transitions = order[1:]
    if viewer is None and config.epochs:
        transitions = transitions[: config.epochs]

    for index in transitions:
        target = encode(jnp.asarray(dataset[int(index)]))
        for frame in range(TRANSITION_FRAMES):
            t = frame / TRANSITION_FRAMES
            voxels = decode(previous * (1 - t) + target * t)
            if viewer is not None:
                viewer.set_voxels(jax.device_get(voxels))
                time.sleep(1 / 30)
        maybe_print_slice(voxels, config.show_slice)
        previous = target
    if viewer is not None:
        viewer.stop()


if __name__ == "__main__":
    main()
