#!/usr/bin/env python3
"""Live single-shape DeepSDF overfit demo.

Role parity with /root/reference/demo_training.py: sample SDF ground truth
from the example chair mesh, train a zero-latent SDFNet on it, and show the
evolving reconstruction (GL viewer when available, ASCII slice otherwise).

    python3 demo_training.py [nogui] [show_slice] [steps=N]
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from shapegan_tpu.core.config import parse_cli
from shapegan_tpu.data.mesh_io import load_mesh
from shapegan_tpu.data.mesh_to_sdf import sample_sdf_near_surface
from shapegan_tpu.examples import example_chair_path
from shapegan_tpu.models.sdf_net import SDFNet
from shapegan_tpu.train.common import make_viewer, maybe_print_slice

BATCH_SIZE = 16384
SDF_CUTOFF = 0.1


def main():
    config = parse_cli()
    steps = int(config.extras.get("steps", 2000))

    mesh = load_mesh(example_chair_path()).scaled_to_unit_sphere()
    points, sdf = sample_sdf_near_surface(mesh, 200000)
    sdf = np.clip(sdf, -SDF_CUTOFF, SDF_CUTOFF)
    points_j, sdf_j = jnp.asarray(points), jnp.asarray(sdf)

    net = SDFNet(latent_code_size=0)
    params = net.init(jax.random.PRNGKey(0))
    code = jnp.zeros(0)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, idx):
        def loss_fn(p):
            out = net.apply_grid(p, points_j[idx], code[None])[0]
            return jnp.mean(jnp.abs(out - sdf_j[idx]))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def step_chunk(params, opt_state, idx_chunk):
        def body(carry, idx):
            params, opt_state = carry
            params, opt_state, loss = step(params, opt_state, idx)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), idx_chunk)
        return params, opt_state, losses[-1]

    viewer = make_viewer(config.nogui)
    rng = np.random.default_rng(0)
    if viewer is None and not config.show_slice:
        # Headless fast path: 100-step scanned chunks — one dispatch per
        # chunk instead of a host round trip per step (2000 steps overfit
        # the chair in ~20 s on-chip; per-step dispatch through a remote
        # TPU link takes minutes).
        for i in range(0, steps, 100):
            k = min(100, steps - i)
            idx = jnp.asarray(rng.integers(0, len(points), (k, BATCH_SIZE)))
            params, opt_state, loss = step_chunk(params, opt_state, idx)
            print(f"step {i + k - 1}: loss {float(loss):.5f}")
        return
    for i in range(steps):
        idx = jnp.asarray(rng.integers(0, len(points), BATCH_SIZE))
        params, opt_state, loss = step(params, opt_state, idx)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.5f}")
            if viewer is not None:
                m = net.get_mesh(params, code, voxel_resolution=48)
                if m is not None:
                    viewer.set_mesh(m)
            if config.show_slice:
                maybe_print_slice(
                    net.get_voxels(params, code, voxel_resolution=32), True, scale=SDF_CUTOFF
                )
    if viewer is not None:
        viewer.stop()


if __name__ == "__main__":
    main()
