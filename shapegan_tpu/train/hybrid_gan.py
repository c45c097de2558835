"""Hybrid GAN: DeepSDF implicit generator + 3D-CNN voxel discriminator.

Reference semantics (/root/reference/train_hybrid_gan.py): the generator is
evaluated densely on the 32^3 grid and the volume is fed to the voxel
discriminator; G (Adam lr 1e-3) updates every batch with -mean(log D(fake));
D (Adam lr 1e-5) takes two separate BCE steps (fake→0, real→1); batch 8;
RAW (unrescaled) SDF data clamped to ±0.1 (``rescale_sdf=False``, :57);
divergence guard aborts when |pred_fake − pred_real| > 0.1 over the rolling
window (:136-138); saves every epoch INCLUDING per-epoch snapshots.

TPU-native: the dense grid evaluation uses the fused latent-projection MLP
([B, P] without any latent repeat — the reference materializes
``latent.repeat(1,1,32^3)`` at :63-66); the [B, P] activation carries a
('data', 'points') sharding constraint so the point axis shards across the
mesh and XLA all-gathers only at the voxel reshape before the discriminator.
"""

from __future__ import annotations

import functools
from itertools import count
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from shapegan_tpu import LATENT_CODE_SIZE, SDF_CLIPPING, checkpoints
from shapegan_tpu.core.config import TrainConfig, parse_cli
from shapegan_tpu.models.gan import Discriminator
from shapegan_tpu.models.sdf_net import SDFNet
from shapegan_tpu.ops.coords import voxel_coordinates
from shapegan_tpu.ops.losses import bce_loss
from shapegan_tpu.parallel.mesh import (
    DATA_AXIS,
    POINTS_AXIS,
    constrain,
    get_mesh,
    replicated,
)
from shapegan_tpu.train.common import (
    CSVLogger,
    EpochTimer,
    RollingHistory,
    StepProfiler,
    effective_batch_size,
    make_viewer,
    make_voxel_batches,
    maybe_print_slice,
    resolve_voxel_dataset,
)

VOXEL_RESOLUTION = 32
BATCH_SIZE = 8
GENERATOR_LR = 1e-3
DISCRIMINATOR_LR = 1e-5
DIVERGENCE_LIMIT = 0.1

G_NAME = "hybrid_gan_generator"
D_NAME = "hybrid_gan_discriminator"
OPT_NAME = "hybrid_gan_optimizer"


def _shardable_mesh(grid_points, latent_codes):
    """The ambient multi-device mesh if the workload divides onto it: the
    Pallas kernel is opaque to XLA's SPMD partitioner, so any multi-device
    run must route the grid evaluation through shard_map explicitly
    (point axis over 'points', shape batch over 'data')."""
    from shapegan_tpu.parallel.mesh import ambient_mesh

    mesh = ambient_mesh()
    if (
        mesh is not None
        and mesh.size > 1
        and grid_points.shape[0] % mesh.shape[POINTS_AXIS] == 0
        and latent_codes.shape[0] % mesh.shape[DATA_AXIS] == 0
    ):
        return mesh
    return None


def generate_volumes(net: SDFNet, params, grid_points, latent_codes, resolution: int):
    """Latents [B, L] → SDF volumes [B, res, res, res] via the grid MLP,
    point axis sharded over the mesh until the reshape. Used inside generator
    losses, which need grads through it.

    Multi-device: shard_map around the fused kernel (point axis over
    'points', batch over 'data'; shard_map's transpose inserts the param-grad
    psums). Single-device TPU: the fused custom-VJP Pallas kernel directly.
    Grids at 32^3+ off-TPU go through the chunked-remat path: a plain
    backward at 64^3 x batch 16 stores ~20 GB of activations (doesn't fit)."""
    from shapegan_tpu.ops import sdf_mlp
    from shapegan_tpu.ops.sdf_mlp_pallas import apply_grid_sharded, apply_grid_trainable

    n_points = grid_points.shape[0]
    mesh = _shardable_mesh(grid_points, latent_codes)
    if mesh is not None:
        flat = apply_grid_sharded(params, grid_points, latent_codes, mesh, trainable=True)
    elif jax.default_backend() == "tpu":
        # Fused Pallas forward + backward (custom VJP): 66 ms fwd+bwd at the
        # flagship 16x64^3 workload vs 208 ms for chunked-remat XLA bf16.
        flat = apply_grid_trainable(params, grid_points, latent_codes)
    elif n_points * latent_codes.shape[0] > 2**18:
        # Large grids off-TPU: chunked remat bounds activation memory.
        flat = sdf_mlp.apply_grid_remat(params, grid_points, latent_codes,
                                        chunk_size=min(n_points, 16384))
    else:
        flat = net.apply_grid(params, grid_points, latent_codes)  # [B, P]
    flat = constrain(flat, DATA_AXIS, POINTS_AXIS)
    return flat.reshape(-1, resolution, resolution, resolution)


def generate_volumes_inference(net: SDFNet, params, grid_points, latent_codes, resolution: int):
    """Forward-only volume generation: on TPU this dispatches to the fused
    Pallas kernel (ops/sdf_mlp_pallas.py) — used for the discriminator steps'
    fake samples (stop-gradient w.r.t. the generator) and eval paths. On a
    multi-device mesh the kernel runs per-shard under shard_map."""
    from shapegan_tpu.ops.sdf_mlp_pallas import apply_grid_best, apply_grid_sharded

    mesh = _shardable_mesh(grid_points, latent_codes)
    if mesh is not None:
        flat = apply_grid_sharded(params, grid_points, latent_codes, mesh)
    else:
        flat = apply_grid_best(params, grid_points, latent_codes)
    flat = constrain(flat, DATA_AXIS, POINTS_AXIS)
    return flat.reshape(-1, resolution, resolution, resolution)


def create_states(rng: jax.Array, g_lr: float = GENERATOR_LR, d_lr: float = DISCRIMINATOR_LR,
                  use_sigmoid: bool = True):
    net = SDFNet()
    g_rng, d_rng = jax.random.split(rng)
    params = net.init(g_rng)
    g_tx = optax.adam(g_lr)
    discriminator = Discriminator(use_sigmoid=use_sigmoid)
    d_vars = discriminator.init(d_rng, jnp.zeros((2,) + (VOXEL_RESOLUTION,) * 3))
    d_state = train_state.TrainState.create(
        apply_fn=discriminator.apply, params=d_vars["params"], tx=optax.adam(d_lr)
    )
    return net, discriminator, params, g_tx, d_state


def make_steps(net: SDFNet, discriminator: Discriminator, g_tx, batch_size: int = BATCH_SIZE,
               resolution: int = VOXEL_RESOLUTION):
    grid = jnp.asarray(voxel_coordinates(resolution))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def g_step(g_params, g_opt_state, d_params, rng):
        def loss_fn(g_params):
            z = jax.random.normal(rng, (batch_size, LATENT_CODE_SIZE))
            fake = generate_volumes(net, g_params, grid, z, resolution)
            d_out = discriminator.apply({"params": d_params}, fake)
            return -jnp.mean(jnp.log(jnp.clip(d_out, 1e-7, 1.0))), fake

        (_, fake), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        return optax.apply_updates(g_params, updates), g_opt_state, fake

    @functools.partial(jax.jit, donate_argnums=(1,))
    def d_step(g_params, d_state, batch, rng):
        batch_size = batch.shape[0]
        z = jax.random.normal(rng, (batch_size, LATENT_CODE_SIZE))
        fake = jax.lax.stop_gradient(
            generate_volumes_inference(net, g_params, grid, z, resolution)
        )

        def fake_loss(d_params):
            out = discriminator.apply({"params": d_params}, fake)
            return bce_loss(out, jnp.zeros(batch_size)), out

        (_, pred_fake), grads = jax.value_and_grad(fake_loss, has_aux=True)(d_state.params)
        d_state = d_state.apply_gradients(grads=grads)

        def real_loss(d_params):
            out = discriminator.apply({"params": d_params}, batch)
            return bce_loss(out, jnp.ones(batch_size)), out

        (_, pred_real), grads = jax.value_and_grad(real_loss, has_aux=True)(d_state.params)
        d_state = d_state.apply_gradients(grads=grads)
        return d_state, {"pred_fake": jnp.mean(pred_fake), "pred_real": jnp.mean(pred_real)}

    return g_step, d_step


def train(config: Optional[TrainConfig] = None):
    config = config or parse_cli()
    net, discriminator, g_params, g_tx, d_state = create_states(jax.random.PRNGKey(config.seed))
    g_opt_state = g_tx.init(g_params)

    if config.resume:
        if checkpoints.exists(G_NAME, base=config.model_dir):
            g_params = checkpoints.load(g_params, G_NAME, base=config.model_dir)
        if checkpoints.exists(D_NAME, base=config.model_dir):
            d_state = d_state.replace(
                params=checkpoints.load(d_state.params, D_NAME, base=config.model_dir)
            )
        # Optimizer moments live in a sidecar artifact so the param files
        # keep the reference's bare layout (the reference silently resets
        # Adam moments on resume — SURVEY.md §5; we restore them).
        if checkpoints.exists(OPT_NAME, base=config.model_dir):
            restored = checkpoints.load(
                {"g": g_opt_state, "d": d_state.opt_state}, OPT_NAME, base=config.model_dir
            )
            g_opt_state = restored["g"]
            d_state = d_state.replace(opt_state=restored["d"])

    # RAW SDF values: clamp but do not rescale (reference :57)
    dataset = resolve_voxel_dataset(config, resolution=VOXEL_RESOLUTION, rescale_sdf=False)
    batch_size = effective_batch_size(config.batch_size or BATCH_SIZE, len(dataset))
    mesh = get_mesh(batch_size=batch_size)
    batches = make_voxel_batches(dataset, mesh, batch_size, config.seed, config.extras)

    g_params = jax.device_put(g_params, replicated(mesh))
    d_state = jax.device_put(d_state, replicated(mesh))
    g_opt_state = jax.device_put(g_opt_state, replicated(mesh))
    g_step, d_step = make_steps(net, discriminator, g_tx, batch_size=batch_size)

    logger = CSVLogger(f"{config.plot_dir}/hybrid_gan_training.csv", resume=config.resume)
    first_epoch = logger.first_epoch
    viewer = make_viewer(config.nogui)
    history_fake, history_real = RollingHistory(), RollingHistory()
    profiler = StepProfiler()
    base_rng = jax.random.PRNGKey(config.seed + 1)

    epochs = (
        range(first_epoch, config.epochs) if config.epochs else count(first_epoch)
        # epochs=N is the TOTAL epoch count (train until epoch N), matching the
        # reference's progressive-trainer semantics and every other trainer here;
        # a completed run resumed with the same N trains zero further epochs.
    )
    try:
        with mesh:
            for epoch in epochs:
                # Epoch-deterministic randomness: resume at epoch N replays
                # the uninterrupted run's exact latent draws + batch order.
                rng = jax.random.fold_in(base_rng, epoch)
                batches.set_epoch(epoch)
                with EpochTimer() as timer:
                    for batch_index, batch in enumerate(batches):
                        rng, grng, drng = jax.random.split(rng, 3)
                        with profiler:
                            g_params, g_opt_state, fake = g_step(
                                g_params, g_opt_state, d_state.params, grng
                            )
                            d_state, metrics = d_step(
                                g_params, d_state, batch, drng
                            )
                        history_fake.append(metrics["pred_fake"])
                        history_real.append(metrics["pred_real"])
                        if batch_index % 20 == 0:
                            if viewer is not None:
                                viewer.set_voxels(jax.device_get(fake[0]))
                            if config.show_slice:
                                maybe_print_slice(fake[0], True, scale=SDF_CLIPPING)
                        if config.verbose:
                            print(
                                f"Epoch {epoch}, batch {batch_index}: "
                                f"prediction on fake samples: {history_fake.mean:.4f}, "
                                f"prediction on valid samples: {history_real.mean:.4f}"
                            )

                print(
                    f"Epoch {epoch} ({timer.duration:.1f}s, "
                    f"{profiler.mean_step_time * 1000:.1f} ms/step), "
                    f"prediction on fake: {history_fake.mean:.4f}, on real: {history_real.mean:.4f}"
                )

                if abs(history_fake.mean - history_real.mean) > DIVERGENCE_LIMIT:
                    print("Network diverged.")  # reference guard (:136-138)
                    break

                checkpoints.save(g_params, G_NAME, base=config.model_dir)
                checkpoints.save(d_state.params, D_NAME, base=config.model_dir)
                checkpoints.save(
                    {"g": g_opt_state, "d": d_state.opt_state}, OPT_NAME, base=config.model_dir
                )
                checkpoints.save(g_params, G_NAME, epoch=epoch, base=config.model_dir)
                checkpoints.save(d_state.params, D_NAME, epoch=epoch, base=config.model_dir)
                logger.write(epoch, timer.duration, history_fake.mean, history_real.mean)
    except KeyboardInterrupt:
        pass
    if viewer is not None:
        viewer.stop()
    return g_params, d_state


if __name__ == "__main__":
    train()
