"""Hybrid WGAN: DeepSDF implicit generator + voxel critic with weight clipping.

Reference semantics (/root/reference/train_hybrid_wgan.py): critic (no
sigmoid, RMSprop lr 1e-5) updates every batch with the Wasserstein loss then
clips weights to ±0.01; generator (Adam lr 1e-5) updates every 5th batch with
``-mean(critic(fake))`` (the corrected loss noted at reference :110-113);
batch 8; raw clamped SDF data; saves every epoch including per-epoch
snapshots; CSV schema ``epoch time pred_fake pred_real``.
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
from shapegan_tpu.models.gan import Discriminator, clip_parameters
from shapegan_tpu.models.sdf_net import SDFNet
from shapegan_tpu.ops.coords import voxel_coordinates
from shapegan_tpu.parallel.mesh import get_mesh, replicated
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
from shapegan_tpu.train.hybrid_gan import generate_volumes, generate_volumes_inference

VOXEL_RESOLUTION = 32
BATCH_SIZE = 8
LEARN_RATE = 1e-5
CRITIC_UPDATES_PER_GENERATOR_UPDATE = 5
CRITIC_WEIGHT_LIMIT = 0.01

G_NAME = "hybrid_wgan_generator"
D_NAME = "hybrid_wgan_critic"
OPT_NAME = "hybrid_wgan_optimizer"


def make_steps(net: SDFNet, critic: Discriminator, g_tx, batch_size: int,
               resolution: int = VOXEL_RESOLUTION):
    grid = jnp.asarray(voxel_coordinates(resolution))

    @functools.partial(jax.jit, donate_argnums=(1,))
    def critic_step(g_params, d_state, batch, rng):
        z = jax.random.normal(rng, (batch.shape[0], LATENT_CODE_SIZE))
        fake = jax.lax.stop_gradient(
            generate_volumes_inference(net, g_params, grid, z, resolution)
        )

        def loss_fn(d_params):
            out_fake = critic.apply({"params": d_params}, fake)
            out_real = critic.apply({"params": d_params}, batch)
            return jnp.mean(out_fake) - jnp.mean(out_real), (
                jnp.mean(out_fake), jnp.mean(out_real),
            )

        (_, (pred_fake, pred_real)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_state.params
        )
        d_state = d_state.apply_gradients(grads=grads)
        d_state = d_state.replace(params=clip_parameters(d_state.params, CRITIC_WEIGHT_LIMIT))
        return d_state, {"pred_fake": pred_fake, "pred_real": pred_real}

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def generator_step(g_params, g_opt_state, d_params, rng):
        def loss_fn(g_params):
            z = jax.random.normal(rng, (batch_size, LATENT_CODE_SIZE))
            fake = generate_volumes(net, g_params, grid, z, resolution)
            out = critic.apply({"params": d_params}, fake)
            return -jnp.mean(out), (jnp.mean(out), fake)

        (_, (pred_fake, fake)), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        return optax.apply_updates(g_params, updates), g_opt_state, pred_fake, fake

    return critic_step, generator_step


def train(config: Optional[TrainConfig] = None):
    config = config or parse_cli()
    net = SDFNet()
    rng = jax.random.PRNGKey(config.seed)
    g_rng, d_rng = jax.random.split(rng)
    g_params = net.init(g_rng)
    g_tx = optax.adam(LEARN_RATE)  # reference uses Adam for G here (:53)
    critic = Discriminator(use_sigmoid=False)
    d_vars = critic.init(d_rng, jnp.zeros((2,) + (VOXEL_RESOLUTION,) * 3))
    d_state = train_state.TrainState.create(
        apply_fn=critic.apply, params=d_vars["params"], tx=optax.rmsprop(LEARN_RATE)
    )

    if config.resume:
        if checkpoints.exists(G_NAME, base=config.model_dir):
            g_params = checkpoints.load(g_params, G_NAME, base=config.model_dir)
        if checkpoints.exists(D_NAME, base=config.model_dir):
            d_state = d_state.replace(
                params=checkpoints.load(d_state.params, D_NAME, base=config.model_dir)
            )
    g_opt_state = g_tx.init(g_params)
    if config.resume and checkpoints.exists(OPT_NAME, base=config.model_dir):
        # Sidecar optimizer moments (the reference resets them on resume).
        restored = checkpoints.load(
            {"g": g_opt_state, "d": d_state.opt_state}, OPT_NAME, base=config.model_dir
        )
        g_opt_state = restored["g"]
        d_state = d_state.replace(opt_state=restored["d"])

    dataset = resolve_voxel_dataset(config, resolution=VOXEL_RESOLUTION, rescale_sdf=False)
    batch_size = effective_batch_size(config.batch_size or BATCH_SIZE, len(dataset))
    mesh = get_mesh(batch_size=batch_size)
    batches = make_voxel_batches(dataset, mesh, batch_size, config.seed, config.extras)

    g_params = jax.device_put(g_params, replicated(mesh))
    g_opt_state = jax.device_put(g_opt_state, replicated(mesh))
    d_state = jax.device_put(d_state, replicated(mesh))
    critic_step, generator_step = make_steps(net, critic, g_tx, batch_size)

    logger = CSVLogger(f"{config.plot_dir}/hybrid_wgan_training.csv", resume=config.resume)
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
                # Epoch-deterministic randomness for reproducible resume.
                rng = jax.random.fold_in(base_rng, epoch)
                batches.set_epoch(epoch)
                with EpochTimer() as timer:
                    for batch_index, batch in enumerate(batches):
                        rng, crng, grng = jax.random.split(rng, 3)
                        with profiler:
                            d_state, metrics = critic_step(
                                g_params, d_state, batch, crng
                            )
                            if batch_index % CRITIC_UPDATES_PER_GENERATOR_UPDATE == 0:
                                g_params, g_opt_state, pred_fake, fake = generator_step(
                                    g_params, g_opt_state, d_state.params, grng
                                )
                                history_fake.append(pred_fake)
                                history_real.append(metrics["pred_real"])
                                if batch_index % 20 == 0:
                                    if viewer is not None:
                                        viewer.set_voxels(jax.device_get(fake[0]))
                                    if config.show_slice:
                                        maybe_print_slice(fake[0], True, scale=SDF_CLIPPING)
                        if config.verbose and batch_index % 20 == 0:
                            print(
                                f"Epoch {epoch}, batch {batch_index}: "
                                f"prediction on fake samples: {history_fake.mean:.4f}, "
                                f"prediction on valid samples: {history_real.mean:.4f}"
                            )

                checkpoints.save(g_params, G_NAME, base=config.model_dir)
                checkpoints.save(d_state.params, D_NAME, base=config.model_dir)
                checkpoints.save(
                    {"g": g_opt_state, "d": d_state.opt_state}, OPT_NAME, base=config.model_dir
                )
                checkpoints.save(g_params, G_NAME, epoch=epoch, base=config.model_dir)
                checkpoints.save(d_state.params, D_NAME, epoch=epoch, base=config.model_dir)

                print(
                    f"Epoch {epoch} ({timer.duration:.1f}s, "
                    f"{profiler.mean_step_time * 1000:.1f} ms/step), "
                    f"prediction on fake: {history_fake.mean:.4f}, on real: {history_real.mean:.4f}"
                )
                logger.write(epoch, timer.duration, history_fake.mean, history_real.mean)
    except KeyboardInterrupt:
        pass
    if viewer is not None:
        viewer.stop()
    return g_params, d_state


if __name__ == "__main__":
    train()
