"""Voxel WGAN trainer (weight clipping).

Reference semantics (/root/reference/train_wgan.py): RMSprop lr 5e-5 for both
networks; the critic (no sigmoid) updates every batch with the Wasserstein
loss ``mean(D(fake)) - mean(D(real))`` followed by weight clipping to ±0.01;
the generator updates every 5th batch with ``-mean(D(fake))``; batch 64;
histories recorded on generator updates; save every epoch + snapshot every 20.
"""

from __future__ import annotations

import functools
from itertools import count
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from shapegan_tpu import LATENT_CODE_SIZE
from shapegan_tpu.core.config import TrainConfig, parse_cli
from shapegan_tpu.models.gan import Discriminator, Generator, clip_parameters
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
from shapegan_tpu.train.gan import GenState, generate, save, restore

LEARN_RATE = 5e-5
BATCH_SIZE = 64
CRITIC_UPDATES_PER_GENERATOR_UPDATE = 5
CRITIC_WEIGHT_LIMIT = 0.01
SNAPSHOT_EVERY = 20


def create_states(rng: jax.Array):
    g_rng, d_rng = jax.random.split(rng)
    generator = Generator()
    critic = Discriminator(use_sigmoid=False)
    g_vars = generator.init(g_rng, jnp.zeros((2, LATENT_CODE_SIZE)), train=True)
    g_state = GenState.create(
        apply_fn=generator.apply, params=g_vars["params"], batch_stats=g_vars["batch_stats"],
        tx=optax.rmsprop(LEARN_RATE),
    )
    d_vars = critic.init(d_rng, jnp.zeros((2, 32, 32, 32)))
    d_state = train_state.TrainState.create(
        apply_fn=critic.apply, params=d_vars["params"], tx=optax.rmsprop(LEARN_RATE)
    )
    return generator, critic, g_state, d_state


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(3,))
def critic_step(generator, critic, g_state: GenState, d_state, batch, rng):
    """Wasserstein critic update + weight clip (every batch)."""
    batch_size = batch.shape[0]
    z = jax.random.normal(rng, (batch_size, LATENT_CODE_SIZE))
    fake, _ = generator.apply(
        {"params": g_state.params, "batch_stats": g_state.batch_stats},
        z, train=True, mutable=["batch_stats"],
    )
    fake = jax.lax.stop_gradient(fake)

    def loss_fn(d_params):
        out_fake = critic.apply({"params": d_params}, fake)
        out_real = critic.apply({"params": d_params}, batch)
        return jnp.mean(out_fake) - jnp.mean(out_real), (jnp.mean(out_fake), jnp.mean(out_real))

    (_, (pred_fake, pred_real)), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_state.params)
    d_state = d_state.apply_gradients(grads=grads)
    d_state = d_state.replace(params=clip_parameters(d_state.params, CRITIC_WEIGHT_LIMIT))
    return d_state, {"pred_fake": pred_fake, "pred_real": pred_real}


@functools.partial(jax.jit, static_argnums=(0, 1, 4), donate_argnums=(2,))
def generator_step(generator, critic, g_state: GenState, d_state, batch_size: int, rng):
    """Generator update: -mean(critic(G(z))) (every 5th batch)."""

    def loss_fn(g_params):
        z = jax.random.normal(rng, (batch_size, LATENT_CODE_SIZE))
        fake, updates = generator.apply(
            {"params": g_params, "batch_stats": g_state.batch_stats},
            z, train=True, mutable=["batch_stats"],
        )
        out = critic.apply({"params": d_state.params}, fake)
        return -jnp.mean(out), (jnp.mean(out), fake, updates["batch_stats"])

    (_, (pred_fake, sample, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        g_state.params
    )
    g_state = g_state.apply_gradients(grads=grads).replace(batch_stats=new_stats)
    return g_state, pred_fake, sample


def train(config: Optional[TrainConfig] = None):
    config = config or parse_cli()
    generator, critic, g_state, d_state = create_states(jax.random.PRNGKey(config.seed))

    g_name, d_name = "wgan-generator", "wgan-critic"
    if config.resume:
        g_state, d_state = restore(config, g_state, d_state, g_name, d_name)

    dataset = resolve_voxel_dataset(config, resolution=32)
    batch_size = effective_batch_size(config.batch_size or BATCH_SIZE, len(dataset))
    mesh = get_mesh(batch_size=batch_size)
    batches = make_voxel_batches(dataset, mesh, batch_size, config.seed, config.extras)

    g_state = jax.device_put(g_state, replicated(mesh))
    d_state = jax.device_put(d_state, replicated(mesh))

    logger = CSVLogger(f"{config.plot_dir}/wgan_training.csv", resume=config.resume)
    viewer = make_viewer(config.nogui)
    history_fake, history_real = RollingHistory(), RollingHistory()
    profiler = StepProfiler()
    base_rng = jax.random.PRNGKey(config.seed + 1)

    first_epoch = logger.first_epoch
    epochs = (
        range(first_epoch, config.epochs) if config.epochs else count(first_epoch)
        # epochs=N is the TOTAL epoch count (train until epoch N), matching the
        # reference's progressive-trainer semantics and every other trainer here;
        # a completed run resumed with the same N trains zero further epochs.
    )
    try:
        for epoch in epochs:
            # Epoch-deterministic randomness for reproducible resume.
            rng = jax.random.fold_in(base_rng, epoch)
            batches.set_epoch(epoch)
            with EpochTimer() as timer:
                for batch_index, batch in enumerate(batches):
                    rng, crng, grng = jax.random.split(rng, 3)
                    with profiler:
                        d_state, metrics = critic_step(
                            generator, critic, g_state, d_state, batch, crng
                        )
                        if batch_index % CRITIC_UPDATES_PER_GENERATOR_UPDATE == 0:
                            g_state, pred_fake, sample = generator_step(
                                generator, critic, g_state, d_state, batch.shape[0], grng
                            )
                            history_fake.append(pred_fake)
                            history_real.append(metrics["pred_real"])
                            if viewer is not None:
                                viewer.set_voxels(jax.device_get(sample[0]))
                            if config.verbose:
                                print(
                                    f"epoch {epoch}, batch {batch_index}: "
                                    f"fake value: {history_fake.mean:.1f}, "
                                    f"valid value: {history_real.mean:.1f}"
                                )

            save(config, g_state, d_state, g_name, d_name, epoch, epoch % SNAPSHOT_EVERY == 0)
            if config.show_slice:
                rng, srng = jax.random.split(rng)
                voxels, _ = generate(generator, g_state, srng, 1, train=False)
                maybe_print_slice(voxels[0], True)
            print(
                f"Epoch {epoch} ({timer.duration:.1f}s, {profiler.mean_step_time * 1000:.1f} ms/step), "
                f"critic values: {history_fake.mean:.2f}, {history_real.mean:.2f}"
            )
            logger.write(epoch, timer.duration, history_fake.mean, history_real.mean)
    except KeyboardInterrupt:
        pass
    if viewer is not None:
        viewer.stop()
    return g_state, d_state


if __name__ == "__main__":
    train()
