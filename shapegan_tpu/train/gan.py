"""Voxel GAN trainer.

Reference semantics (/root/reference/train_gan.py): non-saturating generator
loss ``-mean(log D(G(z)))`` with Adam lr 1e-3; discriminator BCE trained in
TWO separate optimizer steps per batch — first on a fresh fake batch toward
0, then on the real batch toward 1 — with Adam lr 1e-5; batch 64; save every
epoch + snapshot every 20; CSV schema ``epoch time pred_fake pred_real``.

TPU-native: the whole G-step + both D-steps are one jitted function (three
sequential optax updates inside a single XLA program), batch sharded on the
'data' axis.
"""

from __future__ import annotations

import functools
from itertools import count
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from shapegan_tpu import LATENT_CODE_SIZE, checkpoints
from shapegan_tpu.core.config import TrainConfig, parse_cli
from shapegan_tpu.models.gan import Discriminator, Generator
from shapegan_tpu.ops.losses import bce_loss
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

BATCH_SIZE = 64
GENERATOR_LR = 1e-3
DISCRIMINATOR_LR = 1e-5
SNAPSHOT_EVERY = 20


class GenState(train_state.TrainState):
    batch_stats: Any = None


def create_states(rng: jax.Array):
    g_rng, d_rng = jax.random.split(rng)
    generator = Generator()
    discriminator = Discriminator(use_sigmoid=True)
    z = jnp.zeros((2, LATENT_CODE_SIZE))
    g_vars = generator.init(g_rng, z, train=True)
    g_state = GenState.create(
        apply_fn=generator.apply,
        params=g_vars["params"],
        batch_stats=g_vars["batch_stats"],
        tx=optax.adam(GENERATOR_LR),
    )
    d_vars = discriminator.init(d_rng, jnp.zeros((2, 32, 32, 32)))
    d_state = train_state.TrainState.create(
        apply_fn=discriminator.apply, params=d_vars["params"], tx=optax.adam(DISCRIMINATOR_LR)
    )
    return generator, discriminator, g_state, d_state


def generate(generator, g_state: GenState, rng: jax.Array, sample_size: int, train: bool = True):
    """Sample z ~ N(0,1) and decode (reference Generator.generate,
    /root/reference/model/gan.py:31-34). Returns (voxels, new_batch_stats)."""
    z = jax.random.normal(rng, (sample_size, LATENT_CODE_SIZE))
    if train:
        voxels, updates = generator.apply(
            {"params": g_state.params, "batch_stats": g_state.batch_stats},
            z, train=True, mutable=["batch_stats"],
        )
        return voxels, updates["batch_stats"]
    voxels = generator.apply(
        {"params": g_state.params, "batch_stats": g_state.batch_stats}, z, train=False
    )
    return voxels, g_state.batch_stats


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def train_step(generator, discriminator, g_state: GenState, d_state, batch, rng):
    """Fused G-step + D-fake-step + D-real-step (one XLA program)."""
    g_rng, d_rng = jax.random.split(rng)
    batch_size = batch.shape[0]

    # --- generator update: -mean(log D(G(z)))
    def g_loss_fn(g_params):
        z = jax.random.normal(g_rng, (batch_size, LATENT_CODE_SIZE))
        fake, updates = generator.apply(
            {"params": g_params, "batch_stats": g_state.batch_stats},
            z, train=True, mutable=["batch_stats"],
        )
        d_out = discriminator.apply({"params": d_state.params}, fake)
        return -jnp.mean(jnp.log(jnp.clip(d_out, 1e-7, 1.0))), (fake, updates["batch_stats"])

    (_, (g_sample, new_stats)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_state.params)
    g_state = g_state.apply_gradients(grads=g_grads).replace(batch_stats=new_stats)

    # --- discriminator update on a fresh fake batch (toward 0)
    z = jax.random.normal(d_rng, (batch_size, LATENT_CODE_SIZE))
    fake, _ = generate_from(generator, g_state, z)
    fake = jax.lax.stop_gradient(fake)

    def d_fake_loss(d_params):
        out = discriminator.apply({"params": d_params}, fake)
        return bce_loss(out, jnp.zeros(batch_size)), out

    (_, pred_fake), d_grads = jax.value_and_grad(d_fake_loss, has_aux=True)(d_state.params)
    d_state = d_state.apply_gradients(grads=d_grads)

    # --- discriminator update on the real batch (toward 1), separate step
    def d_real_loss(d_params):
        out = discriminator.apply({"params": d_params}, batch)
        return bce_loss(out, jnp.ones(batch_size)), out

    (_, pred_real), d_grads = jax.value_and_grad(d_real_loss, has_aux=True)(d_state.params)
    d_state = d_state.apply_gradients(grads=d_grads)

    metrics = {"pred_fake": jnp.mean(pred_fake), "pred_real": jnp.mean(pred_real)}
    return g_state, d_state, metrics, g_sample


def generate_from(generator, g_state: GenState, z):
    return generator.apply(
        {"params": g_state.params, "batch_stats": g_state.batch_stats},
        z, train=True, mutable=["batch_stats"],
    )


def train(config: Optional[TrainConfig] = None):
    config = config or parse_cli()
    generator, discriminator, g_state, d_state = create_states(jax.random.PRNGKey(config.seed))

    g_name, d_name = "generator", "discriminator"
    if config.resume:
        g_state, d_state = restore(config, g_state, d_state, g_name, d_name)

    dataset = resolve_voxel_dataset(config, resolution=32)
    batch_size = effective_batch_size(config.batch_size or BATCH_SIZE, len(dataset))
    mesh = get_mesh(batch_size=batch_size)
    batches = make_voxel_batches(dataset, mesh, batch_size, config.seed, config.extras)

    g_state = jax.device_put(g_state, replicated(mesh))
    d_state = jax.device_put(d_state, replicated(mesh))

    logger = CSVLogger(f"{config.plot_dir}/gan_training.csv", resume=config.resume)
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
                    rng, step_rng = jax.random.split(rng)
                    with profiler:
                        g_state, d_state, metrics, sample = train_step(
                            generator, discriminator, g_state, d_state,
                            batch, step_rng,
                        )
                    history_fake.append(metrics["pred_fake"])
                    history_real.append(metrics["pred_real"])
                    if viewer is not None:
                        viewer.set_voxels(jax.device_get(sample[0]))
                    if config.verbose:
                        print(
                            f"Epoch {epoch}, batch {batch_index}: "
                            f"prediction on fake samples: {history_fake.mean:.4f}, "
                            f"prediction on valid samples: {history_real.mean:.4f}"
                        )

            # save_every=N (extras) thins the per-epoch latest-slot saves —
            # each save pulls params+optimizer state off the device, which a
            # flaky remote-TPU link turns into the run's dominant risk. The
            # default (1) is the reference's save-every-epoch semantics.
            save_every = int(config.extras.get("save_every", 1))
            if ((epoch + 1) % save_every == 0 or epoch % SNAPSHOT_EVERY == 0
                    or (config.epochs and epoch == config.epochs - 1)):
                save(config, g_state, d_state, g_name, d_name, epoch,
                     epoch % SNAPSHOT_EVERY == 0)
            if config.show_slice:
                rng, slice_rng = jax.random.split(rng)
                voxels, _ = generate(generator, g_state, slice_rng, 1, train=False)
                maybe_print_slice(voxels[0], True)
            print(
                f"Epoch {epoch} ({timer.duration:.1f}s, {profiler.mean_step_time * 1000:.1f} ms/step), "
                f"prediction on fake: {history_fake.mean:.4f}, on real: {history_real.mean:.4f}"
            )
            logger.write(epoch, timer.duration, history_fake.mean, history_real.mean)
    except KeyboardInterrupt:
        pass
    if viewer is not None:
        viewer.stop()
    return g_state, d_state


def save(config, g_state, d_state, g_name, d_name, epoch, snapshot):
    g_payload = {"params": g_state.params, "batch_stats": g_state.batch_stats,
                 "opt_state": g_state.opt_state, "epoch": epoch}
    d_payload = {"params": d_state.params, "opt_state": d_state.opt_state, "epoch": epoch}
    checkpoints.save(g_payload, g_name, base=config.model_dir)
    checkpoints.save(d_payload, d_name, base=config.model_dir)
    if snapshot:
        checkpoints.save(g_payload, g_name, epoch=epoch, base=config.model_dir)
        checkpoints.save(d_payload, d_name, epoch=epoch, base=config.model_dir)


def restore(config, g_state, d_state, g_name, d_name):
    if checkpoints.exists(g_name, base=config.model_dir):
        g = checkpoints.load(
            {"params": g_state.params, "batch_stats": g_state.batch_stats,
             "opt_state": g_state.opt_state, "epoch": 0}, g_name, base=config.model_dir)
        g_state = g_state.replace(params=g["params"], batch_stats=g["batch_stats"],
                                  opt_state=g["opt_state"])
    if checkpoints.exists(d_name, base=config.model_dir):
        d = checkpoints.load({"params": d_state.params, "opt_state": d_state.opt_state,
                              "epoch": 0}, d_name, base=config.model_dir)
        d_state = d_state.replace(params=d["params"], opt_state=d["opt_state"])
    return g_state, d_state


if __name__ == "__main__":
    train()
