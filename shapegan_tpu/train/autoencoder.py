"""(Variational) autoencoder trainer — BASELINE.json config 1.

Reference semantics (/root/reference/train_autoencoder.py): Adam lr 5e-5,
batch 32, sign-weighted L1 reconstruction (+KLD for the VAE), save every
epoch + snapshot every 20 epochs, ``classic`` flag switches AE/VAE, live
viewer / ASCII slice hooks, no stopping criterion unless ``epochs=N``.

TPU-native: the whole optimization step (forward, both losses, backward,
Adam update, BN stat update) is one jitted function over a batch sharded
along the 'data' mesh axis; gradient reduction is an XLA psum over ICI.
"""

from __future__ import annotations

import functools
from itertools import count
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from shapegan_tpu import checkpoints
from shapegan_tpu.core.config import TrainConfig, parse_cli
from shapegan_tpu.models.autoencoder import Autoencoder
from shapegan_tpu.ops.losses import kld_loss, sdf_reconstruction_loss, voxel_sign_difference
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

BATCH_SIZE = 32
LEARNING_RATE = 5e-5
SNAPSHOT_EVERY = 20
VIEWER_UPDATE_STEP = 20


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_state(model: Autoencoder, rng: jax.Array) -> TrainState:
    dummy = jnp.zeros((2, 32, 32, 32), dtype=jnp.float32)
    variables = model.init({"params": rng, "reparam": rng}, dummy, train=True)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=optax.adam(LEARNING_RATE),
    )


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def train_step(model: Autoencoder, state: TrainState, batch: jax.Array, rng: jax.Array):
    """One fused optimization step; returns (state, metrics, reconstruction)."""

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        if model.is_variational:
            (output, mean, log_variance), updates = state.apply_fn(
                variables, batch, train=True, rngs={"reparam": rng}, mutable=["batch_stats"]
            )
            kld = kld_loss(mean, log_variance)
        else:
            output, updates = state.apply_fn(
                variables, batch, train=True, mutable=["batch_stats"]
            )
            kld = jnp.float32(0.0)
        recon = sdf_reconstruction_loss(output, batch)
        return recon + kld, (recon, kld, output, updates["batch_stats"])

    (_, (recon, kld, output, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_stats)
    metrics = {
        "reconstruction_loss": recon,
        "kld_loss": kld,
        "voxel_diff": voxel_sign_difference(output, batch),
    }
    return state, metrics, output


def train(config: Optional[TrainConfig] = None) -> TrainState:
    config = config or parse_cli()
    is_variational = not config.classic
    model = Autoencoder(is_variational=is_variational)
    name = model.checkpoint_name

    dataset = resolve_voxel_dataset(config, resolution=32)
    batch_size = effective_batch_size(config.batch_size or BATCH_SIZE, len(dataset))
    mesh = get_mesh(batch_size=batch_size)
    batches = make_voxel_batches(dataset, mesh, batch_size, config.seed, config.extras)

    rng = jax.random.PRNGKey(config.seed)
    state = create_state(model, rng)
    first_epoch = 0
    if config.resume and checkpoints.exists(name, base=config.model_dir):
        restored = checkpoints.load(
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "epoch": 0},
            name, base=config.model_dir,
        )
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        first_epoch = int(restored["epoch"]) + 1

    state = jax.device_put(state, replicated(mesh))

    logger = CSVLogger(
        f"{config.plot_dir}/{'variational_' if is_variational else ''}autoencoder_training.csv",
        resume=config.resume,
    )
    viewer = make_viewer(config.nogui)
    recon_history = RollingHistory(batch_size)
    kld_history = RollingHistory(batch_size)
    profiler = StepProfiler()

    base_rng = rng
    epochs = range(first_epoch, config.epochs) if config.epochs else count(first_epoch)
    try:
        for epoch in epochs:
            # Epoch-deterministic randomness for reproducible resume.
            rng = jax.random.fold_in(base_rng, epoch)
            batches.set_epoch(epoch)
            with EpochTimer() as timer:
                for batch_index, batch in enumerate(batches):
                    rng, step_rng = jax.random.split(rng)
                    with profiler:
                        state, metrics, output = train_step(
                            model, state, batch, step_rng
                        )
                    recon_history.append(metrics["reconstruction_loss"])
                    kld_history.append(metrics["kld_loss"])
                    if viewer is not None and (
                        batch_index == 0
                        or ((batch_index + 1) % VIEWER_UPDATE_STEP == 0 and config.verbose)
                    ):
                        viewer.set_voxels(jax.device_get(output[0]))
                    if config.verbose and (batch_index + 1) % VIEWER_UPDATE_STEP == 0:
                        print(
                            f"epoch {epoch}, batch {batch_index}, "
                            f"reconstruction loss: {float(metrics['reconstruction_loss']):.4f} "
                            f"(average: {recon_history.mean:.4f}), "
                            f"KLD loss: {kld_history.mean:.4f}"
                        )

            save_payload = {
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "epoch": epoch,
            }
            checkpoints.save(save_payload, name, base=config.model_dir)
            if epoch % SNAPSHOT_EVERY == 0:
                checkpoints.save(save_payload, name, epoch=epoch, base=config.model_dir)

            if config.show_slice:
                maybe_print_slice(output[0], True)
            print(
                f"Epoch {epoch} ({timer.duration:.1f}s, {profiler.mean_step_time * 1000:.1f} ms/step): "
                f"reconstruction loss: {recon_history.mean:.4f}, KLD loss: {kld_history.mean:.4f}"
            )
            logger.write(epoch, timer.duration, recon_history.mean, kld_history.mean,
                         float(metrics["voxel_diff"]))
    except KeyboardInterrupt:
        if viewer is not None:
            viewer.stop()
        return state
    if viewer is not None:
        viewer.stop()
    return state


if __name__ == "__main__":
    train()
