"""Point-set SDF GAN trainer.

Reference semantics (/root/reference/train_point_gan.py): G = SDFGenerator
(batched implicit MLP), D = PointNet critic over (pos, dist) pairs; WGAN-GP
over SDF *values* at shared uniform positions (the gradient penalty
interpolates the distance channel only, :61-71); RMSprop lr 1e-4 both; G
updated every 5th step; point-count curriculum
(1024,b32,e300) → (2048) → (4096) → (8192,b24) → (16384,b12) → (32768,b6,e900)
(:31-38); argparse ``--category``.

TPU-native: one jitted D step (WGAN loss + nested-grad GP + RMSprop update)
and one jitted G step per curriculum stage; each stage is a fresh jit
specialization (static point count / batch size).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from shapegan_tpu import checkpoints
from shapegan_tpu.core.config import TrainConfig, parse_cli
from shapegan_tpu.data.datasets import BatchLoader, PointDataset
from shapegan_tpu.models.point_sdf_net import PointNet, SDFGenerator
from shapegan_tpu.ops.point_gen_pallas import generate_best
from shapegan_tpu.parallel.mesh import get_mesh, replicated, shard_batch
from shapegan_tpu.train.common import CSVLogger, EpochTimer, StepProfiler

LATENT_SIZE = 128
GRADIENT_PENALTY = 10.0
HIDDEN_SIZE = 256
NUM_LAYERS = 8
LEARN_RATE = 1e-4
GENERATOR_UPDATE_EVERY = 5
# Computation/activation dtype for the bandwidth-bound passes. At the
# curriculum workloads (e.g. 4096 pts × batch 32 = 131k rows × 256-512
# channels) every layer is HBM-bandwidth-bound on fp32 activation traffic,
# so bf16 activations with fp32 master weights are the autodecoder's
# master-weight scheme applied here (train/sdf_autodecoder.py
# COMPUTE_DTYPE). Where it is applied is chosen by measured grad fidelity
# (tests/test_train_point_gan.py::test_bf16_compute_grads_track_fp32):
#   * the critic runs bf16 everywhere (D-step grads track fp32 at
#     cosine 0.98 with the fake sample held fixed);
#   * the D-step's fake generation runs bf16 under stop_gradient (the
#     cloud is a GAN sample — bf16 perturbs it ~1e-2, which is sampling
#     noise, not gradient bias);
#   * the G step differentiates an fp32 generator through the bf16 critic
#     (cosine 0.98; an all-bf16 G step composes both backward errors and
#     measured 0.93 — too low for WGAN-GP's norm-sensitive training).
# LayerNorm statistics, the WGAN/GP losses and the gradient-penalty norms
# all stay fp32 (the models return fp32 logits/SDF values).
COMPUTE_DTYPE = jnp.bfloat16

# (num_points, batch_size, epochs) — reference :31-38
CURRICULUM = [
    (1024, 32, 300),
    (2048, 32, 300),
    (4096, 32, 300),
    (8192, 24, 300),
    (16384, 12, 300),
    (32768, 6, 900),
]

G_NAME = "point_gan_generator"
D_NAME = "point_gan_discriminator"
OPT_NAME = "point_gan_optimizer"


def create_models(seed: int = 0, dtype=COMPUTE_DTYPE):
    generator = SDFGenerator(
        latent_channels=LATENT_SIZE, hidden_channels=HIDDEN_SIZE, num_layers=NUM_LAYERS,
        norm=True, dtype=dtype,
    )
    discriminator = PointNet(out_channels=1, dtype=dtype)
    g_rng, d_rng = jax.random.split(jax.random.PRNGKey(seed))
    pos = jnp.zeros((2, 64, 3))
    g_params = generator.init(g_rng, pos, jnp.zeros((2, LATENT_SIZE)))["params"]
    d_params = discriminator.init(d_rng, pos, jnp.zeros((2, 64, 1)))["params"]
    return generator, discriminator, g_params, d_params


def make_steps(generator: SDFGenerator, discriminator: PointNet, g_tx, d_tx):
    # The G step differentiates the generator itself: run it fp32 there
    # (see the COMPUTE_DTYPE note; params are shared, dtype is compute-only).
    generator_g = generator.clone(dtype=jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def d_step(g_params, d_params, d_opt_state, u_pos, u_dist, rng):
        z_rng, gp_rng = jax.random.split(rng)
        z = jax.random.normal(z_rng, (u_pos.shape[0], LATENT_SIZE))
        # Forward-only fake generation through generate_best: XLA today —
        # a fused Pallas generator kernel was measured SLOWER than XLA's
        # fused matmul+LN+relu forward and rejected (ops/point_gen_pallas.py
        # module note). stop_gradient either way.
        fake = jax.lax.stop_gradient(generate_best(generator, g_params, u_pos, z))

        def loss_fn(d_params):
            critic = lambda dist: discriminator.apply({"params": d_params}, u_pos, dist)[..., 0]
            out_real = critic(u_dist)
            out_fake = critic(fake)
            d_loss = jnp.mean(out_fake) - jnp.mean(out_real)
            # GP interpolates the DISTANCE channel only (reference :61-71).
            alpha = jax.random.uniform(gp_rng, (u_pos.shape[0], 1, 1))
            interp = alpha * u_dist + (1.0 - alpha) * fake

            def summed(dist):
                return jnp.sum(critic(dist))

            grads = jax.grad(summed)(interp)
            norms = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2)) + 1e-12)
            gp = GRADIENT_PENALTY * jnp.mean((norms - 1.0) ** 2)
            return d_loss + gp, (d_loss, gp)

        (_, (d_loss, gp)), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
        return optax.apply_updates(d_params, updates), d_opt_state, d_loss, gp

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def g_step(g_params, g_opt_state, d_params, u_pos, rng):
        z = jax.random.normal(rng, (u_pos.shape[0], LATENT_SIZE))

        def loss_fn(g_params):
            fake = generator_g.apply({"params": g_params}, u_pos, z)
            out = discriminator.apply({"params": d_params}, u_pos, fake)[..., 0]
            return -jnp.mean(out)

        loss, grads = jax.value_and_grad(loss_fn)(g_params)
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        return optax.apply_updates(g_params, updates), g_opt_state, loss

    return d_step, g_step


def resolve_point_dataset(config: TrainConfig):
    import os

    if config.synthetic:
        from shapegan_tpu.data.synthetic import SyntheticPointDataset

        return SyntheticPointDataset(config.synthetic, seed=config.seed)
    return PointDataset.from_split(
        os.path.join(config.data_dir, config.category), "train", seed=config.seed
    )


def train(config: Optional[TrainConfig] = None, curriculum=None):
    config = config or parse_cli()
    generator, discriminator, g_params, d_params = create_models(config.seed)
    g_tx = optax.rmsprop(LEARN_RATE)
    d_tx = optax.rmsprop(LEARN_RATE)

    if config.resume:
        if checkpoints.exists(G_NAME, base=config.model_dir):
            g_params = checkpoints.load(g_params, G_NAME, base=config.model_dir)
        if checkpoints.exists(D_NAME, base=config.model_dir):
            d_params = checkpoints.load(d_params, D_NAME, base=config.model_dir)
    g_opt_state = g_tx.init(g_params)
    d_opt_state = d_tx.init(d_params)
    if config.resume and checkpoints.exists(OPT_NAME, base=config.model_dir):
        # Sidecar RMSprop moments (the reference resets them on resume).
        restored = checkpoints.load(
            {"g": g_opt_state, "d": d_opt_state}, OPT_NAME, base=config.model_dir
        )
        g_opt_state, d_opt_state = restored["g"], restored["d"]

    dataset = resolve_point_dataset(config)
    d_step, g_step = make_steps(generator, discriminator, g_tx, d_tx)

    logger = CSVLogger(f"{config.plot_dir}/point_gan_training.csv", resume=config.resume)
    profiler = StepProfiler()
    rng = jax.random.PRNGKey(config.seed + 1)
    num_steps = 0
    # Resume reproduces the uninterrupted run exactly: completed (stage,
    # epoch) lines in the CSV are fast-forwarded (num_steps advanced so the
    # fold_in rng stream continues where it left off), and every stochastic
    # draw — shuffle order, per-item subsample, per-step keys — is keyed by
    # the global epoch/step counter, never by process-lifetime state.
    completed_epochs = logger.first_epoch
    epoch_index = 0

    curriculum = curriculum or CURRICULUM
    for num_points, batch_size, stage_epochs in curriculum:
        if config.epochs:
            stage_epochs = min(stage_epochs, config.epochs)
        dataset.num_points = num_points
        loader = BatchLoader(
            dataset, batch_size, shuffle=True, drop_remainder=True, seed=config.seed
        )
        if len(loader) == 0:
            print(
                f"skipping curriculum stage ({num_points} pts, batch {batch_size}): "
                f"dataset has only {len(dataset)} shapes"
            )
            continue
        # Per-stage data mesh: the curriculum's batch sizes vary (32/24/12/6),
        # so each stage gets the largest data axis that divides ITS batch
        # (get_mesh shrinks via gcd). Params/moments are replicated, so the
        # stage transition is just a device_put; each stage is a fresh jit
        # specialization anyway (static point count / batch size).
        mesh = get_mesh(batch_size=batch_size)
        g_params, d_params, g_opt_state, d_opt_state = jax.device_put(
            (g_params, d_params, g_opt_state, d_opt_state), replicated(mesh)
        )
        with mesh:
            for epoch in range(1, stage_epochs + 1):
                epoch_index += 1
                if epoch_index <= completed_epochs:
                    num_steps += len(loader)
                    continue
                loader.set_epoch(epoch_index)
                total_loss = 0.0
                count = 0
                with EpochTimer() as timer:
                    for uniform, _surface in loader:
                        num_steps += 1
                        batch = shard_batch(mesh, uniform.astype(np.float32))
                        u_pos, u_dist = batch[..., :3], batch[..., 3:]
                        drng, grng = jax.random.split(jax.random.fold_in(rng, num_steps))
                        with profiler:
                            d_params, d_opt_state, d_loss, gp = d_step(
                                g_params, d_params, d_opt_state, u_pos, u_dist, drng
                            )
                            if num_steps % GENERATOR_UPDATE_EVERY == 0:
                                g_params, g_opt_state, _ = g_step(
                                    g_params, g_opt_state, d_params, u_pos, grng
                                )
                        total_loss += abs(float(d_loss))
                        count += 1

                mean_loss = total_loss / max(count, 1)
                print(
                    f"Num points: {num_points}, Epoch: {epoch:03d}, "
                    f"Loss: {mean_loss:.6f} ({profiler.mean_step_time * 1000:.1f} ms/step)"
                )
                logger.write(num_points, epoch, timer.duration, mean_loss)
                checkpoints.save(g_params, G_NAME, base=config.model_dir)
                checkpoints.save(d_params, D_NAME, base=config.model_dir)
                checkpoints.save(
                    {"g": g_opt_state, "d": d_opt_state}, OPT_NAME, base=config.model_dir
                )
    return g_params, d_params


if __name__ == "__main__":
    train()
