"""Point-GAN refinement stage (surface-aware second stage).

Reference semantics (/root/reference/train_point_gan_ref.py):
  * ``RefinementGenerator``: evaluate uniform SDF, compute the autograd
    spatial gradient of the generator output, project points to the surface
    (``s_pos = u_pos - u_dist * grad``), jitter by 0.0025, re-evaluate (:54-70).
  * Mixed batches: all near-surface points (|sdf| < 0.1) plus a 15% random
    keep of uniform points; the critic pools over the union (:31-51). The
    reference builds ragged tensors with a batch vector + scatter_max; we
    keep static shapes and pass **masks** to the PointNet max-pool — the
    TPU-native equivalent.
  * Same WGAN-GP (GP on the uniform distance channel), G every 5th step,
    RMSprop lr 1e-4, curriculum (8192,b16,e60) → (16384,b8,e60) (:80-83).
  * The reference leaves stage-1 loading as a TODO (:73-75); we implement it:
    G and D warm-start from the point-GAN checkpoints when present.
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
from shapegan_tpu.data.datasets import BatchLoader
from shapegan_tpu.models.point_sdf_net import PointNet, SDFGenerator
from shapegan_tpu.parallel.mesh import get_mesh, replicated, shard_batch
from shapegan_tpu.train.common import CSVLogger, EpochTimer, StepProfiler
from shapegan_tpu.train.point_gan import (
    G_NAME as STAGE1_G_NAME,
    D_NAME as STAGE1_D_NAME,
    GRADIENT_PENALTY,
    LATENT_SIZE,
    LEARN_RATE,
    create_models,
    resolve_point_dataset,
)

THRESHOLD = 0.1
RANDOM_KEEP = 0.15
JITTER = 0.0025
GENERATOR_UPDATE_EVERY = 5

CURRICULUM = [
    (8192, 16, 60),
    (16384, 8, 60),
]

G_NAME = "point_gan_ref_generator"
D_NAME = "point_gan_ref_discriminator"
OPT_NAME = "point_gan_ref_optimizer"


def refine(generator: SDFGenerator, g_params, u_pos, z, rng):
    """The RefinementGenerator forward (reference :54-70): project uniform
    points to the surface along the generator's own spatial gradient (not
    normalized, exactly as the reference), jitter, and re-evaluate."""

    def summed(pos):
        return jnp.sum(generator.apply({"params": g_params}, pos, z))

    u_dist = generator.apply({"params": g_params}, u_pos, z)
    grad = jax.grad(summed)(u_pos)  # [B, N, 3]
    s_pos = u_pos - u_dist * grad
    s_pos = s_pos + JITTER * jax.random.normal(rng, s_pos.shape)
    s_dist = generator.apply({"params": g_params}, s_pos, z)
    return u_pos, u_dist, s_pos, s_dist


def mixed_batch(u_pos, u_dist, s_pos, s_dist, rng):
    """Masked union of (15%-kept + near-surface uniform points) and
    near-surface surface points (reference generate_batch :31-51), with
    static shapes: [B, 2N, ...] plus a validity mask [B, 2N]."""
    near = jnp.abs(u_dist[..., 0]) < THRESHOLD
    keep = jax.random.uniform(rng, near.shape) < RANDOM_KEEP
    uniform_mask = near | keep
    pos = jnp.concatenate([u_pos, s_pos], axis=1)
    dist = jnp.concatenate([u_dist, s_dist], axis=1)
    mask = jnp.concatenate([uniform_mask, near], axis=1)
    return pos, dist, mask


def make_steps(generator: SDFGenerator, discriminator: PointNet, g_tx, d_tx):
    # Same mixed-precision split as stage 1 (train/point_gan.py
    # COMPUTE_DTYPE note): the D step's refined fake is a stop-gradient
    # sample (bf16 position noise ~0.004 is below the 0.0025-jitter scale
    # it already carries), but the G step differentiates refine() — a
    # double grad through the generator — so it runs the generator fp32.
    generator_g = generator.clone(dtype=jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def d_step(g_params, d_params, d_opt_state, u_pos, u_dist, s_pos, s_dist, rng):
        z_rng, ref_rng, mix_rng1, mix_rng2, gp_rng = jax.random.split(rng, 5)
        z = jax.random.normal(z_rng, (u_pos.shape[0], LATENT_SIZE))
        fake = refine(generator, g_params, u_pos, z, ref_rng)
        fake = jax.tree.map(jax.lax.stop_gradient, fake)
        fake_pos, fake_dist, fake_mask = mixed_batch(*fake, mix_rng1)
        real_pos, real_dist, real_mask = mixed_batch(u_pos, u_dist, s_pos, s_dist, mix_rng2)
        fake_u_dist = fake[1]

        def loss_fn(d_params):
            out_real = discriminator.apply(
                {"params": d_params}, real_pos, real_dist, mask=real_mask
            )[..., 0]
            out_fake = discriminator.apply(
                {"params": d_params}, fake_pos, fake_dist, mask=fake_mask
            )[..., 0]
            d_loss = jnp.mean(out_fake) - jnp.mean(out_real)

            critic = lambda dist: discriminator.apply({"params": d_params}, u_pos, dist)[..., 0]
            alpha = jax.random.uniform(gp_rng, (u_pos.shape[0], 1, 1))
            interp = alpha * u_dist + (1.0 - alpha) * fake_u_dist

            grads = jax.grad(lambda d: jnp.sum(critic(d)))(interp)
            norms = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2)) + 1e-12)
            gp = GRADIENT_PENALTY * jnp.mean((norms - 1.0) ** 2)
            return d_loss + gp, (d_loss, gp)

        (_, (d_loss, gp)), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
        return optax.apply_updates(d_params, updates), d_opt_state, d_loss, gp

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def g_step(g_params, g_opt_state, d_params, u_pos, rng):
        z_rng, ref_rng, mix_rng = jax.random.split(rng, 3)
        z = jax.random.normal(z_rng, (u_pos.shape[0], LATENT_SIZE))

        def loss_fn(g_params):
            fake = refine(generator_g, g_params, u_pos, z, ref_rng)
            pos, dist, mask = mixed_batch(*fake, mix_rng)
            out = discriminator.apply({"params": d_params}, pos, dist, mask=mask)[..., 0]
            return -jnp.mean(out)

        loss, grads = jax.value_and_grad(loss_fn)(g_params)
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        return optax.apply_updates(g_params, updates), g_opt_state, loss

    return d_step, g_step


def train(config: Optional[TrainConfig] = None, curriculum=None):
    config = config or parse_cli()
    generator, discriminator, g_params, d_params = create_models(config.seed)
    g_tx = optax.rmsprop(LEARN_RATE)
    d_tx = optax.rmsprop(LEARN_RATE)

    # Warm start from stage 1 (the reference's TODO, implemented).
    if checkpoints.exists(STAGE1_G_NAME, base=config.model_dir):
        g_params = checkpoints.load(g_params, STAGE1_G_NAME, base=config.model_dir)
    if checkpoints.exists(STAGE1_D_NAME, base=config.model_dir):
        d_params = checkpoints.load(d_params, STAGE1_D_NAME, base=config.model_dir)
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

    logger = CSVLogger(f"{config.plot_dir}/point_gan_ref_training.csv", resume=config.resume)
    profiler = StepProfiler()
    rng = jax.random.PRNGKey(config.seed + 1)
    num_steps = 0
    # Resume-reproducibility: same scheme as train/point_gan.py — completed
    # CSV lines fast-forward the global epoch/step counters, and all
    # stochastic draws are keyed by those counters.
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
        # Per-stage data mesh sized to the stage batch (16/8), exactly as in
        # train/point_gan.py — params are replicated so the transition is a
        # device_put, and each stage recompiles anyway (static shapes).
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
                total_loss, count = 0.0, 0
                with EpochTimer() as timer:
                    for uniform, surface in loader:
                        num_steps += 1
                        uniform = shard_batch(mesh, uniform.astype(np.float32))
                        surface = shard_batch(mesh, surface.astype(np.float32))
                        u_pos, u_dist = uniform[..., :3], uniform[..., 3:]
                        s_pos, s_dist = surface[..., :3], surface[..., 3:]
                        drng, grng = jax.random.split(jax.random.fold_in(rng, num_steps))
                        with profiler:
                            d_params, d_opt_state, d_loss, gp = d_step(
                                g_params, d_params, d_opt_state,
                                u_pos, u_dist, s_pos, s_dist, drng,
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
