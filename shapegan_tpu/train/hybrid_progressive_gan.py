"""Progressive hybrid WGAN-GP — the paper's headline model
(arXiv:2002.00349; reference /root/reference/train_hybrid_progressive_gan.py).

Reference semantics:
  * 4 manual growth iterations (``iteration=0..3``) at 8^3/16^3/32^3/64^3;
    each run warm-starts from the previous iteration's checkpoints unless
    ``continue`` resumes the same iteration (:51-56).
  * WGAN-GP: critic updated every batch with gradient penalty (weight 10) on
    real/fake interpolates (:102-111); generator updated every 5th batch
    (:135); RMSprop lr 1e-4 for both (:81-82); batch 16; fade-in over the
    first 10 epochs of a grown iteration (:37, :131-132); 250 epochs default;
    batches of size 1 skipped (:122 — our loader drops remainders); save
    every epoch + snapshot every 10; CSV ``epoch time fake real gp`` per
    iteration.

TPU-native design:
  * ``iteration`` is a Python-static argument — each growth step is a fresh
    jit specialization over one static parameter pytree (no ``strict=False``
    surgery; see models/progressive_gan.py).
  * ``fade_in_progress`` is traced, so fade-in never retriggers compilation.
  * The generator's dense grid evaluation runs through the fused
    latent-projection MLP with the point axis sharded over the mesh
    (4.2M MLP evals per G step at 64^3 — SURVEY.md §3.2); gradients
    all-reduce over 'data' via XLA psums.
  * The gradient penalty's grad-through-grad is nested jax.grad inside the
    critic loss (ops/losses.gradient_penalty).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from shapegan_tpu import LATENT_CODE_SIZE, SDF_CLIPPING, checkpoints
from shapegan_tpu.core.config import TrainConfig, parse_cli
from shapegan_tpu.models.progressive_gan import RESOLUTIONS, ProgressiveDiscriminator
from shapegan_tpu.models.sdf_net import SDFNet
from shapegan_tpu.ops.coords import voxel_coordinates
from shapegan_tpu.ops.losses import gradient_penalty
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

FADE_IN_EPOCHS = 10
BATCH_SIZE = 16
GRADIENT_PENALTY_WEIGHT = 10.0
DEFAULT_EPOCHS = 250
LEARN_RATE = 1e-4
GENERATOR_UPDATE_EVERY = 5
SNAPSHOT_EVERY = 10

G_NAME = "hybrid_progressive_gan_generator_{:d}"
D_NAME = "hybrid_progressive_gan_discriminator_{:d}"
OPT_NAME = "hybrid_progressive_gan_optimizer_{:d}"


def create_models(seed: int = 0):
    net = SDFNet()
    discriminator = ProgressiveDiscriminator()
    g_rng, d_rng = jax.random.split(jax.random.PRNGKey(seed))
    g_params = net.init(g_rng)
    # Init at the deepest iteration so every optional layer's params exist;
    # one static pytree then serves all four growth iterations.
    d_vars = discriminator.init(
        d_rng, jnp.zeros((1,) + (RESOLUTIONS[-1],) * 3), iteration=len(RESOLUTIONS) - 1
    )
    return net, discriminator, g_params, d_vars["params"]


def make_steps(net: SDFNet, discriminator: ProgressiveDiscriminator, g_tx, d_tx,
               iteration: int, batch_size: int):
    """Build the jitted G/D steps for one growth iteration (static arg)."""
    resolution = RESOLUTIONS[iteration]
    grid = jnp.asarray(voxel_coordinates(resolution))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def g_step(g_params, g_opt_state, d_params, rng, fade):
        def loss_fn(g_params):
            z = jax.random.normal(rng, (batch_size, LATENT_CODE_SIZE))
            fake = generate_volumes(net, g_params, grid, z, resolution)
            score = discriminator.apply(
                {"params": d_params}, fake, iteration=iteration, fade_in_progress=fade
            )
            return -jnp.mean(score), fake

        (_, fake), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        return optax.apply_updates(g_params, updates), g_opt_state, fake

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def d_step(g_params, d_params, d_opt_state, batch, rng, fade):
        z_rng, gp_rng = jax.random.split(rng)
        z = jax.random.normal(z_rng, (batch.shape[0], LATENT_CODE_SIZE))
        fake = jax.lax.stop_gradient(
            generate_volumes_inference(net, g_params, grid, z, resolution)
        )

        def loss_fn(d_params):
            critic = lambda x: discriminator.apply(
                {"params": d_params}, x, iteration=iteration, fade_in_progress=fade
            )
            out_fake = critic(fake)
            out_real = critic(batch)
            gp = gradient_penalty(
                critic, gp_rng, batch, fake, weight=GRADIENT_PENALTY_WEIGHT
            )
            loss = jnp.mean(out_fake) - jnp.mean(out_real) + gp
            return loss, (jnp.mean(out_fake), jnp.mean(out_real), gp)

        (_, (pred_fake, pred_real, gp)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_params
        )
        updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return d_params, d_opt_state, {
            "pred_fake": pred_fake, "pred_real": pred_real, "gradient_penalty": gp,
        }

    return g_step, d_step


def train(config: Optional[TrainConfig] = None):
    config = config or parse_cli()
    iteration = config.iteration
    resolution = RESOLUTIONS[iteration]
    epochs_total = config.epochs or DEFAULT_EPOCHS

    net, discriminator, g_params, d_params = create_models(config.seed)

    # Warm start / resume (reference :51-59).
    if not config.resume and iteration > 0:
        if checkpoints.exists(G_NAME.format(iteration - 1), base=config.model_dir):
            g_params = checkpoints.load(
                g_params, G_NAME.format(iteration - 1), base=config.model_dir
            )
        if checkpoints.exists(D_NAME.format(iteration - 1), base=config.model_dir):
            d_params = checkpoints.load(
                d_params, D_NAME.format(iteration - 1), base=config.model_dir
            )
    if config.resume:
        if checkpoints.exists(G_NAME.format(iteration), base=config.model_dir):
            g_params = checkpoints.load(g_params, G_NAME.format(iteration), base=config.model_dir)
        if checkpoints.exists(D_NAME.format(iteration), base=config.model_dir):
            d_params = checkpoints.load(d_params, D_NAME.format(iteration), base=config.model_dir)

    # Gate-scale knobs (config.extras; defaults = reference semantics).
    # At the quality gate's synthetic budget (64 shapes -> 4 batches/epoch)
    # the reference cadence gives the generator <1 update per epoch — ~60x
    # fewer G updates per iteration than the reference's real-data runs —
    # and the generator mean-collapses before it can form shapes. The gate
    # passes g_every/learn_rate overrides to rebalance at small scale; the
    # defaults here keep reference parity (:81-82, :135).
    g_every = int(config.extras.get("g_every", GENERATOR_UPDATE_EVERY))
    learn_rate = float(config.extras.get("learn_rate", LEARN_RATE))
    d_learn_rate = float(config.extras.get("d_learn_rate", learn_rate))
    g_tx = optax.rmsprop(learn_rate)
    d_tx = optax.rmsprop(d_learn_rate)
    g_opt_state = g_tx.init(g_params)
    d_opt_state = d_tx.init(d_params)
    # Same-iteration resume restores RMSprop moments from the sidecar; a new
    # growth iteration starts with fresh moments (like the reference).
    if config.resume and checkpoints.exists(OPT_NAME.format(iteration), base=config.model_dir):
        restored = checkpoints.load(
            {"g": g_opt_state, "d": d_opt_state}, OPT_NAME.format(iteration),
            base=config.model_dir,
        )
        g_opt_state, d_opt_state = restored["g"], restored["d"]

    dataset = resolve_voxel_dataset(config, resolution=resolution, rescale_sdf=False)
    batch_size = effective_batch_size(config.batch_size or BATCH_SIZE, len(dataset))
    mesh = get_mesh(batch_size=batch_size)
    batches = make_voxel_batches(dataset, mesh, batch_size, config.seed, config.extras)
    batches_per_epoch = max(1, len(batches))

    g_params, d_params, g_opt_state, d_opt_state = jax.device_put(
        (g_params, d_params, g_opt_state, d_opt_state), replicated(mesh)
    )
    g_step, d_step = make_steps(net, discriminator, g_tx, d_tx, iteration, batch_size)

    logger = CSVLogger(f"{config.plot_dir}/hybrid_gan_training_{iteration}.csv",
                       resume=config.resume)
    first_epoch = logger.first_epoch
    viewer = make_viewer(config.nogui)
    history_fake, history_real, history_gp = RollingHistory(), RollingHistory(), RollingHistory()
    profiler = StepProfiler()
    base_rng = jax.random.PRNGKey(config.seed + 1)
    fading = (not config.resume) and iteration > 0

    try:
        with mesh:
            for epoch in range(first_epoch, epochs_total):
                # Epoch-deterministic randomness for reproducible resume.
                rng = jax.random.fold_in(base_rng, epoch)
                batches.set_epoch(epoch)
                with EpochTimer() as timer:
                    for batch_index, batch in enumerate(batches):
                        fade = (
                            (epoch + batch_index / batches_per_epoch) / FADE_IN_EPOCHS
                            if fading else 1.0
                        )
                        rng, grng, drng = jax.random.split(rng, 3)
                        with profiler:
                            if batch_index % g_every == 0:
                                g_params, g_opt_state, fake = g_step(
                                    g_params, g_opt_state, d_params, grng, fade
                                )
                                if batch_index % 50 == 0:
                                    if viewer is not None:
                                        viewer.set_voxels(jax.device_get(fake[0]))
                                    if config.show_slice:
                                        maybe_print_slice(fake[0], True, scale=SDF_CLIPPING)
                            d_params, d_opt_state, metrics = d_step(
                                g_params, d_params, d_opt_state,
                                batch, drng, fade,
                            )
                        history_fake.append(metrics["pred_fake"])
                        history_real.append(metrics["pred_real"])
                        history_gp.append(metrics["gradient_penalty"])
                        if config.verbose and batch_index % 50 == 0:
                            print(
                                f"Epoch {epoch}, batch {batch_index}: "
                                f"D(x'): {history_fake.mean:.4f}, D(x): {history_real.mean:.4f}, "
                                f"loss: {history_real.mean - history_fake.mean:.4f}, "
                                f"gradient penalty: {history_gp.mean:.4f}"
                            )

                print(
                    f"Epoch {epoch} ({timer.duration:.1f}s, "
                    f"{profiler.mean_step_time * 1000:.1f} ms/step) [{resolution}^3], "
                    f"D(x'): {history_fake.mean:.4f}, D(x): {history_real.mean:.4f}, "
                    f"loss: {history_real.mean - history_fake.mean:.4f}, "
                    f"gradient penalty: {history_gp.mean:.4f}"
                )

                # save_every=N (extras) thins the per-epoch latest-slot
                # saves (each pulls G+D+optimizer off-device — the dominant
                # risk over a flaky remote link); default 1 = reference's
                # save-every-epoch semantics. The final epoch always saves
                # (the next iteration's warm start reads the latest slot).
                save_every = int(config.extras.get("save_every", 1))
                if (epoch + 1) % save_every == 0 or epoch == epochs_total - 1:
                    checkpoints.save(g_params, G_NAME.format(iteration), base=config.model_dir)
                    checkpoints.save(d_params, D_NAME.format(iteration), base=config.model_dir)
                    checkpoints.save(
                        {"g": g_opt_state, "d": d_opt_state}, OPT_NAME.format(iteration),
                        base=config.model_dir,
                    )
                if epoch % SNAPSHOT_EVERY == 0:
                    checkpoints.save(
                        g_params, G_NAME.format(iteration), epoch=epoch, base=config.model_dir
                    )
                    checkpoints.save(
                        d_params, D_NAME.format(iteration), epoch=epoch, base=config.model_dir
                    )
                logger.write(epoch, timer.duration, history_fake.mean, history_real.mean,
                             history_gp.mean)
    except KeyboardInterrupt:
        pass
    if viewer is not None:
        viewer.stop()
    return g_params, d_params


if __name__ == "__main__":
    train()
