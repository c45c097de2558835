"""Smoke tests for GAN / WGAN / hybrid / progressive trainers: steps run,
losses finite, semantics (weight clipping, critic ratios, fade-in, GP) hold."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from shapegan_tpu.core.config import TrainConfig
from shapegan_tpu.data.synthetic import make_voxel_dataset
from shapegan_tpu.train import gan as gan_train
from shapegan_tpu.train import wgan as wgan_train
from shapegan_tpu.train import hybrid_gan
from shapegan_tpu.train import hybrid_progressive_gan as prog


@pytest.mark.slow
def test_gan_train_step():
    generator, discriminator, g_state, d_state = gan_train.create_states(jax.random.PRNGKey(0))
    batch = jnp.asarray(make_voxel_dataset(4, resolution=32, seed=0))
    g_state, d_state, metrics, sample = gan_train.train_step(
        generator, discriminator, g_state, d_state, batch, jax.random.PRNGKey(1)
    )
    assert sample.shape == (4, 32, 32, 32)
    assert 0.0 <= float(metrics["pred_fake"]) <= 1.0
    assert 0.0 <= float(metrics["pred_real"]) <= 1.0


@pytest.mark.slow
def test_wgan_critic_step_clips_weights():
    generator, critic, g_state, d_state = wgan_train.create_states(jax.random.PRNGKey(0))
    batch = jnp.asarray(make_voxel_dataset(4, resolution=32, seed=0))
    d_state, metrics = wgan_train.critic_step(
        generator, critic, g_state, d_state, batch, jax.random.PRNGKey(1)
    )
    max_abs = max(float(jnp.abs(leaf).max()) for leaf in jax.tree.leaves(d_state.params))
    assert max_abs <= wgan_train.CRITIC_WEIGHT_LIMIT + 1e-6
    assert np.isfinite(float(metrics["pred_fake"]))

    g_state, pred_fake, sample = wgan_train.generator_step(
        generator, critic, g_state, d_state, 4, jax.random.PRNGKey(2)
    )
    assert sample.shape == (4, 32, 32, 32)


@pytest.mark.slow
def test_hybrid_gan_steps():
    net, discriminator, g_params, g_tx, d_state = hybrid_gan.create_states(jax.random.PRNGKey(0))
    g_opt_state = g_tx.init(g_params)
    g_step, d_step = hybrid_gan.make_steps(net, discriminator, g_tx, batch_size=2)
    batch = jnp.asarray(make_voxel_dataset(2, resolution=32, seed=0, rescale=False))

    g_params, g_opt_state, fake = g_step(g_params, g_opt_state, d_state.params, jax.random.PRNGKey(1))
    assert fake.shape == (2, 32, 32, 32)
    assert float(jnp.abs(fake).max()) <= 1.0  # tanh-bounded implicit generator

    d_state, metrics = d_step(g_params, d_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["pred_fake"]))
    assert np.isfinite(float(metrics["pred_real"]))


@pytest.mark.slow
def test_progressive_steps_all_iterations():
    net, discriminator, g_params, d_params = prog.create_models(seed=0)
    g_tx = prog.optax.rmsprop(1e-4)
    d_tx = prog.optax.rmsprop(1e-4)
    for iteration in range(4):
        res = prog.RESOLUTIONS[iteration]
        g_opt = g_tx.init(g_params)
        d_opt = d_tx.init(d_params)
        g_step, d_step = prog.make_steps(net, discriminator, g_tx, d_tx, iteration, batch_size=2)
        batch = jnp.asarray(make_voxel_dataset(2, resolution=res, seed=0, rescale=False))
        g_params2, g_opt, fake = g_step(g_params, g_opt, d_params, jax.random.PRNGKey(1), 0.5)
        assert fake.shape == (2, res, res, res)
        d_params2, d_opt, metrics = d_step(
            g_params2, d_params, d_opt, batch, jax.random.PRNGKey(2), 0.5
        )
        assert np.isfinite(float(metrics["gradient_penalty"]))
        assert float(metrics["gradient_penalty"]) >= 0.0
        g_params, d_params = g_params2, d_params2


@pytest.mark.slow
def test_progressive_full_loop_and_warm_start(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    base = dict(
        synthetic=4, batch_size=2, epochs=1, nogui=True,
        model_dir=str(tmp_path / "models"), plot_dir=str(tmp_path / "plots"),
    )
    prog.train(TrainConfig(iteration=0, **base))
    from shapegan_tpu import checkpoints

    assert checkpoints.exists("hybrid_progressive_gan_generator_0", base=base["model_dir"])
    # Iteration 1 warm-starts from iteration 0's files and trains at 16^3.
    prog.train(TrainConfig(iteration=1, **base))
    assert checkpoints.exists("hybrid_progressive_gan_discriminator_1", base=base["model_dir"])
    log = (tmp_path / "plots" / "hybrid_gan_training_1.csv").read_text().strip().splitlines()
    assert len(log) == 1


@pytest.mark.slow
def test_gan_save_every_thins_latest_slot(tmp_path, monkeypatch):
    """save_every=N (extras) thins the per-epoch latest-slot saves but the
    FINAL epoch always saves, so resume/warm-start slots stay complete;
    the default (absent) keeps the reference's save-every-epoch cadence."""
    import os

    from shapegan_tpu import checkpoints

    monkeypatch.chdir(tmp_path)
    calls = []
    orig = gan_train.save

    def counting_save(config, g_state, d_state, g_name, d_name, epoch, snapshot):
        calls.append(epoch)
        return orig(config, g_state, d_state, g_name, d_name, epoch, snapshot)

    monkeypatch.setattr(gan_train, "save", counting_save)
    cfg = TrainConfig(
        nogui=True, synthetic=4, epochs=5, batch_size=4, seed=0,
        model_dir=str(tmp_path / "models"), plot_dir=str(tmp_path / "plots"),
        extras={"save_every": 3},
    )
    gan_train.train(cfg)
    # epoch 0: snapshot cadence (%20); epoch 2: (2+1)%3==0; epoch 4: final.
    assert calls == [0, 2, 4]
    assert checkpoints.exists("generator", base=cfg.model_dir)
    log = (tmp_path / "plots" / "gan_training.csv").read_text().splitlines()
    assert len(log) == 5  # CSV stays per-epoch (resume line-count semantics)
