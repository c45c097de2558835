"""End-to-end smoke test of the AE/VAE trainer (milestone 0 — SURVEY.md §7):
loss decreases on synthetic shapes, checkpoints round-trip, resume works."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from shapegan_tpu import checkpoints
from shapegan_tpu.core.config import TrainConfig
from shapegan_tpu.data.synthetic import make_voxel_dataset
from shapegan_tpu.models.autoencoder import Autoencoder
from shapegan_tpu.train import autoencoder as ae_train


@pytest.mark.slow
def test_train_step_decreases_loss(tmp_path):
    model = Autoencoder(is_variational=False)
    state = ae_train.create_state(model, jax.random.PRNGKey(0))
    data = jnp.asarray(make_voxel_dataset(8, resolution=32, seed=1))
    rng = jax.random.PRNGKey(2)

    first_loss = None
    for step in range(12):
        rng, sub = jax.random.split(rng)
        state, metrics, _ = ae_train.train_step(model, state, data, sub)
        if first_loss is None:
            first_loss = float(metrics["reconstruction_loss"])
    final_loss = float(metrics["reconstruction_loss"])
    assert np.isfinite(final_loss)
    assert final_loss < first_loss


@pytest.mark.slow
def test_vae_train_step_runs(tmp_path):
    model = Autoencoder(is_variational=True)
    state = ae_train.create_state(model, jax.random.PRNGKey(0))
    data = jnp.asarray(make_voxel_dataset(4, resolution=32, seed=1))
    state, metrics, out = ae_train.train_step(model, state, data, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["kld_loss"]))
    assert float(metrics["kld_loss"]) >= 0.0
    assert out.shape == (4, 32, 32, 32)


@pytest.mark.slow
def test_full_train_loop_and_resume(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = TrainConfig(
        classic=True, synthetic=8, batch_size=4, epochs=1, nogui=True,
        model_dir=str(tmp_path / "models"), plot_dir=str(tmp_path / "plots"),
    )
    ae_train.train(config)
    assert checkpoints.exists("autoencoder-128", base=config.model_dir)
    # epoch 0 snapshot written (epoch % 20 == 0)
    assert checkpoints.exists("autoencoder-128", epoch=0, base=config.model_dir)
    log = (tmp_path / "plots" / "autoencoder_training.csv").read_text().strip().splitlines()
    assert len(log) == 1

    # resume: continues at epoch 1 and appends to the log
    config2 = TrainConfig(
        classic=True, synthetic=8, batch_size=4, epochs=2, nogui=True, resume=True,
        model_dir=str(tmp_path / "models"), plot_dir=str(tmp_path / "plots"),
    )
    ae_train.train(config2)
    log = (tmp_path / "plots" / "autoencoder_training.csv").read_text().strip().splitlines()
    assert len(log) == 2
    assert log[1].split()[0] == "1"
