"""Resume fidelity: interrupting after an epoch and resuming must reproduce
the uninterrupted run exactly — optimizer moments come back from the sidecar
checkpoints, the loader re-derives its shuffle from (seed, epoch), and each
epoch's RNG is folded from the epoch index. (The reference silently resets
Adam/RMSprop moments and replays a different shuffle on resume —
/root/reference/model/__init__.py:20-43, SURVEY.md §5.)"""

import pytest
import numpy as np
import jax

from shapegan_tpu.core.config import TrainConfig


def _assert_trees_equal(a, b):
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for x, y in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_progressive_resume_reproduces_uninterrupted(tmp_path):
    from shapegan_tpu.train import hybrid_progressive_gan as prog

    def config(tag, epochs, resume):
        d = tmp_path / tag
        (d / "plots").mkdir(parents=True, exist_ok=True)
        return TrainConfig(
            synthetic=8, batch_size=4, epochs=epochs, resume=resume, seed=3,
            iteration=0, nogui=True,
            model_dir=str(d / "models"), plot_dir=str(d / "plots"),
        )

    g_full, d_full = prog.train(config("full", epochs=2, resume=False))

    g1, d1 = prog.train(config("split", epochs=1, resume=False))
    # `epochs` is the TOTAL for the progressive trainer (reference
    # NUMBER_OF_EPOCHS): the resumed run continues from the CSV-derived
    # first_epoch up to 2.
    g_resumed, d_resumed = prog.train(config("split", epochs=2, resume=True))

    # The interrupted run must differ after 1 epoch but match after resuming.
    assert not all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g_full))
    )
    _assert_trees_equal(g_resumed, g_full)
    _assert_trees_equal(d_resumed, d_full)


def test_autodecoder_resume_reproduces_uninterrupted(tmp_path):
    from shapegan_tpu.train import sdf_autodecoder as auto

    def config(tag, epochs, resume):
        d = tmp_path / tag
        (d / "plots").mkdir(parents=True, exist_ok=True)
        return TrainConfig(
            synthetic=4, batch_size=512, epochs=epochs, resume=resume, seed=5,
            nogui=True, model_dir=str(d / "models"), plot_dir=str(d / "plots"),
            extras={"pointcloud_size": 2000},
        )

    params_full, codes_full = auto.train(config("full", epochs=2, resume=False))
    auto.train(config("split", epochs=1, resume=False))
    # epochs=N is the TOTAL epoch count in every trainer (reference
    # progressive semantics): the resumed run trains epoch 1 only.
    params_resumed, codes_resumed = auto.train(config("split", epochs=2, resume=True))

    _assert_trees_equal(params_resumed, params_full)
    np.testing.assert_array_equal(np.asarray(codes_resumed), np.asarray(codes_full))


@pytest.mark.slow
def test_point_gan_resume_reproduces_uninterrupted(tmp_path):
    """Interrupt mid-curriculum, resume with the full curriculum: completed
    (stage, epoch) CSV lines fast-forward the global step counter, and the
    per-item point subsample is keyed by (seed, epoch, index) — so the
    resumed run is bit-identical to the uninterrupted one. (Unseeded global
    np.random subsampling — reference datasets.py:74-75 — broke exactly
    this guarantee for the point trainers.)"""
    from shapegan_tpu.train import point_gan

    stage1 = (64, 4, 1)
    stage2 = (128, 4, 1)

    def config(tag, resume):
        d = tmp_path / tag
        (d / "plots").mkdir(parents=True, exist_ok=True)
        return TrainConfig(
            synthetic=20, resume=resume, seed=11, nogui=True,
            model_dir=str(d / "models"), plot_dir=str(d / "plots"),
        )

    g_full, d_full = point_gan.train(config("full", False), curriculum=[stage1, stage2])
    g1, _ = point_gan.train(config("split", False), curriculum=[stage1])
    g_res, d_res = point_gan.train(config("split", True), curriculum=[stage1, stage2])

    assert not all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g_full))
    )
    _assert_trees_equal(g_res, g_full)
    _assert_trees_equal(d_res, d_full)


@pytest.mark.slow
def test_epochs_is_total_across_trainers(tmp_path, monkeypatch):
    """epochs=N means "train until epoch N" in EVERY trainer (the reference's
    progressive semantics): a completed run resumed with the same N trains
    zero further epochs, so the CSV log stays at N lines."""
    monkeypatch.chdir(tmp_path)
    from shapegan_tpu.train import gan as gan_train

    cfg = dict(
        synthetic=4, batch_size=2, epochs=1, nogui=True, seed=7,
        model_dir=str(tmp_path / "models"), plot_dir=str(tmp_path / "plots"),
    )
    (tmp_path / "plots").mkdir(exist_ok=True)
    gan_train.train(TrainConfig(**cfg))
    log = tmp_path / "plots" / "gan_training.csv"
    assert len(log.read_text().strip().splitlines()) == 1
    gan_train.train(TrainConfig(resume=True, **cfg))
    assert len(log.read_text().strip().splitlines()) == 1  # nothing retrained
