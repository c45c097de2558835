"""Metrics, classifier trainer, checkpoint semantics, CLI parsing."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from shapegan_tpu import checkpoints
from shapegan_tpu.core.config import parse_cli
from shapegan_tpu.metrics import (
    chamfer_distance,
    coverage,
    minimum_matching_distance,
    rescale_point_cloud,
    sample_from_voxels,
)


def test_chamfer_zero_for_identical():
    a = np.random.default_rng(0).normal(size=(256, 3)).astype(np.float32)
    assert float(chamfer_distance(jnp.asarray(a), jnp.asarray(a))) < 1e-10
    assert float(chamfer_distance(jnp.asarray(a), jnp.asarray(a + 0.5))) > 0.0


def test_mmd_and_coverage():
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(4, 128, 3)).astype(np.float32)
    gen = ref + rng.normal(0, 0.01, ref.shape).astype(np.float32)
    assert minimum_matching_distance(gen, ref) < 0.01
    assert coverage(gen, ref) == 1.0


def test_rescale_conventions():
    pts = np.random.default_rng(0).normal(2, 5, (500, 3)).astype(np.float32)
    sphere = rescale_point_cloud(pts, "sphere")
    assert abs(np.linalg.norm(sphere, axis=1).max() - 0.5) < 1e-5
    cube = rescale_point_cloud(pts, "cube")
    assert abs(np.abs(cube).max() - 0.5) < 1e-5


def test_sample_from_voxels():
    from shapegan_tpu.data.synthetic import make_voxel_dataset

    voxels = make_voxel_dataset(2, resolution=24, rescale=False)
    clouds = sample_from_voxels(voxels, point_count=512)
    assert clouds.shape == (2, 512, 3)
    assert np.abs(clouds).max() <= 0.5 + 1e-5


@pytest.mark.slow
def test_classifier_learns_synthetic_classes():
    from shapegan_tpu.train import classifier as clf

    volumes, labels, label_count = clf.make_synthetic_class_dataset(12, seed=0)
    model, state = clf.create_state(label_count, jax.random.PRNGKey(0))
    acc = 0.0
    for epoch in range(15):
        for start in range(0, len(volumes) - 16 + 1, 16):
            state, metrics = clf.train_step(
                model, state,
                jnp.asarray(volumes[start : start + 16]),
                jnp.asarray(labels[start : start + 16]),
            )
        acc = float(metrics["accuracy"])
    assert acc > 0.5  # far above the 0.25 chance level


def test_checkpoint_roundtrip_and_partial_restore(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "nested": {"b": np.ones(4)}}
    checkpoints.save(tree, "model", base=str(tmp_path))
    restored = checkpoints.load(
        {"a": np.zeros((2, 3), np.float32), "nested": {"b": np.zeros(4)}},
        "model", base=str(tmp_path),
    )
    np.testing.assert_array_equal(restored["a"], tree["a"])

    # tolerant partial restore: extra template key keeps its value
    partial = checkpoints.load(
        {"a": np.zeros((2, 3), np.float32), "nested": {"b": np.zeros(4)},
         "new_layer": np.full(2, 7.0)},
        "model", base=str(tmp_path),
    )
    np.testing.assert_array_equal(partial["new_layer"], [7.0, 7.0])

    # epoch snapshots are separate immutable files
    checkpoints.save(tree, "model", epoch=42, base=str(tmp_path))
    assert checkpoints.exists("model", epoch=42, base=str(tmp_path))
    assert checkpoints.get_filename("model", 42, str(tmp_path)).endswith(
        "checkpoints/model-epoch-00042.npz"
    )


def test_cli_parsing_reference_vocabulary():
    cfg = parse_cli(["continue", "nogui", "show_slice", "verbose", "classic",
                     "iteration=2", "epochs=100"])
    assert cfg.resume and cfg.nogui and cfg.show_slice and cfg.verbose and cfg.classic
    assert cfg.iteration == 2 and cfg.epochs == 100

    cfg2 = parse_cli(["--category", "airplanes", "synthetic=10", "--batch_size=4"])
    assert cfg2.category == "airplanes"
    assert cfg2.synthetic == 10
    assert cfg2.batch_size == 4

    cfg3 = parse_cli(["synthetic"])
    assert cfg3.synthetic == 50  # bare token default

    cfg4 = parse_cli(["steps=123"])
    assert cfg4.extras["steps"] == 123


def test_shapenet_taxonomy_and_mesh_helpers_importable():
    # keep the public surface importable (smoke)
    import shapegan_tpu.metrics  # noqa: F401
    import shapegan_tpu.render.binary_voxels  # noqa: F401
    import shapegan_tpu.data.prepare  # noqa: F401
    import shapegan_tpu.train.classifier  # noqa: F401


def test_bench_run_config_isolation(capsys):
    """bench.py's per-config crash isolation: transient failures retry and
    still record the metric; persistent failures yield an error submetric
    instead of killing the sweep (BENCH_r03.json lost a whole sweep to one
    transient remote-compile error at config 6/7)."""
    import bench

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("remote_compile: read body closed")
        return {"metric": "m", "value": 1.0, "unit": "x", "vs_baseline": 2.0}

    rec = bench._run_config("m", flaky, retries=2, retry_sleep=0.0)
    assert rec["value"] == 1.0 and calls["n"] == 3

    def always_fails():
        raise ValueError("boom")

    rec = bench._run_config("broken", always_fails, retries=1, retry_sleep=0.0)
    assert rec["metric"] == "broken" and "boom" in rec["error"]
    err = capsys.readouterr().err
    assert err.count("BENCH-ERROR") == 4  # 2 flaky retries + 2 failed attempts


def test_quality_gate_thresholds():
    """run_fixture_corpus.evaluate_gates: direction of every bound."""
    import run_fixture_corpus as rfc

    good = {"recon_chamfer": 0.001, "mmd_cd": 0.001, "cov_cd": 1.0,
            "overfit_chamfer": 0.001}
    assert rfc.evaluate_gates(good, rfc.DEFAULT_GATES) == []
    bad = {"recon_chamfer": 1.0, "mmd_cd": 1.0, "cov_cd": 0.0,
           "overfit_chamfer": float("inf")}
    assert rfc.evaluate_gates(bad, rfc.DEFAULT_GATES) == [
        "recon_chamfer", "mmd_cd", "cov_cd", "overfit_chamfer"]


def test_bundled_example_fallback(tmp_path, monkeypatch, capsys):
    """checkpoints.load falls back to shapegan_tpu/examples/ ONLY for the
    default base with no epoch — trainer resume paths (explicit base or
    exists() probes) must be unaffected."""
    import pytest

    from shapegan_tpu import checkpoints

    monkeypatch.chdir(tmp_path)  # no models/ here: a fresh clone
    codes = checkpoints.load_array("sdf_net_latent_codes")
    assert codes.ndim == 2 and codes.shape[1] == 128
    assert "bundled example" in capsys.readouterr().out
    # exists() never consults the bundle
    assert not checkpoints.exists("sdf_net_latent_codes")
    # explicit non-default base: no silent fallback
    with pytest.raises(FileNotFoundError):
        checkpoints.load_array("sdf_net_latent_codes", base=str(tmp_path / "m"))
    # epoch snapshots: no silent fallback
    with pytest.raises(FileNotFoundError):
        checkpoints.load_array("sdf_net_latent_codes", epoch=3)
