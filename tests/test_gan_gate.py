"""Unit coverage for the GAN quality gate's pieces (run_gan_gate.py).

The full gate (train + 4-iteration chain + score + sheet) runs on TPU as a
round artifact and at micro budgets in CI via the slow corpus tests; these
tests pin the gate's scoring/plumbing helpers, which decide pass/fail."""

import json

import numpy as np
import pytest

import run_gan_gate as gg


def test_punish_empty_replaces_allzero_clouds():
    clouds = np.zeros((3, 16, 3), np.float32)
    clouds[1] = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)
    out = gg._punish_empty(clouds, 16)
    # empty clouds land far away so MMD/COV punish them...
    assert np.all(out[0] == 10.0) and np.all(out[2] == 10.0)
    # ...non-empty clouds are untouched, and the input is not mutated.
    np.testing.assert_array_equal(out[1], clouds[1])
    assert np.all(clouds[0] == 0.0)


def test_assert_finite_csv(tmp_path):
    good = tmp_path / "good.csv"
    good.write_text("0 1.5 0.1 0.2 9.8\n1 1.4 0.1 0.2 9.7\n")
    gg._assert_finite_csv(str(good), 0)

    bad = tmp_path / "bad.csv"
    bad.write_text("0 1.5 nan 0.2 9.8\n")
    with pytest.raises(AssertionError, match="non-finite"):
        gg._assert_finite_csv(str(bad), 2)

    empty = tmp_path / "empty.csv"
    empty.write_text("")
    with pytest.raises(AssertionError, match="empty"):
        gg._assert_finite_csv(str(empty), 1)


def test_default_gates_would_catch_an_untrained_generator():
    """The committed thresholds must reject what an untrained/collapsed
    model measures. The micro-budget CPU validation run (round 5) scored a
    1-epoch 64^3 progressive generator at mmd 587 (all-empty samples
    punished) and a 3-epoch voxel GAN at mmd 0.020 / cov 0.25 — both must
    FAIL the shipped defaults."""
    g = gg.DEFAULT_GATES
    assert 587.0 > g["prog_mmd_max"]
    assert 0.020 > g["voxel_mmd_max"]
    assert 0.25 < g["voxel_cov_min"] or 0.020 > g["voxel_mmd_max"]


def test_gate_record_schema_matches_fixture_corpus():
    """Both gate runners emit the same GATE record envelope so the driver
    round record can treat them uniformly."""
    import inspect

    import run_fixture_corpus as rfc

    for src in (inspect.getsource(gg.run), inspect.getsource(rfc.run)):
        assert '"gate"' in src and "GATE " in src
        assert '"pass"' in src and '"failures"' in src
