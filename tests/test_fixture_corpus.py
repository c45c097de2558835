"""End-to-end L0→L3 pipeline on the pathological fixture corpus
(run_fixture_corpus.run at tiny settings): prepare with scan signs →
combine → train AE + autodecoder one epoch → reconstruction dump."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_fixture_corpus_pipeline(tmp_path):
    import run_fixture_corpus

    workdir = str(tmp_path / "corpus")
    # Loose-but-finite gate bounds: at these tiny settings the models can't
    # reach production quality, but the gate machinery (reconstruction
    # sampling, Chamfer/MMD/COV, overfit run, threshold comparison) must
    # execute end-to-end. Calibrated thresholds are exercised by the full
    # corpus run recorded in BASELINE.md.
    inf = float("inf")
    quality = run_fixture_corpus.run(
        workdir, count=5, epochs=1, uniform_count=2048, cloud_count=4096,
        voxel_resolutions=(16, 32), ad_epochs=3, overfit_epochs=4,
        gates={"recon_max": inf, "mmd_max": inf, "cov_min": 0.0, "overfit_max": inf},
    )
    assert set(quality) >= {"recon_chamfer", "mmd_cd", "cov_cd", "overfit_chamfer"}
    assert quality["mmd_cd"] >= 0.0 and 0.0 <= quality["cov_cd"] <= 1.0
    data_dir = os.path.join(workdir, "data", "fixtures")
    vox = [f for f in os.listdir(os.path.join(data_dir, "voxels_32")) if f.endswith(".npy")]
    assert len(vox) >= 3  # open shells may be quarantined before points
    assert os.path.exists(os.path.join(workdir, "data", "sdf_points.npy"))
    assert os.path.exists(os.path.join(workdir, "plots", "fixture_reconstructions.npy"))
    recon = np.load(os.path.join(workdir, "plots", "fixture_reconstructions.npy"))
    assert np.isfinite(recon).all()
    # the trained checkpoints landed
    assert any("autoencoder" in f for f in os.listdir(os.path.join(workdir, "models")))
