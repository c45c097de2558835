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
    run_fixture_corpus.run(
        workdir, count=5, epochs=1, uniform_count=2048, cloud_count=4096,
        voxel_resolutions=(16, 32),
    )
    data_dir = os.path.join(workdir, "data", "fixtures")
    vox = [f for f in os.listdir(os.path.join(data_dir, "voxels_32")) if f.endswith(".npy")]
    assert len(vox) >= 3  # open shells may be quarantined before points
    assert os.path.exists(os.path.join(workdir, "data", "sdf_points.npy"))
    assert os.path.exists(os.path.join(workdir, "plots", "fixture_reconstructions.npy"))
    recon = np.load(os.path.join(workdir, "plots", "fixture_reconstructions.npy"))
    assert np.isfinite(recon).all()
    # the trained checkpoints landed
    assert any("autoencoder" in f for f in os.listdir(os.path.join(workdir, "models")))
