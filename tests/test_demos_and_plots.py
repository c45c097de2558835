"""Demos and figure factory: pure helpers + end-to-end recipe smoke tests on
fabricated checkpoints/logs (no GL, no display)."""

import pytest
import os
import sys

import numpy as np
import jax



def test_catmull_rom_interpolates_through_controls():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from demo_sdf_net import catmull_rom

    pts = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    path = catmull_rom(pts, steps=10)
    assert path.shape == (40, 2)
    # the spline passes through each control point at segment starts
    np.testing.assert_allclose(path[0], pts[0], atol=1e-9)
    np.testing.assert_allclose(path[10], pts[1], atol=1e-9)
    np.testing.assert_allclose(path[20], pts[2], atol=1e-9)


def test_voxel_image_projection():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import create_plot

    from shapegan_tpu.data.synthetic import make_voxel_dataset

    vol = make_voxel_dataset(1, resolution=16, rescale=False)[0]
    img = create_plot._voxel_image(vol)
    assert img.shape == (16, 16)
    assert img.max() > img.min()  # shape visible


def test_training_curves_and_latent_plots(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import importlib

    import create_plot

    importlib.reload(create_plot)
    from shapegan_tpu import checkpoints
    from shapegan_tpu.core.config import TrainConfig
    from shapegan_tpu.models import LATENT_CODES_FILENAME

    os.makedirs("plots", exist_ok=True)
    with open("plots/demo_training.csv", "w") as f:
        for epoch in range(5):
            f.write(f"{epoch} 1.0 {1.0 / (epoch + 1):.4f} 0.01\n")
    config = TrainConfig(plot_dir="plots", model_dir="models")
    create_plot.training_curves(["plots/demo_training.csv"], config)
    assert os.path.exists("plots/training_curves.png")

    codes = np.random.default_rng(0).normal(0, 0.1, (40, 128)).astype(np.float32)
    checkpoints.save_array(codes, LATENT_CODES_FILENAME, base="models")
    create_plot.latent_distribution([], config)
    assert os.path.exists("plots/latent_distribution.png")


def test_sdf_slices_and_export_stl(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import importlib

    import create_plot

    importlib.reload(create_plot)
    from shapegan_tpu import checkpoints
    from shapegan_tpu.core.config import TrainConfig
    from shapegan_tpu.models import LATENT_CODES_FILENAME
    from shapegan_tpu.models.sdf_net import SDFNet

    # fabricate an sdf_net checkpoint
    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    checkpoints.save(params, "sdf_net", base="models")
    codes = np.random.default_rng(0).normal(0, 0.01, (4, 128)).astype(np.float32)
    checkpoints.save_array(codes, LATENT_CODES_FILENAME, base="models")

    config = TrainConfig(model_dir="models", plot_dir="plots")
    os.makedirs("plots", exist_ok=True)
    create_plot.sdf_slices(["2"], config)
    assert os.path.exists("plots/sdf_slices.png")


@pytest.mark.slow
def test_demo_training_short(tmp_path, monkeypatch):
    """demo_training end-to-end with a handful of steps."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    monkeypatch.setattr(sys, "argv", ["demo_training.py", "nogui", "steps=3"])
    import importlib

    import demo_training

    importlib.reload(demo_training)
    demo_training.main()


def test_demo_sdf_net_mesh_mode_renders_frames(tmp_path, monkeypatch):
    """mode=mesh: grid eval -> marching tetrahedra -> software-rasterized
    frame, end-to-end from a fabricated checkpoint (the reference demo's
    MC+GL animation pipeline, demo_sdf_net.py:13-14, without a display)."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    monkeypatch.setattr(
        sys, "argv",
        ["demo_sdf_net.py", "mode=mesh", "samples=2", "frames_per_transition=1",
         "resolution=96", "voxel_resolution=24"],
    )
    import demo_sdf_net
    from shapegan_tpu import checkpoints
    from shapegan_tpu.models import LATENT_CODES_FILENAME
    from shapegan_tpu.models.sdf_net import SDFNet

    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    checkpoints.save(params, "sdf_net", base="models")
    codes = np.random.default_rng(0).normal(0, 0.01, (4, 128)).astype(np.float32)
    checkpoints.save_array(codes, LATENT_CODES_FILENAME, base="models")

    demo_sdf_net.main()
    frames = sorted(os.listdir("screenshots/sdf_net_animation"))
    assert len(frames) == 2
    from PIL import Image

    img = np.asarray(Image.open(os.path.join("screenshots/sdf_net_animation", frames[0])))
    assert img.shape == (96, 96, 3)


def test_demo_sdf_net_raymarch_frame_parallel(tmp_path, monkeypatch):
    """demo_sdf_net mode=raymarch takes the frame-parallel branch on the
    multi-device test mesh and writes every frame."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    import demo_sdf_net
    from shapegan_tpu import checkpoints
    from shapegan_tpu.models import LATENT_CODES_FILENAME
    from shapegan_tpu.models.sdf_net import SDFNet

    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    checkpoints.save(params, "sdf_net", base="models")
    codes = np.random.default_rng(0).normal(0, 0.01, (3, 128)).astype(np.float32)
    checkpoints.save_array(codes, LATENT_CODES_FILENAME, base="models")

    assert len(jax.local_devices()) > 1  # conftest forces the 8-device mesh
    monkeypatch.setattr(
        sys, "argv",
        ["demo_sdf_net.py", "mode=raymarch", "samples=2",
         "frames_per_transition=2", "resolution=16"],
    )
    demo_sdf_net.main()
    frames = sorted(os.listdir("screenshots/sdf_net_animation"))
    assert frames == [f"frame-{i:05d}.png" for i in range(4)]
