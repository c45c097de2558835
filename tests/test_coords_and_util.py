"""Coordinate conventions, utility functions, loss semantics."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from shapegan_tpu.ops.coords import (
    voxel_coordinates,
    voxel_coordinate_grid,
    unit_sphere_mask,
    sample_unit_sphere,
)
from shapegan_tpu.ops.losses import (
    sdf_reconstruction_loss,
    kld_loss,
    bce_loss,
    voxel_sign_difference,
    gradient_penalty,
)
from shapegan_tpu.util import create_text_slice, get_points_in_unit_sphere, crop_image


def reference_voxel_coordinates(resolution, size=1, center=0):
    """Direct transcription of the reference algorithm's *semantics*
    (meshgrid xy + swapaxes == 'ij'), used as the golden value."""
    if isinstance(center, (int, float)):
        center = (center,) * 3
    points = np.meshgrid(
        np.linspace(center[0] - size, center[0] + size, resolution),
        np.linspace(center[1] - size, center[1] + size, resolution),
        np.linspace(center[2] - size, center[2] + size, resolution),
    )
    points = np.stack(points)
    points = np.swapaxes(points, 1, 2)
    return points.reshape(3, -1).transpose().astype(np.float32)


def test_voxel_coordinates_matches_reference_semantics():
    for res in (4, 8, 17):
        ours = voxel_coordinates(res)
        ref = reference_voxel_coordinates(res)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_voxel_coordinates_x_major_order():
    pts = voxel_coordinates(4)
    # last axis (z) varies fastest
    assert pts[0, 2] != pts[1, 2]
    assert pts[0, 0] == pts[1, 0] == pts[3, 0]
    grid = voxel_coordinate_grid(4)
    np.testing.assert_allclose(grid[1, 0, 0], [-1 + 2 / 3, -1, -1], atol=1e-6)
    np.testing.assert_allclose(grid[0, 0, 1], [-1, -1, -1 + 2 / 3], atol=1e-6)


def test_unit_sphere_mask():
    mask = unit_sphere_mask(16, radius=1.1)
    pts = voxel_coordinates(16)
    inside = np.linalg.norm(pts, axis=1) < 1.1
    np.testing.assert_array_equal(mask.reshape(-1), inside)
    assert mask[8, 8, 8]
    assert not mask[0, 0, 0]  # the corner (-1,-1,-1) has norm sqrt(3) > 1.1


def test_sample_unit_sphere_uniformity():
    pts = np.asarray(sample_unit_sphere(jax.random.PRNGKey(0), 20000))
    r = np.linalg.norm(pts, axis=1)
    assert r.max() <= 1.0 + 1e-5
    # For uniform ball, E[r] = 3/4 and half the mass is inside r = 2^(-1/3).
    assert abs(r.mean() - 0.75) < 0.01
    assert abs((r < 0.5 ** (1 / 3)).mean() - 0.5) < 0.02


def test_points_in_unit_sphere_host():
    pts = get_points_in_unit_sphere(1000, np.random.default_rng(0))
    assert pts.shape == (1000, 3)
    assert np.linalg.norm(pts, axis=1).max() < 1.0


def test_text_slice_shows_sphere():
    from shapegan_tpu.data.synthetic import sphere_sdf

    pts = voxel_coordinate_grid(32)
    sdf = sphere_sdf(pts, radius=0.6) / 0.1
    text = create_text_slice(np.clip(sdf, -1, 1))
    assert "#" in text  # interior renders solid
    assert text.count("|") > 10
    lines = text.splitlines()
    assert lines[0].startswith("+") and lines[-1].startswith("+")


def test_crop_image_square():
    img = np.full((400, 500), 255, dtype=np.uint8)
    img[50:350, 100:400] = 0
    out = crop_image(img)
    assert out.shape[0] == out.shape[1]
    assert (out == 0).any()


def test_reconstruction_loss_weighting():
    target = jnp.array([-0.5, 0.5])
    output = jnp.array([0.5, -0.5])
    # diff = 1 in both; occupied (target<0) weighted 32 -> mean = (32+1)/2
    loss = sdf_reconstruction_loss(output, target)
    np.testing.assert_allclose(float(loss), (32 + 1) / 2, rtol=1e-6)


def test_kld_loss_zero_at_standard_normal():
    mean = jnp.zeros((4, 8))
    logvar = jnp.zeros((4, 8))
    assert float(kld_loss(mean, logvar)) == 0.0
    assert float(kld_loss(jnp.ones((4, 8)), logvar)) > 0.0


def test_bce_matches_formula():
    p = jnp.array([0.9, 0.1])
    t = jnp.array([1.0, 0.0])
    expected = -np.mean([np.log(0.9), np.log(0.9)])
    np.testing.assert_allclose(float(bce_loss(p, t)), expected, rtol=1e-3)


def test_voxel_sign_difference():
    out = jnp.array([1.0, -1.0, 1.0, -1.0])
    tgt = jnp.array([1.0, 1.0, -1.0, -1.0])
    np.testing.assert_allclose(float(voxel_sign_difference(out, tgt)), 0.5)


def test_gradient_penalty_linear_critic():
    # critic(x) = sum(2 * x) has gradient 2 everywhere -> per-sample norm
    # = 2 * sqrt(dim); penalty = w * (2*sqrt(dim) - 1)^2.
    dim = 4
    real = jnp.ones((3, dim))
    fake = jnp.zeros((3, dim))
    gp = gradient_penalty(lambda x: 2.0 * jnp.sum(x, axis=1), jax.random.PRNGKey(0), real, fake, weight=10.0)
    expected = 10.0 * (2.0 * np.sqrt(dim) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), expected, rtol=1e-4)


def test_gradient_penalty_is_differentiable():
    # grad-of-grad must compile: differentiate the GP w.r.t. critic params.
    def critic(w, x):
        return jnp.tanh(x @ w).sum(axis=1)

    w = jnp.ones((4, 2)) * 0.1
    real = jax.random.normal(jax.random.PRNGKey(1), (3, 4))
    fake = jax.random.normal(jax.random.PRNGKey(2), (3, 4))

    def loss(w):
        return gradient_penalty(lambda x: critic(w, x), jax.random.PRNGKey(0), real, fake)

    g = jax.jit(jax.grad(loss))(w)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_cli_cpu_token_parses():
    """The `cpu` token pins the backend (a no-op warning under the test
    platform, which is already CPU) and round-trips through parse_cli."""
    from shapegan_tpu.core.config import parse_cli

    cfg = parse_cli(["nogui", "cpu", "epochs=1"])
    assert cfg.cpu and cfg.nogui and cfg.epochs == 1
    assert parse_cli(["nogui"]).cpu is False


@pytest.mark.slow
def test_cli_cpu_token_rescues_trainer_subprocess(tmp_path):
    """`cpu` must pin the backend BEFORE the first backend touch even when a
    sitecustomize hook force-selects an accelerator platform whose endpoint
    may be unreachable (observed: a dead remote-TPU tunnel hangs
    jax.devices() forever; the flag is the documented escape hatch)."""
    import subprocess
    import sys

    result = subprocess.run(
        [sys.executable, "/root/repo/train_sdf_autodecoder.py",
         "nogui", "synthetic=4", "epochs=1", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=tmp_path,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Epoch 0" in result.stdout
