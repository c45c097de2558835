"""Fused Pallas kernels under interpret mode (runs on the CPU test platform;
the same kernels are exercised compiled on TPU by bench.py and the trainers)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from shapegan_tpu.ops import sdf_mlp
from shapegan_tpu.ops.coords import voxel_coordinates
from shapegan_tpu.ops.sdf_mlp_pallas import (
    apply_grid_fused,
    apply_grid_trainable,
    apply_points_fused,
)


def test_fused_forward_matches_xla_interpreted():
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    grid = jnp.asarray(voxel_coordinates(8))  # 512 points = 1 tile
    lats = jax.random.normal(jax.random.PRNGKey(1), (2, 128))
    expected = np.asarray(sdf_mlp.apply_grid(params, grid, lats, dtype=jnp.bfloat16))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(apply_grid_fused(params, grid, lats))
    np.testing.assert_allclose(out, expected, atol=2e-2)


def test_fused_forward_multitile_interpreted():
    # 16^3 = 4096 points = 8 tiles of 512: covers the cross-grid-step
    # paths (per-tile output stripes, padded tail) the 1-tile test misses.
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    grid = jnp.asarray(voxel_coordinates(16))
    lats = jax.random.normal(jax.random.PRNGKey(1), (3, 128))
    expected = np.asarray(sdf_mlp.apply_grid(params, grid, lats, dtype=jnp.bfloat16))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(apply_grid_fused(params, grid, lats))
    np.testing.assert_allclose(out, expected, atol=2e-2)


def test_points_kernel_matches_xla_interpreted():
    """The single-shape points kernel (in-kernel fan-in projections — the
    raymarch hot path) against the XLA bf16 reference, including a padded
    tail and the latent-folded L=0 form."""
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(3), (3000, 3), minval=-1, maxval=1)
    lat = jax.random.normal(jax.random.PRNGKey(1), (128,))
    expected = np.asarray(
        sdf_mlp.apply_grid(params, pts, lat[None, :], dtype=jnp.bfloat16)
    )
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(apply_points_fused(params, pts, lat, tile=1024))
    np.testing.assert_allclose(out, expected, atol=2e-2)

    folded = sdf_mlp.fold_latent(params, lat)
    with pltpu.force_tpu_interpret_mode():
        out_folded = np.asarray(
            apply_points_fused(folded, pts, jnp.zeros(0, jnp.float32), tile=1024)
        )
    np.testing.assert_allclose(out_folded, expected, atol=2e-2)


def test_stash_forward_matches_fused_interpreted():
    """The stash forward must produce the same outputs as the plain fused
    forward (same batch-stacked math; the stash writes are side outputs)."""
    from shapegan_tpu.ops.sdf_mlp_pallas import _stash_fwd_call

    params = sdf_mlp.init(jax.random.PRNGKey(0))
    grid = jnp.asarray(voxel_coordinates(16))  # multi-tile + padded tail path
    lats = jax.random.normal(jax.random.PRNGKey(1), (3, 128))
    with pltpu.force_tpu_interpret_mode():
        expected = np.asarray(apply_grid_fused(params, grid, lats))
        out, stashed = _stash_fwd_call(params, grid, lats, 512, (2, 4, 6))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)
    assert len(stashed) == 3
    for s in stashed:
        assert s.shape == (3, 4096, 256) and s.dtype == jnp.bfloat16
        assert np.asarray(s, np.float32).max() > 0  # relu outputs, non-degenerate


def _vjp_check(res, batch, fused_fn=None):
    """Compare fused-kernel grads against XLA under the right metric.

    Round-2 postmortem: comparing the fused bf16 grads directly against the
    bf16 XLA grads measures the *sum* of two independent bf16 rounding
    errors, which on small cancellation-dominated gradient leaves reads as
    ~100% relative error even when both paths are correct.  The invariant
    that actually holds is: each path's error vs fp32 ground truth is the
    same size (here: fused < 2x XLA-bf16 + 0.02).
    """
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    grid = jnp.asarray(voxel_coordinates(res))
    lats = jax.random.normal(jax.random.PRNGKey(1), (batch, 128))
    cot = jax.random.normal(jax.random.PRNGKey(2), (batch, grid.shape[0]))

    def loss(f):
        return lambda p, g, l: jnp.sum(f(p, g, l) * cot)

    truth = jax.grad(
        loss(lambda p, g, l: sdf_mlp.apply_grid(p, g, l, dtype=jnp.float32)),
        argnums=(0, 1, 2),
    )(params, grid, lats)
    bf16 = jax.grad(
        loss(lambda p, g, l: sdf_mlp.apply_grid(p, g, l, dtype=jnp.bfloat16)),
        argnums=(0, 1, 2),
    )(params, grid, lats)
    with pltpu.force_tpu_interpret_mode():
        fused = jax.grad(loss(fused_fn or apply_grid_trainable),
                         argnums=(0, 1, 2))(params, grid, lats)

    for t, b, f in zip(jax.tree.leaves(truth), jax.tree.leaves(bf16), jax.tree.leaves(fused)):
        t, b, f = np.asarray(t), np.asarray(b), np.asarray(f)
        scale = max(np.abs(t).max(), 1e-6)
        err_bf16 = np.abs(b - t).max() / scale
        err_fused = np.abs(f - t).max() / scale
        assert err_fused < 2.0 * err_bf16 + 0.02, (err_fused, err_bf16)


@pytest.mark.slow
def test_fused_vjp_matches_xla_interpreted():
    _vjp_check(8, 2)


@pytest.mark.slow
def test_fused_vjp_multitile_interpreted():
    # Multi-tile + odd batch: exercises cross-grid-step accumulator flushes
    # (dw/db/dzz blocks with constant index maps + pl.when init).
    _vjp_check(16, 3)


@pytest.mark.slow
def test_stash_vjp_multitile_interpreted():
    # The activation-stash backward under the same error metric, multi-tile
    # so the stashed-block index maps cross grid steps.
    from shapegan_tpu.ops.sdf_mlp_pallas import apply_grid_trainable_stash

    _vjp_check(16, 3, fused_fn=apply_grid_trainable_stash)


def _reference_trace(params, lat, pts, dirs, status, k, *, shadow, threshold,
                     step_clamp, sdf_offset, radius, dtype, escape=None):
    """Per-iteration host loop with the raymarcher's per-dispatch body math
    (render/raymarching.py:_trace_staged make_body)."""
    pts, status = np.asarray(pts, np.float32).copy(), np.asarray(status).copy()
    dirs = np.asarray(dirs, np.float32)
    lim = radius if escape is None else np.asarray(escape, np.float32)
    for _ in range(k):
        active = status == 0
        sdf = np.asarray(
            sdf_mlp.apply_grid(params, jnp.asarray(pts), lat[None, :], dtype=dtype)
        )[0].astype(np.float32) + sdf_offset
        sdf = np.clip(sdf, -step_clamp, step_clamp)
        pts = pts + dirs * np.where(active, sdf, 0.0)[:, None]
        hits = active & (sdf > 0) & (sdf < threshold)
        if shadow:
            misses = active & (pts[:, 1] > lim)
        else:
            misses = active & (np.linalg.norm(pts, axis=1) > radius)
        status = np.where(hits, 1, np.where(misses, 2, status))
    return pts, status


def _trace_fixture(n=1500, seed=4):
    """Inward rays from the unit sphere toward jittered targets, plus a few
    pre-resolved lanes to check HIT/MISS lanes stay frozen."""
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (128,)) * 0.1
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    origins = jax.random.normal(k1, (n, 3))
    origins = origins / jnp.linalg.norm(origins, axis=1, keepdims=True)
    targets = jax.random.uniform(k2, (n, 3), minval=-0.3, maxval=0.3)
    dirs = targets - origins
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    status = jnp.zeros(n, jnp.int32).at[5].set(1).at[11].set(2)
    return params, lat, origins, dirs, status


def test_trace_steps_fused_fp32_interpreted():
    """At fp32 compute the in-kernel trace must reproduce the per-dispatch
    body step for step: same statuses, same positions (both paths are
    f32 matmul + tanh; only summation order differs)."""
    from shapegan_tpu.ops.sdf_mlp_pallas import trace_steps_fused

    params, lat, pts, dirs, status = _trace_fixture()
    kw = dict(shadow=False, threshold=0.005, step_clamp=0.02, sdf_offset=0.0,
              radius=1.0)
    ref_pts, ref_status = _reference_trace(
        params, lat, pts, dirs, status, 12, dtype=jnp.float32, **kw)
    with pltpu.force_tpu_interpret_mode():
        out_pts, out_status = trace_steps_fused(
            params, lat, pts, dirs, status, k=12, tile=1024,
            compute_dtype=jnp.float32, **kw)
    agree = np.mean(np.asarray(out_status) == ref_status)
    assert agree > 0.995, agree  # borderline threshold lanes may flip
    same = np.asarray(out_status) == ref_status
    np.testing.assert_allclose(np.asarray(out_pts)[same], ref_pts[same],
                               atol=1e-4)


def test_trace_steps_fused_shadow_bf16_interpreted():
    """Shadow-kind miss test (y > radius) + bf16 compute: statuses track the
    bf16 per-dispatch reference on nearly all lanes."""
    from shapegan_tpu.ops.sdf_mlp_pallas import trace_steps_fused

    params, lat, pts, dirs, status = _trace_fixture(seed=7)
    # Shadow rays march toward the light (up-ish).
    dirs = jnp.abs(dirs).at[:, 1].set(jnp.abs(dirs[:, 1]) + 0.5)
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    kw = dict(shadow=True, threshold=0.005, step_clamp=0.1, sdf_offset=0.0,
              radius=1.0)
    ref_pts, ref_status = _reference_trace(
        params, lat, pts, dirs, status, 10, dtype=jnp.bfloat16, **kw)
    with pltpu.force_tpu_interpret_mode():
        out_pts, out_status = trace_steps_fused(
            params, lat, pts, dirs, status, k=10, tile=1024, **kw)
    agree = np.mean(np.asarray(out_status) == ref_status)
    assert agree > 0.97, agree
    # Pre-resolved lanes must not move.
    np.testing.assert_allclose(np.asarray(out_pts)[[5, 11]],
                               np.asarray(pts)[[5, 11]], atol=1e-6)


def _shadow_escape_fixture(n, seed):
    """Upward shadow rays from the upper half of the sphere interior: lanes
    reliably cross y=1.0 and y=1.6 within ~40 clamp-0.1 iterations, so
    per-lane escape heights actually change classifications."""
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (128,)) * 0.1
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    pts = jax.random.uniform(k1, (n, 3), minval=-0.6, maxval=0.6)
    pts = pts.at[:, 1].set(jax.random.uniform(k2, (n,), minval=0.0, maxval=0.5))
    dirs = jnp.concatenate(
        [pts[:, :1] * 0.2, jnp.ones((n, 1)), pts[:, 2:] * 0.2], axis=1
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    status = jnp.zeros(n, jnp.int32)
    escape = jnp.where(jnp.arange(n) % 2 == 0, 1.0, 1.6).astype(jnp.float32)
    return params, lat, pts, dirs, status, escape


def test_trace_steps_fused_per_lane_escape_interpreted():
    """Shadow lanes carry per-lane escape heights (points row 3): lanes with
    a low ceiling MISS earlier (lower final y) than lanes with a high one,
    tracking the per-dispatch reference body given the same escape array.
    sdf_offset=0.15 saturates the +0.1 step clamp so every lane marches
    upward deterministically (the random-init net's own sdf is near zero)."""
    from shapegan_tpu.ops.sdf_mlp_pallas import trace_steps_fused

    params, lat, pts, dirs, status, escape = _shadow_escape_fixture(512, seed=3)
    kw = dict(shadow=True, threshold=0.005, step_clamp=0.1, sdf_offset=0.15,
              radius=1.0)
    ref_pts, ref_status = _reference_trace(
        params, lat, pts, dirs, status, 40, dtype=jnp.float32,
        escape=np.asarray(escape), **kw)
    with pltpu.force_tpu_interpret_mode():
        out_pts, out_status = trace_steps_fused(
            params, lat, pts, dirs, status, k=40, tile=512,
            compute_dtype=jnp.float32, escape=escape, **kw)
    ref_status = np.asarray(ref_status)
    assert (ref_status == 2).mean() > 0.9  # the fixture must actually escape
    agree = np.mean(np.asarray(out_status) == ref_status)
    assert agree > 0.995, agree
    same = np.asarray(out_status) == ref_status
    np.testing.assert_allclose(np.asarray(out_pts)[same], ref_pts[same],
                               atol=1e-4)
    # The escape band must actually bite: high-ceiling lanes march past the
    # low ceiling before missing.
    y = np.asarray(out_pts)[:, 1]
    missed = np.asarray(out_status) == 2
    low, high = missed & (np.arange(512) % 2 == 0), missed & (np.arange(512) % 2 == 1)
    assert (y[low] <= 1.0 + 0.11).all()
    assert (y[high] > 1.6).mean() > 0.9


def test_trace_staged_shadow_escape_cpu_path():
    """The staged XLA path (compaction gathers the escape array alongside the
    lane state) matches the per-dispatch reference given per-lane escapes."""
    from shapegan_tpu.render import raymarching as rm

    params, lat, pts, dirs, status, escape = _shadow_escape_fixture(4096, seed=12)
    ref_pts, ref_status = _reference_trace(
        params, lat, pts, dirs, status, 60, dtype=jnp.float32,
        shadow=True, threshold=0.005, step_clamp=0.1, sdf_offset=0.15,
        radius=1.0, escape=np.asarray(escape))
    # After the 30-iteration first stage most lanes have escaped (≤ ~17
    # saturated steps to 1.6 from this fixture), so the n/2 bucket cannot
    # overflow and the compaction gather itself is what's under test.
    out_pts, out_status = rm._trace_staged(
        "shadow", params, lat, pts, dirs, status, 60,
        0.005, 0.1, 0.15, 1.0, ((30, 2048),), escape=escape)
    ref_status = np.asarray(ref_status)
    assert (ref_status == 2).mean() > 0.9  # the fixture must actually escape
    agree = np.mean(np.asarray(out_status) == ref_status)
    assert agree > 0.99, agree
    same = np.asarray(out_status) == ref_status
    np.testing.assert_allclose(np.asarray(out_pts)[same],
                               np.asarray(ref_pts)[same], atol=1e-4)


def test_trace_staged_fused_wiring_interpreted():
    """The raymarcher's fused-gate wiring end-to-end: _trace_staged with the
    TPU gate forced on (schedule stage -> compaction -> chunked while tail,
    all through trace_steps_fused) tracks the per-dispatch path's statuses.
    Guards the gate plumbing, not just the kernel."""
    import unittest.mock as mock

    from shapegan_tpu.render import raymarching as rm

    params, lat, pts, dirs, status = _trace_fixture(n=4096, seed=9)
    args = ("primary", params, lat, pts, dirs, status, 51,
            0.005, 0.02, 0.0, 1.0, ((6, 2048),))

    with pltpu.force_tpu_interpret_mode():
        ref_pts, ref_status = rm._trace_staged(*args)  # gate off on CPU
        with mock.patch.object(jax, "default_backend", return_value="tpu"):
            out_pts, out_status = rm._trace_staged(*args)

    ref_status, out_status = np.asarray(ref_status), np.asarray(out_status)
    assert (ref_status != 0).mean() > 0.5  # the fixture must actually resolve
    agree = np.mean(out_status == ref_status)
    assert agree > 0.97, agree
    hit_both = (out_status == 1) & (ref_status == 1)
    np.testing.assert_allclose(np.asarray(out_pts)[hit_both],
                               np.asarray(ref_pts)[hit_both], atol=0.02)


def test_rowwise_forward_matches_xla_interpreted():
    """The per-point-latent (autodecoder) fused forward against the XLA bf16
    reference (ops/sdf_mlp.apply), including a padded tail."""
    from shapegan_tpu.ops.sdf_mlp_pallas import apply_rowwise

    params = sdf_mlp.init(jax.random.PRNGKey(0))
    n = 3000  # 3 tiles of 1024 with a padded tail
    pts = jax.random.uniform(jax.random.PRNGKey(3), (n, 3), minval=-1, maxval=1)
    lats = jax.random.normal(jax.random.PRNGKey(1), (n, 128)) * 0.1
    expected = np.asarray(sdf_mlp.apply(params, pts, lats, dtype=jnp.bfloat16))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(apply_rowwise(params, pts, lats))
    np.testing.assert_allclose(out, expected, atol=2e-2)


@pytest.mark.slow
def test_rowwise_vjp_matches_xla_interpreted():
    """Rowwise fused grads vs fp32 ground truth, on the autodecoder's actual
    loss shape (table gather + L1 + latent reg) so the latent-TABLE cotangent
    (scatter-add through the gather transpose of the kernel's per-row dzz
    outputs) is exercised, not just the per-row grads. Same error metric as
    _vjp_check: each bf16 path's error vs fp32 truth is comparable."""
    from shapegan_tpu.ops.sdf_mlp_pallas import apply_rowwise

    params = sdf_mlp.init(jax.random.PRNGKey(0))
    n, models = 2048 + 512, 6  # padded tail + multi-tile accumulator flushes
    pts = jax.random.uniform(jax.random.PRNGKey(3), (n, 3), minval=-1, maxval=1)
    table = jax.random.normal(jax.random.PRNGKey(1), (models, 128)) * 0.1
    idx = jax.random.randint(jax.random.PRNGKey(4), (n,), 0, models)
    target = jax.random.uniform(jax.random.PRNGKey(5), (n,), minval=-0.1, maxval=0.1)

    def loss(f):
        def fn(p, c):
            out = f(p, pts, c[idx])
            return jnp.mean(jnp.abs(out - target)) + 0.01 * jnp.mean(c[idx] ** 2)

        return fn

    truth = jax.grad(
        loss(lambda p, q, z: sdf_mlp.apply(p, q, z, dtype=jnp.float32)),
        argnums=(0, 1),
    )(params, table)
    bf16 = jax.grad(
        loss(lambda p, q, z: sdf_mlp.apply(p, q, z, dtype=jnp.bfloat16)),
        argnums=(0, 1),
    )(params, table)
    with pltpu.force_tpu_interpret_mode():
        fused = jax.grad(loss(apply_rowwise), argnums=(0, 1))(params, table)

    for t, b, f in zip(jax.tree.leaves(truth), jax.tree.leaves(bf16), jax.tree.leaves(fused)):
        t, b, f = np.asarray(t), np.asarray(b), np.asarray(f)
        scale = max(np.abs(t).max(), 1e-6)
        err_bf16 = np.abs(b - t).max() / scale
        err_fused = np.abs(f - t).max() / scale
        assert err_fused < 2.0 * err_bf16 + 0.02, (err_fused, err_bf16)


def test_point_generator_fused_matches_flax_interpreted():
    """ops/point_gen_pallas.generate_fused vs SDFGenerator.apply (bf16
    dtype): in-kernel fp32 LayerNorm, additive latents at layers 0 and n/2,
    positional-skip fan-in split, raw head. Multi-tile + multi-item so the
    per-item zz index map (j // tiles_per_item) is exercised."""
    from shapegan_tpu.models.point_sdf_net import SDFGenerator
    from shapegan_tpu.ops.point_gen_pallas import generate_fused

    gen = SDFGenerator(dtype=jnp.bfloat16)
    pos = jax.random.uniform(jax.random.PRNGKey(0), (3, 1024, 3),
                             minval=-1, maxval=1)
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 128))
    params = gen.init(jax.random.PRNGKey(2), pos, z)["params"]
    expected = np.asarray(gen.apply({"params": params}, pos, z))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(generate_fused(params, pos, z, tile=512))
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, atol=2e-2)
    # distinct items produce distinct clouds (zz row selection is per-item)
    assert np.abs(out[0] - out[1]).max() > 1e-3
