"""Sphere-traced raymarching against the implicit SDF network.

Behavioral parity with /root/reference/rendering/raymarching.py: fixed camera
(distance 2.2, yaw 147°, pitch 20°) and light (distance 6, 164°, 50°),
analytic ray/unit-sphere entry, iterative SDF stepping with step clamp ±0.02,
autograd surface normals, 200-step shadow rays, diffuse/specular(p20)/rim(p4)
shading, ground-plane shadows, SSAA downsampling.

TPU-native render pipeline
--------------------------
The reference compacts active rays with fancy indexing every iteration
(raymarching.py:112-117) and shades on the host — dynamic shapes and ~30
device round trips per frame. Here the ENTIRE frame is one jitted device
program (`_render_pixels`): ray generation, the primary trace, surface
normals (reverse-mode through the fused kernel), shadow rays, shading, and
the ground-shadow pass all stay on device; only the final uint8 pixel block
crosses the host link. Within a trace:

  * staged `lax.fori_loop`s advance all lanes with convergence handled by
    masking (finished lanes ride at zero step);
  * on-device compaction (`jnp.nonzero(active, size=n//k)`) gathers
    survivors into static smaller buckets between stages (truncated
    stragglers keep their ACTIVE status, which — like budget exhaustion in
    the reference :122 — renders as a hit at the current point);
  * a `lax.while_loop` with an any-active early-exit predicate runs the
    long tail, capped at TAIL_ITERS once the schedule establishes the
    oscillator plateau (see the constants note below);
  * the frame's single latent code is folded into the MLP biases up front
    (ops/sdf_mlp.fold_latent), so every evaluation runs the latent-free
    network.

Measured at the reference settings (800², ssaa 2, ≤1000 iterations, shadow
rays + ground shadows) through the same remote TPU link: 33.5 s/frame with
round 1's host-compaction loop → 7.5 s with round 2's single-dispatch
pipeline → round 3: 2.x s via (a) the single-shape points kernel with
in-kernel fan-in projections (ops/sdf_mlp_pallas.apply_points_fused — the
B=1 grid kernel streamed 512 B/point of pre-projections per trace
iteration; 134 → 160 M pts/s), (b) decay-measured compaction schedules for
both the primary and shadow traces (85n and 22n evaluations/frame; exact
iter-0 compaction of never-entered lanes), (c) the oscillator tail cap,
(d) the latent fold, and (e) the on-device Lanczos-3 SSAA downsample
(only the final frame crosses the ~25 MB/s link).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


from shapegan_tpu.render.camera import camera_position_from_transform, get_camera_transform
from shapegan_tpu.util import ensure_directory

# Compaction schedule constants, tuned against the measured live-lane decay
# of the primary trace (bench_profile.py raymarch=1, chair @400²):
# entered 78%; active 54% @40 iters, 21% @80, 13.6% @100, then a hard
# plateau at ~13.2% — surface OSCILLATORS: lanes stepping across the
# zero-crossing whose sdf never lands in the strict hit window
# (0 < sdf < threshold). Their positions converge within ~50 further
# iterations; between iters 200 and 500 only ~0.02% of lanes resolve. The
# reference burns its full 1000-iteration budget on them
# (raymarching.py:122 counts exhaustion as a hit); we cap the post-schedule
# tail at TAIL_ITERS instead — same classification, positions converged,
# ~1.7x fewer primary evaluations per frame.
STAGE_ITERS = 100  # legacy first-stage budget (kept for small-n traces)
TAIL_ITERS = 120
# A/B switch for the rejected fused in-kernel trace path (see the note in
# _trace_staged; flip only to re-measure).
_FORCE_FUSED_TRACE = False


def camera_rays(camera_position, size, radius=1.0, xp=np, basis=None):
    """Per-pixel camera rays + analytic unit-sphere entry (reference
    raymarching.py:68-98) — THE ray-setup used by `_render_pixels`, shared
    with `_shadow_mask_capacity_cached` and bench_profile's decay/stage
    harnesses so the geometric bounds derived from the ray setup can never
    silently drift from the renderer's own.

    ``xp`` selects numpy (host) or jax.numpy (traced); ``basis`` optionally
    supplies (right, up, forward) — derived from the camera position when
    omitted. Returns (points, directions, entered): sphere entry points
    [n, 3] (the camera position where the ray misses), unit ray directions
    [n, 3], and the entered mask [n]."""
    cam = xp.asarray(camera_position)
    if basis is None:
        fwd = -cam / xp.linalg.norm(cam)
        right = xp.cross(fwd, xp.asarray([0.0, 1.0, 0.0], dtype=cam.dtype))
        right = right / xp.linalg.norm(right)
        up = xp.cross(fwd, right)
        up = up / xp.linalg.norm(up)
    else:
        right, up, fwd = (xp.asarray(b) for b in basis)
    lin = xp.linspace(-1.0, 1.0, size, dtype=cam.dtype)
    u, v = xp.meshgrid(lin, lin)
    uv = xp.stack([u.reshape(-1), v.reshape(-1)], axis=1)
    focal = 1.0 / xp.tan(xp.arcsin(radius / xp.linalg.norm(cam)))
    directions = (
        uv[:, 0:1] * right[None, :]
        + uv[:, 1:2] * up[None, :]
        + focal * fwd[None, :]
    )
    directions = directions / xp.linalg.norm(directions, axis=1, keepdims=True)
    b = 2.0 * (directions @ cam)
    disc = b * b - 4.0 * (cam @ cam - radius * radius)
    entered = disc >= 0
    dist = xp.where(entered, (-b - xp.sqrt(xp.maximum(disc, 0.0))) / 2.0, 0.0)
    points = cam[None, :] + directions * dist[:, None]
    return points, directions, entered


def get_default_coordinates():
    camera_position = camera_position_from_transform(get_camera_transform(2.2, 147, 20))
    light_position = camera_position_from_transform(get_camera_transform(6, 164, 50))
    return camera_position, light_position


CAMERA_POSITION, LIGHT_POSITION = get_default_coordinates()

# Trace-state hit codes.
_ACTIVE, _HIT, _MISS = 0, 1, 2


def _trace_staged(kind, params, latent, points, directions, status, budget,
                  threshold, step_clamp, sdf_offset, radius, schedule,
                  tail_cap=None, escape=None):
    """Trace rays to completion on device. ``schedule`` is a static tuple of
    (iterations, bucket_size): after each stage's masked iterations the
    surviving ACTIVE lanes are compacted into a ``bucket_size`` bucket; the
    final stage is an early-exit while_loop, bounded by ``tail_cap`` when
    given (the oscillator cap — see TAIL_ITERS). Returns (points, status).

    kind: 'primary' rays terminate (miss) outside the bounding sphere;
    'shadow' rays terminate above y=radius — or above the per-lane height
    ``escape`` [n] when given (the merged in-frame shadow pass escapes model
    lanes at the caller's radius but ground lanes at 1.0, matching the
    reference's two get_shadows calls: raymarching.py:134 passes
    radius=radius, :165 leaves the 1.0 default)."""
    from shapegan_tpu.ops.sdf_mlp_pallas import apply_grid_best, trace_steps_fused

    # Trace iterations run as an XLA fori/while loop around the points
    # kernel, NOT through ops/sdf_mlp_pallas.trace_steps_fused. The fused
    # in-kernel trace (each ray tile resident in VMEM for all K iterations)
    # was wired in round 3 on the theory that per-iteration lane-state HBM
    # traffic bounded the trace — but at trace widths the lane state is only
    # ~16 B/eval ≈ 2.4 GB/s against ~800 GB/s of HBM, and a value-pull
    # re-measurement (round 4, k=20, widths 0.5–2 M) showed the XLA loop at
    # 140–152 M evals/s vs the fused kernel's 88–92 M: the round-3 "win" was
    # an artifact of the block_until_ready warm-up bleeding into the timed
    # window (bench.py methodology note). The kernel stays available (tests
    # + bench_profile) as a documented rejected experiment, selectable here
    # for A/B via _FORCE_FUSED_TRACE.
    fused = _FORCE_FUSED_TRACE and jax.default_backend() == "tpu" \
        and points.shape[0] >= 2048
    trace_kw = dict(shadow=kind == "shadow", threshold=threshold,
                    step_clamp=step_clamp, sdf_offset=sdf_offset, radius=radius)

    def make_body(dirs, esc):
        def body(points, status):
            active = status == _ACTIVE
            sdf = apply_grid_best(params, points, latent[None, :])[0] + sdf_offset
            sdf = jnp.clip(sdf, -step_clamp, step_clamp)
            points = points + dirs * jnp.where(active, sdf, 0.0)[:, None]
            hits = active & (sdf > 0) & (sdf < threshold)
            if kind == "shadow":
                misses = active & (points[:, 1] > (radius if esc is None else esc))
            else:
                misses = active & (jnp.linalg.norm(points, axis=1) > radius)
            status = jnp.where(hits, _HIT, jnp.where(misses, _MISS, status))
            return points, status

        return body

    def run_fori(k, points, dirs, status, esc):
        if k == 0:
            # Zero-iteration stages exist only to trigger compaction; the
            # fused kernel would pay a full lane-state HBM round trip to
            # return its inputs.
            return points, status
        if fused:
            return trace_steps_fused(params, latent, points, dirs, status,
                                     k=k, escape=esc, **trace_kw)
        body = make_body(dirs, esc)
        return jax.lax.fori_loop(0, k, lambda _, s: body(*s), (points, status))

    def run_while(b, points, dirs, status, esc):
        if fused:
            # Early-exit at chunk granularity: full in-kernel chunks under a
            # while_loop, then the static remainder (the any-active test
            # needs lane state back in HBM, so per-iteration exit would
            # forfeit the kernel's VMEM residency).
            chunk = 20
            full = b // chunk

            def cond(s):
                return (s[0] < full) & jnp.any(s[2] == _ACTIVE)

            def chunk_body(s):
                i, pts, st = s
                pts, st = trace_steps_fused(params, latent, pts, dirs, st,
                                            k=chunk, escape=esc, **trace_kw)
                return i + 1, pts, st

            _, points, status = jax.lax.while_loop(
                cond, chunk_body, (0, points, status))
            if b % chunk:
                points, status = trace_steps_fused(
                    params, latent, points, dirs, status, k=b % chunk,
                    escape=esc, **trace_kw)
            return points, status
        body = make_body(dirs, esc)
        _, points, status = jax.lax.while_loop(
            lambda s: (s[0] < b) & jnp.any(s[2] == _ACTIVE),
            lambda s: (s[0] + 1,) + body(s[1], s[2]),
            (0, points, status),
        )
        return points, status

    if budget <= 0:
        return points, status
    if not schedule:
        if tail_cap is not None:
            budget = min(budget, tail_cap)
        return run_while(budget, points, directions, status, escape)

    (k, size), rest = schedule[0], schedule[1:]
    k = min(k, budget)
    points, status = run_fori(k, points, directions, status, escape)
    budget -= k
    if budget <= 0:
        return points, status

    n = points.shape[0]
    size = max(512, min(size, n))
    if size >= n:
        return _trace_staged(kind, params, latent, points, directions, status,
                             budget, threshold, step_clamp, sdf_offset, radius, rest,
                             tail_cap, escape)

    # Compact ACTIVE lanes into the static bucket. Overflow lanes (rare
    # grazers beyond `size`) keep riding as ACTIVE in the source arrays and
    # fall out as hits, exactly like budget exhaustion.
    #
    # TPU random gathers/scatters run at a fixed ~15-25 ns *per row*
    # regardless of row width (measured: a 2 M-row gather costs ~30 ms from
    # (n,), (n,3) and (n,8) sources alike), so the lane payload is packed
    # into ONE array each way — a single gather of [n, 6|7] down and a
    # single scatter of [size, 4] back — instead of per-array transfers
    # (which made each compaction ~240 ms and dominated the whole trace).
    # status rides the scatter as a float lane (arithmetic cast: 0/1/2 are
    # exactly representable, and unlike a bitcast they can't be flushed as
    # denormals by a future XLA canonicalization pass).
    idx = jnp.nonzero(status == _ACTIVE, size=size, fill_value=n)[0]
    payload = [points, directions] if escape is None else \
        [points, directions, escape[:, None]]
    sub = jnp.take(jnp.concatenate(payload, axis=1), idx, axis=0,
                   mode="fill", fill_value=0.0)
    # Fill lanes start as MISS, so their (0,0,0) point/direction is inert.
    pts_c, dirs_c = sub[:, :3], sub[:, 3:6]
    esc_c = None if escape is None else sub[:, 6]
    status_c = jnp.where(idx < n, _ACTIVE, _MISS)

    pts_c, status_c = _trace_staged(kind, params, latent, pts_c, dirs_c, status_c,
                                    budget, threshold, step_clamp, sdf_offset, radius, rest,
                                    tail_cap, esc_c)

    # Fill lanes carry idx == n and are dropped by the scatter.
    as_f32 = lambda s: s.astype(jnp.float32)[:, None]
    dest = jnp.concatenate([points, as_f32(status)], axis=1).at[idx].set(
        jnp.concatenate([pts_c, as_f32(status_c)], axis=1), mode="drop")
    return (
        dest[:, :3],
        dest[:, 3].astype(jnp.int32),
    )


def _default_schedule(kind, n, iterations):
    """Compaction schedule sized against the measured live-lane decay (see
    the TAIL_ITERS note): bucket sizes carry 1.4-2.4x headroom over the
    chair's measured active fractions so shape variation doesn't overflow
    (overflow degrades conservatively to hit-at-current-point)."""
    if n <= 2048 or iterations <= STAGE_ITERS:
        return ()
    if kind == "shadow":
        # Shadow rays re-hit within a few steps or escape at the 0.1 clamp
        # in ~20-40 steps; compact early.
        return ((40, -(-n // 4)),)
    # Primary, sized from the measured decay (bench_profile raymarch=1:
    # entered 78%, active 55% @40 / 38% @60 / 23% @80 / 15% @100, plateau
    # 15.0%) with ~1.3x headroom per bucket — except the iter-0 bucket,
    # which is exact: non-entered lanes are deterministic misses of the
    # camera geometry, not shape-dependent. Compaction is NOT free on TPU
    # (one packed gather + scatter ≈ 7-9n evaluations' worth of time —
    # random row transfers cost ~15-25 ns/row regardless of width), so the
    # stage count is chosen against that price: this 3-stage schedule runs
    # ~92n evaluations + 3 compactions/frame, which measures faster than
    # both the round-3 5-stage schedule (~86n + 5 compactions) and any
    # flat-width alternative.
    return (
        (0, -(-n * 4 // 5)),
        (60, -(-n // 2)),
        (40, -(-n // 5)),
    )


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8, 9))
def _trace_rays(kind, params, latent, points, directions, iterations, threshold,
                step_clamp, sdf_offset, radius):
    """Standalone single-dispatch trace over explicit rays (all start ACTIVE)."""
    status = jnp.zeros(points.shape[0], dtype=jnp.int32)
    schedule = _default_schedule(kind, points.shape[0], iterations)
    # The oscillator tail cap is measured (and only justified) for the
    # primary trace; shadow traces keep the reference's full budget —
    # get_shadows parity means exactly 200 iterations (raymarching.py:47).
    return _trace_staged(
        kind, params, latent, points, directions, status, iterations,
        threshold, step_clamp, sdf_offset, radius, schedule,
        tail_cap=TAIL_ITERS if schedule and kind == "primary" else None,
    )


def _bucketed_trace(kind, params, latent, points, directions, iterations, threshold,
                    step_clamp, sdf_offset, radius):
    """Host wrapper: pad rays to a power-of-two bucket (bounded jit cache),
    run the single-dispatch staged trace, unpad. Returns (points, hit)."""
    n = points.shape[0]
    bucket = 1 << max(7, (n - 1).bit_length())
    pad = bucket - n
    pts = np.concatenate(
        [np.asarray(points, np.float32), np.full((pad, 3), 2.0 * radius + 1.0, np.float32)]
    )
    dirs = np.concatenate([np.asarray(directions, np.float32), np.zeros((pad, 3), np.float32)])
    traced, status = _trace_rays(
        kind, params, jnp.asarray(latent), jnp.asarray(pts), jnp.asarray(dirs),
        iterations, threshold, step_clamp, sdf_offset, radius,
    )
    traced = np.asarray(traced[:n])
    status = np.asarray(status[:n])
    # Rays still active after the budget count as hits (reference :122).
    hit = (status == _HIT) | (status == _ACTIVE)
    return traced, hit


def _points_gradient(params, points, latent):
    """∇_p SDF(p, z) for every point, batched: reverse mode through the fused
    custom-VJP kernel on TPU, chunked-remat XLA elsewhere."""
    from shapegan_tpu.ops import sdf_mlp
    from shapegan_tpu.ops.sdf_mlp_pallas import apply_grid_trainable

    if jax.default_backend() == "tpu":
        f = lambda q: jnp.sum(apply_grid_trainable(params, q, latent[None, :]))
    elif points.shape[0] > 2**16:
        f = lambda q: jnp.sum(
            sdf_mlp.apply_grid_remat(params, q, latent[None, :], chunk_size=16384)
        )
    else:
        f = lambda q: jnp.sum(sdf_mlp.apply_grid(params, q, latent[None, :]))
    return jax.grad(f)(points)


def get_normals(net, params, latent_code, points, batch_size: int = 262144):
    result = np.empty((points.shape[0], 3), dtype=np.float32)
    for start in range(0, points.shape[0], batch_size):
        chunk = points[start : start + batch_size]
        result[start : start + chunk.shape[0]] = np.asarray(
            net.get_normals(params, latent_code, chunk)
        )
    return result


def get_shadows(net, params, latent_code, points, light_position, threshold: float = 0.001,
                sdf_offset: float = 0.0, radius: float = 1.0):
    """1.0 where a 200-step ray toward the light re-hits the shape
    (parity with reference get_shadows, raymarching.py:36-64)."""
    if points.shape[0] == 0:
        return np.zeros(0, dtype=np.float32)
    from shapegan_tpu.ops import sdf_mlp

    params = sdf_mlp.fold_latent(params, jnp.asarray(latent_code))
    latent_code = np.zeros(0, np.float32)
    directions = light_position[None, :] - points
    directions = directions / np.linalg.norm(directions, axis=1, keepdims=True)
    start = points + directions * 0.1
    _, hit = _bucketed_trace(
        "shadow", params, latent_code, start, directions,
        iterations=200, threshold=threshold, step_clamp=0.1,
        sdf_offset=sdf_offset, radius=radius,
    )
    return hit.astype(np.float32)


def _shadow_mask_capacity(camera_position, size, radius=1.0):
    """Static upper bound on the shadow mask (model hits ∪ ground lanes) for
    a given camera: lanes that enter the bounding sphere plus lanes pointing
    below the horizontal (model_mask ⊆ entered; ground ⊆ {dir_y < 0}).
    Mirrors _render_pixels' ray setup in numpy — everything depends only on
    (camera, size, radius), so for the fixed-camera render path this is a
    compile-time constant and the shadow pre-compaction bucket can be sized
    to never overflow, for ANY latent/shape (an overflowing first bucket
    mis-shades: overflow lanes are never traced and degrade to shadowed)."""
    cam = np.asarray(camera_position, np.float64)
    return _shadow_mask_capacity_cached(tuple(cam.tolist()), int(size), float(radius))


@functools.lru_cache(maxsize=64)
def _shadow_mask_capacity_cached(camera_position, size, radius):
    # The size²-ray numpy pipeline costs ~100 ms and ~200 MB of temporaries
    # at 1600² — cache per (camera, size, radius) so repeated frames
    # (animations, figure grids) pay it once.
    cam = np.asarray(camera_position, np.float64)
    _, dirs, entered = camera_rays(cam, size, radius=radius, xp=np)
    count = int(np.count_nonzero(entered | (dirs[:, 1] < 0)))
    # The in-graph mask is computed in float32 under jit; rays with disc ≈ 0
    # or dir_y ≈ 0 on the silhouette/horizon can classify differently there
    # than in this float64 host count, so carry 512 lanes of slack before
    # rounding up (<0.1% extra trace width at 800²) — the bound must never
    # undercount, or the overflow lanes silently degrade to shadowed pixels.
    return min(-(-(count + 512) // 512) * 512, size * size)


def _shadow_factor(params, latent, points, mask, light_position, threshold,
                   sdf_offset, radius, first_bucket=None, escape=None):
    """On-device shadow test for the masked lanes: 1.0 where the 200-step ray
    toward the light re-hits the shape (or is still active — reference :122).
    ``escape`` [n] gives each lane its own escape height (model lanes use the
    caller's radius, ground lanes 1.0 — the reference's get_shadows defaults,
    raymarching.py:134,165); scalar ``radius`` is the fallback.

    The masked lanes are PRE-compacted into a 3n/4 bucket (a zero-iteration
    first schedule stage) before any tracing. ``first_bucket`` is the static
    geometric capacity of the mask (see _shadow_mask_capacity — ~0.89n at
    the reference camera; the chair frame fills 0.672n of it): an earlier
    n/2 bucket overflowed ~0.17n lanes into the conservative shadowed
    fallback, which rendered as a flat gray band across the lower frame,
    and any measured-fill bucket (e.g. 3n/4) re-introduces that artifact
    for shapes larger than the one measured. With the geometric bound the
    first stage can never overflow. The iter-20 bucket scales with the
    geometric capacity too (0.7·cap): the chair measures actives@20 =
    0.565× its mask fill, so a shape filling the whole geometric mask
    projects to ~0.57·cap actives — a fixed n/2 bucket had ZERO headroom
    there, while 0.7·cap keeps ≥1.2x for capacity-filling shapes (1.6x on
    the chair) at ~1.2n extra evaluations. The later buckets follow the
    measured decay at clamp 0.1 — a cliff to 0.015n @30 and a 0.006n
    plateau — with 4x+ headroom (generous around the cliff, whose onset
    iteration is shape-dependent): ~23n evaluations per frame vs 35n
    before."""
    n = points.shape[0]
    directions = light_position[None, :] - points
    directions = directions / jnp.linalg.norm(directions, axis=1, keepdims=True)
    start = points + directions * 0.1
    status = jnp.where(mask, _ACTIVE, _MISS)
    cap = n if first_bucket is None else min(first_bucket, n)
    schedule = () if n <= 2048 else (
        (0, cap),
        (20, -(-cap * 7 // 10)),
        (10, -(-n // 16)),
        (10, -(-n // 64)),
    )
    _, status = _trace_staged(
        "shadow", params, latent, start, directions, status, 200,
        threshold, 0.1, sdf_offset, radius, schedule,
        tail_cap=None, escape=escape,
    )
    return ((status == _HIT) | (status == _ACTIVE)).astype(jnp.float32)


def _lanczos3_downsample(image, factor: int):
    """Separable Lanczos-3 resample for an integer decimation ``factor``
    (the reference's PIL ``Image.LANCZOS`` resize of the SSAA frame,
    raymarching.py:176-177, computed on device so only the final
    [res, res, 3] crosses the host link instead of the ssaa²-times-larger
    SSAA frame). For integer factors every output pixel sees the same
    12·factor/2-tap stencil, so the resample is exactly two strided
    depthwise convolutions; borders use edge replication (PIL renormalizes
    truncated stencils instead — differs only within 3 output pixels of the
    frame edge, which the fixed camera leaves as white background)."""
    s = factor
    c0 = 0.5 * s - 0.5  # source-space center of output pixel 0
    lo = int(math.ceil(c0 - 3 * s))
    hi = int(math.floor(c0 + 3 * s))
    taps = np.arange(lo, hi + 1)
    x = (taps - c0) / s
    w = np.sinc(x) * np.sinc(x / 3.0)
    w = (w / w.sum()).astype(np.float32)

    pad_lo, pad_hi = -lo, hi - (s - 1)
    kern = jnp.asarray(w)

    def along_rows(img):  # [H, W, 3] -> [H/s, W, 3]
        img = jnp.pad(img, ((pad_lo, pad_hi), (0, 0), (0, 0)), mode="edge")
        # [W*3 channels, 1, H] depthwise conv over the row axis.
        t = img.transpose(1, 2, 0).reshape(1, -1, img.shape[0])
        out = jax.lax.conv_general_dilated(
            t, jnp.tile(kern[None, None, :], (t.shape[1], 1, 1)),
            window_strides=(s,), padding="VALID",
            feature_group_count=t.shape[1],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return out.reshape(img.shape[1], img.shape[2], -1).transpose(2, 0, 1)

    image = along_rows(image)
    image = along_rows(image.transpose(1, 0, 2)).transpose(1, 0, 2)
    return image


@functools.partial(
    jax.jit,
    static_argnames=(
        "size", "iterations", "threshold", "sdf_offset", "radius",
        "vertical_cutoff", "color", "ssaa", "shadow_bucket",
    ),
)
def _render_pixels(params, latent, camera_position, camera_right, camera_up,
                   camera_forward, light_position, *, size, iterations, threshold,
                   sdf_offset, radius, vertical_cutoff, color, ssaa=1,
                   shadow_bucket=None):
    """One frame, fully on device: returns [size/ssaa, size/ssaa, 3] uint8
    pixels (the SSAA downsample also runs on device)."""
    from shapegan_tpu.ops import sdf_mlp

    # One fixed code for the whole frame: fold it into the biases so every
    # trace/normal/shadow evaluation runs the latent-free network (~12% fewer
    # trunk FLOPs at L=128 and no latent DMA in the fused kernel).
    params = sdf_mlp.fold_latent(params, latent)
    latent = latent[:0]
    n = size * size
    f32 = jnp.float32

    # Per-pixel rays + analytic sphere entry (reference :68-98), via the
    # shared helper so the shadow-capacity bound sees identical geometry.
    points, ray_directions, entered = camera_rays(
        camera_position, size, radius=radius, xp=jnp,
        basis=(camera_right, camera_up, camera_forward),
    )

    # Primary trace: non-entered lanes start as misses.
    status = jnp.where(entered, _ACTIVE, _MISS)
    primary_schedule = _default_schedule("primary", n, iterations)
    points, status = _trace_staged(
        "primary", params, latent, points, ray_directions, status, iterations,
        threshold, 0.02, sdf_offset, radius, primary_schedule,
        tail_cap=TAIL_ITERS if primary_schedule else None,
    )
    model_mask = (status == _HIT) | (status == _ACTIVE)
    if vertical_cutoff is not None:
        model_mask &= jnp.abs(points[:, 1]) <= vertical_cutoff
    any_hit = jnp.any(model_mask)

    # Surface normals for every lane (cost ≈ 3 forward evals — negligible
    # next to the trace), masked at use sites.
    normal = _points_gradient(params, points, latent)
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=1, keepdims=True), 1e-12)

    # Ground-plane intersection points (reference :156-167), computed up
    # front so model-surface and ground shadow rays run as ONE combined
    # trace: the two lane sets are disjoint per pixel, so merging halves the
    # shadow passes' width-proportional cost. The escape heights differ per
    # lane set — the reference's model-shadow call passes radius=radius
    # (:134) while its ground-shadow call keeps get_shadows' 1.0 default
    # (:165); hybrid figures render with radius=1.6 (create_plot.py), so the
    # merged trace carries a per-lane escape height.
    ground_plane = jnp.min(jnp.where(model_mask, points[:, 1], jnp.inf))
    ground = (ray_directions[:, 1] < 0) & ~model_mask & any_hit
    t = (points[:, 1] - ground_plane) / jnp.where(
        ray_directions[:, 1] < 0, ray_directions[:, 1], -1.0
    )
    g_pts = points - ray_directions * t[:, None]
    near = jnp.sqrt(g_pts[:, 0] ** 2 + g_pts[:, 2] ** 2) < 3
    ground &= near

    shadow_mask = model_mask | ground
    shadow_points = jnp.where(
        model_mask[:, None], points,
        jnp.where(ground[:, None], g_pts, 2.0 + radius),
    )
    # radius is jit-static: at the default 1.0 both lane sets share the
    # scalar escape and the per-lane array (an extra kernel operand) is
    # skipped entirely.
    shadow_escape = None if radius == 1.0 else jnp.where(
        model_mask, jnp.float32(radius), jnp.float32(1.0)
    )
    shadow = _shadow_factor(
        params, latent, shadow_points, shadow_mask, light_position,
        0.001, sdf_offset, radius, first_bucket=shadow_bucket,
        escape=shadow_escape,
    )
    seen_by_light = 1.0 - shadow

    light_direction = light_position[None, :] - points
    light_direction = light_direction / jnp.linalg.norm(light_direction, axis=1, keepdims=True)

    diffuse = jnp.clip(jnp.einsum("ij,ij->i", light_direction, normal), 0, 1) * seen_by_light

    reflect = light_direction - 2.0 * jnp.einsum(
        "ij,ij->i", light_direction, normal
    )[:, None] * normal
    reflect = reflect / jnp.maximum(jnp.linalg.norm(reflect, axis=1, keepdims=True), 1e-12)
    specular = jnp.clip(jnp.einsum("ij,ij->i", reflect, ray_directions), 0, 1)
    specular = jnp.power(specular, 20) * seen_by_light
    rim = 1.0 - jnp.clip(-jnp.einsum("ij,ij->i", normal, ray_directions), 0, 1)
    rim = jnp.power(rim, 4) * 0.3

    shaded = jnp.asarray(color, f32)[None, :] * (diffuse * 0.5 + 0.5)[:, None]
    shaded = shaded + (specular * 0.3 + rim)[:, None]
    pixels = jnp.where(model_mask[:, None], jnp.clip(shaded, 0, 1), 1.0)
    pixels = pixels - jnp.where(ground, (1.0 - 0.65) * shadow, 0.0)[:, None]

    pixels = jnp.clip(pixels, 0.0, 1.0).reshape(size, size, 3)
    if ssaa != 1:
        pixels = jnp.clip(_lanczos3_downsample(pixels, ssaa), 0.0, 1.0)
    return jnp.round(pixels * 255.0).astype(jnp.uint8)


def render_image(
    net,
    params,
    latent_code,
    resolution: int = 800,
    threshold: float = 0.0005,
    sdf_offset: float = 0.0,
    iterations: int = 1000,
    ssaa: int = 2,
    radius: float = 1.0,
    crop: bool = False,
    color=(0.8, 0.1, 0.1),
    vertical_cutoff=None,
):
    """Render one latent code to a PIL image (reference render_image parity).

    The whole frame — rays, trace, normals, shadows, shading, ground pass,
    and the SSAA Lanczos-3 downsample — is a single jitted device dispatch;
    the host only receives the final [resolution, resolution, 3] uint8
    pixels (the ~25 MB/s remote link made fetching the ssaa²-larger SSAA
    frame a measurable share of round-2 frame time)."""
    from PIL import Image

    camera_position = CAMERA_POSITION
    camera_forward = -camera_position / np.linalg.norm(camera_position)
    up = np.array([0.0, 1.0, 0.0])
    camera_right = np.cross(camera_forward, up)
    camera_right /= np.linalg.norm(camera_right)
    camera_up = np.cross(camera_forward, camera_right)
    camera_up /= np.linalg.norm(camera_up)

    size = resolution * ssaa
    # Reference order (raymarching.py:170-177): crop happens at the SSAA
    # frame size and only THEN the image is resized to resolution² — so with
    # crop the on-device downsample must be skipped (downsampling first,
    # cropping a sub-resolution region, and upscaling back would lose the
    # SSAA frame's detail). Without crop the device Lanczos downsample is
    # the same computation with only the final resolution² crossing the link.
    device_ssaa = 1 if (crop and ssaa != 1) else ssaa
    pixels = np.asarray(
        _render_pixels(
            params,
            jnp.asarray(latent_code, dtype=jnp.float32),
            jnp.asarray(camera_position, dtype=jnp.float32),
            jnp.asarray(camera_right, dtype=jnp.float32),
            jnp.asarray(camera_up, dtype=jnp.float32),
            jnp.asarray(camera_forward, dtype=jnp.float32),
            jnp.asarray(LIGHT_POSITION, dtype=jnp.float32),
            size=size,
            iterations=iterations,
            threshold=threshold,
            sdf_offset=sdf_offset,
            radius=radius,
            vertical_cutoff=vertical_cutoff,
            color=tuple(color),
            ssaa=device_ssaa,
            shadow_bucket=_shadow_mask_capacity(camera_position, size, radius),
        )
    )

    if crop:
        from shapegan_tpu.util import crop_image

        pixels = crop_image(pixels / 255.0, background=1)
        pixels = np.uint8(np.round(pixels * 255.0))

    image = Image.fromarray(pixels, "RGB")
    if crop and ssaa != 1:
        # The cropped SSAA-size region downsamples to resolution²; with
        # ssaa == 1 the reference skips the resize and returns the cropped
        # size, and so do we.
        image = image.resize((resolution, resolution), Image.LANCZOS)
    return image


def render_image_sequence(net, params, latent_codes, devices=None, on_frame=None,
                          keep_results=None, **render_kw):
    """Render many latent codes CONCURRENTLY, one frame per device.

    The reference renders animation frames sequentially
    (demo_sdf_net.py:37-55 — ~40 min for its 30x60-frame latent traversal,
    README.md:131-133). A frame here is one device dispatch
    (:func:`render_image`), so frames are embarrassingly parallel across a
    mesh: params are placed on every device once and each worker thread
    drives its OWN device through its round-robin slice of the codes
    (codes[d::n_dev]) — a frame never queues behind another device's
    backlog, and dispatches overlap (JAX releases the GIL during device
    execution). On a single device this degrades to the sequential loop.

    ``on_frame(index, image)``, when given, fires as each frame completes —
    from worker threads, possibly concurrently and out of index order — so
    long animations can save frames to disk incrementally instead of holding
    the whole run in memory until the final join. In that streaming mode the
    default is genuinely bounded memory: frames are NOT accumulated and the
    function returns None (a 30x60-frame run at 800² would otherwise retain
    several GB of PIL images the caller then discards). Pass
    ``keep_results=True`` to both stream and collect; without ``on_frame``
    the function returns PIL images in latent-code order as before.
    """
    import concurrent.futures

    if keep_results is None:
        keep_results = on_frame is None
    devices = list(devices if devices is not None else jax.local_devices())
    codes = [jnp.asarray(c, jnp.float32) for c in latent_codes]
    if len(devices) <= 1 or len(codes) <= 1:
        images = [None] * len(codes) if keep_results else None
        for i, c in enumerate(codes):
            img = render_image(net, params, c, **render_kw)
            if on_frame is not None:
                on_frame(i, img)
            if keep_results:
                images[i] = img
        return images

    params_on = {d: jax.device_put(params, d) for d in devices}
    results = [None] * len(codes) if keep_results else None

    def drive_device(d_idx):
        d = devices[d_idx]
        p = params_on[d]
        for i in range(d_idx, len(codes), len(devices)):
            img = render_image(net, p, jax.device_put(codes[i], d), **render_kw)
            if keep_results:
                results[i] = img
            if on_frame is not None:
                on_frame(i, img)

    with concurrent.futures.ThreadPoolExecutor(len(devices)) as pool:
        # list() propagates the first worker exception instead of dropping it.
        list(pool.map(drive_device, range(len(devices))))
    return results


def render_image_for_index(net, params, latent_codes, index: int, crop: bool = False,
                           resolution: int = 800):
    """Disk-cached per-index render (reference :182-192)."""
    ensure_directory("screenshots/raymarching-examples")
    filename = f"screenshots/raymarching-examples/image-{index}-{resolution}.png"
    from PIL import Image

    if os.path.isfile(filename):
        return Image.open(filename)
    img = render_image(net, params, latent_codes[index], resolution=resolution, crop=crop)
    img.save(filename)
    return img
