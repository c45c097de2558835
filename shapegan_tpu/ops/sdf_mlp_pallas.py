"""Fused Pallas TPU kernel for the DeepSDF grid evaluation.

The hybrid-GAN hot path evaluates the 8x256 implicit MLP at B·res^3 points
(4.19M at the flagship's 64^3 iteration — SURVEY.md §3.2). The XLA path
(ops/sdf_mlp.apply_grid) is mathematically optimal in FLOPs but materializes
eight [B, P, 256] activation tensors in HBM (~4.3 GB each at the flagship
shape): the op is HBM-bound at ~8x the compute-limited time.

This kernel keeps the activation tile resident in VMEM through all six trunk
matmuls:

  grid = (P/TILE, B)           # point tiles outer, shapes inner, so the
                               # point-projection tiles are fetched once and
                               # the (tiny) per-shape latent rows cycle
  x  = relu(pp1[j] + zz1[i])   # fan-in layer 1, assembled in-register
  x  = relu(x @ w2 + b2) ... relu(x @ w4 + b4)
  x  = relu(x @ w5h + pp5[j] + zz5[i])     # skip concat, pre-projected
  x  = relu(x @ w6 + b6); relu(x @ w7 + b7)
  out[i, j*T:(j+1)*T] = tanh(x @ w8 + b8)

Weights use constant index maps, so Mosaic leaves them in VMEM across the
whole grid. Compute is bf16 on the MXU with fp32 accumulation; HBM traffic is
just pp1/pp5 once + the [B, P] output.

Inputs are the same pre-projections the XLA path uses (w1p/w1z split — see
ops/sdf_mlp.py), so the two paths agree to bf16 tolerance (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shapegan_tpu.ops import sdf_mlp

DEFAULT_TILE = 512

# Row permutation applied to the raw (b2, b3, b4, b6, b7, <pad>, b8, <pad>)
# bias stack so kernel indices line up with the trunk's layer order: rows
# 0-2 = b2..b4, 3 = unused slot (symmetry pad), 4-5 = b6, b7, 6 = b8
# broadcast, 7 = unused. Must match the b_ref indexing in _kernel /
# _points_trunk / the bwd kernels.
BIAS_STACK_ORDER = (0, 1, 2, 5, 3, 4, 6, 7)


def _kernel(pp1_ref, pp5_ref, zz1_ref, zz5_ref, w_ref, b_ref, w8row_ref, out_ref):
    """One point-tile program of the fused trunk, batch-STACKED: the whole
    shape batch is folded into the row axis ([B·T, 256]) so each trunk layer
    is ONE large MXU matmul instead of B small ones (measured 24→19 ms at the
    16×64³ flagship — small per-shape matmuls leave MXU pipeline bubbles).
    The head is a VPU row-dot with w8 (a [256→1] matmul padded to 128 lanes
    wastes 8% of the MXU work).

    w_ref: [6, 256, 256] stacked (w2, w3, w4, w5h, w6, w7)
    b_ref: [8, 256] rows (b2, b3, b4, unused, b6, b7, b8 broadcast, unused)
    w8row_ref: [1, 256] (the head weight as a row)
    """
    f32 = jnp.float32
    batch = zz1_ref.shape[0]
    tile = pp1_ref.shape[0]
    breadth = pp1_ref.shape[1]

    pp1 = pp1_ref[:, :]
    pp5 = pp5_ref[:, :]
    zz1 = zz1_ref[:, :]
    zz5 = zz5_ref[:, :]
    x = jax.nn.relu(pp1[None, :, :] + zz1[:, None, :]).reshape(batch * tile, breadth)
    for layer in range(3):  # w2, w3, w4
        x = jax.nn.relu(
            jnp.dot(x, w_ref[layer], preferred_element_type=f32).astype(x.dtype)
            + b_ref[layer][None, :]
        )
    x = jax.nn.relu(
        jnp.dot(x, w_ref[3], preferred_element_type=f32)
        .astype(x.dtype)
        .reshape(batch, tile, breadth)
        + pp5[None, :, :]
        + zz5[:, None, :]
    ).reshape(batch * tile, breadth)
    for layer in (4, 5):  # w6, w7
        x = jax.nn.relu(
            jnp.dot(x, w_ref[layer], preferred_element_type=f32).astype(x.dtype)
            + b_ref[layer][None, :]
        )
    w8row = w8row_ref[0, :].astype(f32)
    head = jnp.sum(x.astype(f32) * w8row[None, :], axis=1)  # [B*T]
    b8 = b_ref[6, :].astype(f32)[0]  # 32-bit scalar extract (Mosaic rule)
    out = jnp.tanh(head + b8).reshape(batch, tile)
    out_ref[:, :] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "compute_dtype"))
def apply_grid_fused(params, grid_points, latents, tile: int = DEFAULT_TILE,
                     compute_dtype=jnp.bfloat16):
    """Fused-kernel equivalent of :func:`shapegan_tpu.ops.sdf_mlp.apply_grid`:
    shared points [P, 3] x shape latents [B, L] → [B, P] float32."""
    cd = compute_dtype
    p = grid_points.shape[0]
    b = latents.shape[0]
    breadth = params["w2"].shape[0]
    pad = (-p) % tile
    pts = jnp.pad(grid_points, ((0, pad), (0, 0))).astype(cd)
    p_padded = p + pad

    # Fan-in pre-projections (tiny matmuls, done in XLA).
    pp1 = jnp.dot(pts, params["w1p"].astype(cd), preferred_element_type=cd)
    pp5 = jnp.dot(pts, params["w5p"].astype(cd), preferred_element_type=cd)
    z = latents.astype(cd)
    zz1 = (jnp.dot(z, params["w1z"].astype(cd), preferred_element_type=cd)
           + params["b1"].astype(cd))
    zz5 = (jnp.dot(z, params["w5z"].astype(cd), preferred_element_type=cd)
           + params["b5"].astype(cd))

    w_stack = jnp.stack(
        [params[k].astype(cd) for k in ("w2", "w3", "w4", "w5h", "w6", "w7")]
    )
    b_stack = jnp.stack(
        [
            params["b2"], params["b3"], params["b4"],
            params["b6"], params["b7"],
            jnp.zeros_like(params["b2"]),
            jnp.full((breadth,), params["b8"][0], dtype=params["b2"].dtype),
            jnp.zeros_like(params["b2"]),
        ]
    ).astype(cd)
    # Reorder so kernel indices line up: rows 0-2 = b2..b4, 3 unused slot for
    # symmetry, 4-5 = b6, b7, 6 = b8 broadcast.
    b_stack = b_stack[jnp.array(BIAS_STACK_ORDER)]
    w8row = params["w8"].astype(cd).T  # [1, 256]

    grid = (p_padded // tile,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, p_padded), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, breadth, breadth), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            # The stacked [B·T, 256] activations exceed Mosaic's default
            # 16 MB scoped-VMEM cap at the flagship batch (v5e: 128 MB).
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p_padded * 6 * breadth * breadth,
            bytes_accessed=2 * p_padded * breadth * 2 + b * p_padded * 4,
            transcendentals=b * p_padded,
        ),
    )(pp1, pp5, zz1, zz5, w_stack, b_stack, w8row)
    return out[:, :p]


def _points_trunk(pts, zz1, zz5, w1p_ref, w5p_ref, w_ref, b_ref,
                  w8row_ref):
    """Pre-tanh head ([T] f32, b8 included) of the 8-layer trunk for a
    [T, 8] compute-dtype point tile with IN-KERNEL fan-in projections.
    ``zz1``/``zz5`` are the latent+bias fan-in terms as VALUES — [1, 256]
    (one shape for the whole tile: points/trace kernels) or [T, 256]
    (per-point latents: the rowwise autodecoder kernel); both broadcast.
    Shared by all three so the layer sequence and the b_stack row order
    (see BIAS_STACK_ORDER in _points_operands) live in exactly one place."""
    f32 = jnp.float32
    cd = pts.dtype
    x = jax.nn.relu(
        jnp.dot(pts, w1p_ref[:, :], preferred_element_type=f32).astype(cd)
        + zz1
    )
    for layer in range(3):  # w2, w3, w4
        x = jax.nn.relu(
            jnp.dot(x, w_ref[layer], preferred_element_type=f32).astype(cd)
            + b_ref[layer][None, :]
        )
    pp5 = jnp.dot(pts, w5p_ref[:, :], preferred_element_type=f32).astype(cd)
    x = jax.nn.relu(
        jnp.dot(x, w_ref[3], preferred_element_type=f32).astype(cd)
        + pp5 + zz5
    )
    for layer in (4, 5):  # w6, w7
        x = jax.nn.relu(
            jnp.dot(x, w_ref[layer], preferred_element_type=f32).astype(cd)
            + b_ref[layer][None, :]
        )
    head = jnp.sum(x.astype(f32) * w8row_ref[0, :].astype(f32)[None, :], axis=1)
    return head + b_ref[6, :].astype(f32)[0]


def _points_kernel(ptsT_ref, zz1_ref, zz5_ref, w1p_ref, w5p_ref, w_ref, b_ref,
                   w8row_ref, out_ref):
    """Single-shape point-tile program with IN-KERNEL fan-in projections.

    The grid kernel above streams pre-projected pp1/pp5 tiles — 512 B/point
    of HBM traffic that amortizes over the shape batch in grid workloads but
    dominates at B=1 where every evaluation sees fresh points (the
    raymarcher re-evaluates moved points every trace iteration: XLA wrote
    and the kernel read ~5 GB per iteration at 2.56M lanes). Here the tile's
    raw points arrive as an [8, T] transposed block (rows 0-2 = xyz, rest
    zero — 32 B/point) and both projections are K=8 MXU matmuls in VMEM:
    ~8% extra MXU work in exchange for ~16x less HBM traffic per
    evaluation. Measured: 134 -> 210+ M pts/s on the raymarch workload.
    """
    pts = ptsT_ref[:, :].T  # [T, 8]
    head = _points_trunk(pts, zz1_ref[:, :], zz5_ref[:, :], w1p_ref, w5p_ref,
                         w_ref, b_ref, w8row_ref)
    out_ref[0, :] = jnp.tanh(head).astype(out_ref.dtype)


def _trunk_operands(params, cd):
    """Latent-free kernel operands shared by every in-kernel-projection
    kernel: fan-in weights padded to the [8, breadth] transposed-points
    layout, trunk weights/biases stacked (row order: BIAS_STACK_ORDER)."""
    breadth = params["w2"].shape[0]
    w1p = jnp.zeros((8, breadth), cd).at[:3].set(params["w1p"].astype(cd))
    w5p = jnp.zeros((8, breadth), cd).at[:3].set(params["w5p"].astype(cd))

    w_stack = jnp.stack(
        [params[k].astype(cd) for k in ("w2", "w3", "w4", "w5h", "w6", "w7")]
    )
    b_stack = jnp.stack(
        [
            params["b2"], params["b3"], params["b4"],
            params["b6"], params["b7"],
            jnp.zeros_like(params["b2"]),
            jnp.full((breadth,), params["b8"][0], dtype=params["b2"].dtype),
            jnp.zeros_like(params["b2"]),
        ]
    ).astype(cd)
    b_stack = b_stack[jnp.array(BIAS_STACK_ORDER)]
    w8row = params["w8"].astype(cd).T  # [1, 256]
    return w1p, w5p, w_stack, b_stack, w8row


def _points_operands(params, latent, cd):
    """Shared kernel operands for the single-shape kernels: latent terms
    pre-combined into the layer-1/-5 bias rows, plus the latent-free trunk
    operands (see _trunk_operands)."""
    z = latent.astype(cd)[None, :]
    zz1 = (jnp.dot(z, params["w1z"].astype(cd), preferred_element_type=cd)
           + params["b1"].astype(cd))
    zz5 = (jnp.dot(z, params["w5z"].astype(cd), preferred_element_type=cd)
           + params["b5"].astype(cd))
    return (zz1, zz5) + _trunk_operands(params, cd)


@functools.partial(jax.jit, static_argnames=("tile", "compute_dtype"))
def apply_points_fused(params, points, latent, tile: int = 2048,
                       compute_dtype=jnp.bfloat16):
    """Fused single-shape evaluation: points [N, 3] x latent [L] → [1, N].

    The raymarch hot path (render/raymarching.py): one latent (usually
    pre-folded into the biases, L=0), fresh points every call. Projections
    run in-kernel (see _points_kernel); only the [8, N] transposed points
    and the [1, N] output cross HBM per call.
    """
    cd = compute_dtype
    n = points.shape[0]
    breadth = params["w2"].shape[0]
    pad = (-n) % tile
    # [8, N] transposed points: rows 0-2 = xyz, rows 3-7 zero.
    ptsT = jnp.zeros((8, n + pad), cd).at[:3, :n].set(points.T.astype(cd))

    zz1, zz5, w1p, w5p, w_stack, b_stack, w8row = _points_operands(params, latent, cd)

    out = pl.pallas_call(
        _points_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n + pad), jnp.float32),
        grid=((n + pad) // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, breadth, breadth), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (n + pad) * 6 * breadth * breadth,
            bytes_accessed=(n + pad) * (8 * 2 + 4),
            transcendentals=n + pad,
        ),
    )(ptsT, zz1, zz5, w1p, w5p, w_stack, b_stack, w8row)
    return out[:, :n]


def apply_grid_best(params, grid_points, latents, dtype=jnp.float32):
    """Dispatch: fused Pallas kernel on TPU (the single-shape points kernel
    when B == 1 — in-kernel projections, see apply_points_fused), XLA path
    elsewhere."""
    if jax.default_backend() == "tpu":
        if latents.shape[0] == 1:
            return apply_points_fused(params, grid_points, latents[0])
        return apply_grid_fused(params, grid_points, latents)
    return sdf_mlp.apply_grid(params, grid_points, latents, dtype=dtype)


# ======================================================================
# Fused sphere-trace kernel: K masked trace iterations per HBM round trip.
# ======================================================================
#
# The staged raymarcher (render/raymarching.py) spends 78% of a frame in the
# primary trace (bench_profile.py stages=1). With per-iteration dispatch,
# every iteration re-reads and re-writes the full lane state from HBM around
# one MLP evaluation (~98 M evals/s vs the points kernel's ~158 M pts/s
# standalone). This kernel keeps each ray tile RESIDENT IN VMEM for all K
# iterations of a schedule stage — evaluate, clamp, advance, hit/miss test in
# one program — so the tile's HBM traffic amortizes over K evaluations.
#
# Status codes match render/raymarching (_ACTIVE, _HIT, _MISS = 0, 1, 2).

TRACE_ACTIVE, TRACE_HIT, TRACE_MISS = 0, 1, 2


def _make_trace_kernel(k: int, shadow: bool, threshold: float, step_clamp: float,
                       sdf_offset: float, radius: float, cd):
    """Build a trace-stage kernel for static (k, miss-test, constants).

    Per iteration, identical math to raymarching's per-dispatch body:
      sdf   = clip(tanh(MLP(p)) + offset, ±step_clamp)   (pre-advance point)
      p    += dir * where(active, sdf, 0)
      hit   = active & (sdf > 0) & (sdf < threshold)
      miss  = active & (p outside: |p| > radius, or p_y > its escape height
              for shadow — per-lane heights ride in points row 3, see
              trace_steps_fused)
    """

    def kernel(ptsT_ref, dirsT_ref, status_ref, zz1_ref, zz5_ref, w1p_ref,
               w5p_ref, w_ref, b_ref, w8row_ref, out_pts_ref, out_status_ref):
        # Transpose the lane state ONCE per tile: carrying [T, 8] through the
        # loop keeps the matmul operand layout-native; a per-iteration
        # [8,T]→[T,8] relayout costs like an extra trunk matmul.
        pts0 = ptsT_ref[:, :].T  # [T, 8] f32 (cols 4-7 zero; col 3 = shadow
        dirs = dirsT_ref[:, :].T  # [T, 8]    escape height, else zero)

        def body(_, carry):
            pts, status = carry  # [T, 8] f32, [1, T] int32
            head = _points_trunk(pts.astype(cd), zz1_ref[:, :], zz5_ref[:, :],
                                 w1p_ref, w5p_ref, w_ref, b_ref, w8row_ref)
            sdf = jnp.clip(jnp.tanh(head) + sdf_offset, -step_clamp, step_clamp)

            active = status[0] == TRACE_ACTIVE
            pts = pts + dirs * jnp.where(active, sdf, 0.0)[:, None]
            hits = active & (sdf > 0) & (sdf < threshold)
            if shadow:
                # Per-lane escape height in col 3: constant through the loop
                # (dirs col 3 is zero) and invisible to the MLP (w1p/w5p
                # rows 3-7 are zero).
                outside = pts[:, 1] > pts[:, 3]
            else:
                outside = jnp.sum(pts * pts, axis=1) > radius * radius
            misses = active & outside
            status = jnp.where(
                hits, TRACE_HIT, jnp.where(misses, TRACE_MISS, status[0])
            )[None, :]
            return pts, status

        pts, status = jax.lax.fori_loop(0, k, body, (pts0, status_ref[:, :]))
        out_pts_ref[:, :] = pts.T
        out_status_ref[:, :] = status

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "k", "shadow", "threshold", "step_clamp", "sdf_offset", "radius", "tile",
    "compute_dtype",
))
def trace_steps_fused(params, latent, points, directions, status, *, k: int,
                      shadow: bool, threshold: float, step_clamp: float,
                      sdf_offset: float, radius: float, tile: int = 2048,
                      compute_dtype=jnp.bfloat16, escape=None):
    """Run ``k`` masked sphere-trace iterations fully in-kernel.

    points/directions [N, 3] fp32, status [N] int32 (0 active / 1 hit /
    2 miss). Returns (points, status) after k iterations. The latent (if any)
    is folded into the bias rows, so the in-kernel MLP is latent-free.
    ``escape`` [N] gives shadow lanes per-lane escape heights (default: the
    scalar ``radius`` for every lane); ignored for primary traces."""
    if latent.shape[0]:
        params = sdf_mlp.fold_latent(params, latent)
        latent = latent[:0]
    cd = compute_dtype
    n = points.shape[0]
    breadth = params["w2"].shape[0]
    pad = (-n) % tile
    f32 = jnp.float32
    ptsT = jnp.zeros((8, n + pad), f32).at[:3, :n].set(points.T.astype(f32))
    if shadow:
        # Shadow escape heights ride in row 3 (see _make_trace_kernel);
        # padded lanes keep 0.0, which is inert — their status is MISS.
        esc = jnp.broadcast_to(jnp.float32(radius), (n,)) if escape is None \
            else escape.astype(f32)
        ptsT = ptsT.at[3, :n].set(esc)
    dirsT = jnp.zeros((8, n + pad), f32).at[:3, :n].set(directions.T.astype(f32))
    status_p = jnp.full((1, n + pad), TRACE_MISS, jnp.int32).at[0, :n].set(status)

    zz1, zz5, w1p, w5p, w_stack, b_stack, w8row = _points_operands(params, latent, cd)

    kernel = _make_trace_kernel(k, shadow, threshold, step_clamp, sdf_offset,
                                radius, cd)
    out_pts, out_status = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, n + pad), f32),
            jax.ShapeDtypeStruct((1, n + pad), jnp.int32),
        ),
        grid=((n + pad) // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, breadth, breadth), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (n + pad) * k * 6 * breadth * breadth,
            bytes_accessed=(n + pad) * (8 * 4 * 2 + 8 * 4 + 4 * 2),
            transcendentals=(n + pad) * k,
        ),
    )(ptsT, dirsT, status_p, zz1, zz5, w1p, w5p, w_stack, b_stack, w8row)
    return out_pts[:3, :n].T, out_status[0, :n]


# ======================================================================
# Custom-VJP path: fused forward + fused backward kernel for training.
# ======================================================================
#
# The backward kernel recomputes each tile's activations in VMEM (nothing is
# saved from the forward — the residuals are just the tiny fan-in
# projections) and produces:
#   * d_pp1/d_pp5  [P, 256]  — per-point fan-in cotangents (block per tile)
#   * d_zz1/d_zz5  [B, 256]  — per-shape cotangents (accumulated across tiles)
#   * dW trunk     [6, 256, 256], dB [8, 256], dW8 [256, 128]
# all weight-shaped outputs use constant index maps, so Mosaic keeps one
# fp32 accumulator block in VMEM across the whole sequential grid.
# The chain through w1p/w1z/w5p/w5z (and to grid/latents) is closed in XLA.


def _bwd_kernel(pp1_ref, pp5_ref, zz1_ref, zz5_ref, w_ref, b_ref, w8row_ref, g_ref,
                dpp1_ref, dpp5_ref, dzz1_ref, dzz5_ref, dw_ref, db_ref, dw8_ref,
                db8_ref):
    """Backward program for one point tile, looping over shapes in-kernel.

    Design notes (each constraint was hit experimentally):
      * ALL accumulators (dpp/dzz/dw/db/dw8) are local fp32 values across the
        in-kernel shape loop, flushed once per tile: per-row ``ref[b, :] +=``
        masked stores serialize the VPU (measured 12x slowdown), and
        per-(tile, shape) read-modify-writes of the weight blocks are not
        free either.
      * The unrolled shape loop's live activation sets exceed Mosaic's
        DEFAULT 16 MB scoped-VMEM limit; ``vmem_limit_bytes`` is raised at
        the pallas_call (v5e has 128 MB of physical VMEM).
      * dzz rows are accumulated as a stacked [B, 256] block written once;
        dw/db/dw8 use constant index maps so one fp32 block lives in VMEM
        across the whole sequential grid.
    """
    f32 = jnp.float32
    batch = zz1_ref.shape[0]
    tile = pp1_ref.shape[0]
    breadth = pp1_ref.shape[1]
    cd = pp1_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dzz1_ref[:, :] = jnp.zeros_like(dzz1_ref)
        dzz5_ref[:, :] = jnp.zeros_like(dzz5_ref)
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)
        dw8_ref[:, :] = jnp.zeros_like(dw8_ref)
        db8_ref[:, :] = jnp.zeros_like(db8_ref)

    dpp1_acc = jnp.zeros((tile, breadth), f32)
    dpp5_acc = jnp.zeros((tile, breadth), f32)
    dw_acc = [jnp.zeros((breadth, breadth), f32) for _ in range(6)]
    db_acc = [jnp.zeros((breadth,), f32) for _ in range(8)]
    db8_acc = jnp.float32(0.0)
    dw8_acc = jnp.zeros((breadth,), f32)
    dzz1_rows = []
    dzz5_rows = []
    # Head weight as a plain row: the head is a VPU row-dot / outer product
    # (a [256->1] matmul padded to 128 lanes wastes MXU work; measured ~5%
    # of the whole backward).
    w8row = w8row_ref[0, :].astype(f32)  # [256]
    b8 = b_ref[6, :].astype(f32)[0]  # 32-bit scalar extract (Mosaic rule)

    contract_t = (((0,), (0,)), ((), ()))      # [T, a] x [T, b] -> [a, b]
    contract_last = (((1,), (1,)), ((), ()))   # [T, a] x [b, a] -> [T, b]

    for b in range(batch):
        # ---- recompute forward for this (tile, shape)
        x1 = pp1_ref[:, :].astype(f32) + zz1_ref[b, :][None, :].astype(f32)
        h = [jax.nn.relu(x1).astype(cd)]  # h[0] = h1
        for layer in range(3):  # w2, w3, w4 -> h2..h4
            acc = jnp.dot(h[-1], w_ref[layer], preferred_element_type=f32) + b_ref[layer][None, :].astype(f32)
            h.append(jax.nn.relu(acc).astype(cd))
        x5 = (jnp.dot(h[-1], w_ref[3], preferred_element_type=f32)
              + pp5_ref[:, :].astype(f32) + zz5_ref[b, :][None, :].astype(f32))
        h.append(jax.nn.relu(x5).astype(cd))  # h[4] = h5
        for layer in (4, 5):  # w6, w7 -> h6, h7
            acc = jnp.dot(h[-1], w_ref[layer], preferred_element_type=f32) + b_ref[layer][None, :].astype(f32)
            h.append(jax.nn.relu(acc).astype(cd))
        head = jnp.sum(h[-1].astype(f32) * w8row[None, :], axis=1)  # [T]
        out_col = jnp.tanh(head + b8)[:, None]  # [T, 1]

        # ---- backward
        gz_col = g_ref[b, :].astype(f32)[:, None] * (1.0 - out_col * out_col)
        dw8_acc = dw8_acc + jnp.sum(h[6].astype(f32) * gz_col, axis=0)
        db8_acc = db8_acc + jnp.sum(gz_col)
        dh = gz_col * w8row[None, :]  # [T, 256] = dh7

        # layers w7 (idx 5), w6 (idx 4): h_prev = h[5], h[4]
        for layer, h_prev, h_cur, db_row in ((5, h[5], h[6], 5), (4, h[4], h[5], 4)):
            dz = (dh * (h_cur.astype(f32) > 0)).astype(cd)
            dw_acc[layer] = dw_acc[layer] + jax.lax.dot_general(
                h_prev, dz, contract_t, preferred_element_type=f32)
            db_acc[db_row] = db_acc[db_row] + jnp.sum(dz.astype(f32), axis=0)
            dh = jax.lax.dot_general(dz, w_ref[layer], contract_last,
                                     preferred_element_type=f32)

        # layer w5h (idx 3): dz5 also feeds the fan-in cotangents
        dz5 = (dh * (h[4].astype(f32) > 0)).astype(cd)
        dw_acc[3] = dw_acc[3] + jax.lax.dot_general(h[3], dz5, contract_t,
                                                    preferred_element_type=f32)
        dpp5_acc = dpp5_acc + dz5.astype(f32)
        dzz5_rows.append(jnp.sum(dz5.astype(f32), axis=0))
        dh = jax.lax.dot_general(dz5, w_ref[3], contract_last,
                                 preferred_element_type=f32)

        # layers w4 (idx 2), w3 (idx 1), w2 (idx 0)
        for layer, h_prev, h_cur, db_row in (
            (2, h[2], h[3], 2), (1, h[1], h[2], 1), (0, h[0], h[1], 0)
        ):
            dz = (dh * (h_cur.astype(f32) > 0)).astype(cd)
            dw_acc[layer] = dw_acc[layer] + jax.lax.dot_general(
                h_prev, dz, contract_t, preferred_element_type=f32)
            db_acc[db_row] = db_acc[db_row] + jnp.sum(dz.astype(f32), axis=0)
            dh = jax.lax.dot_general(dz, w_ref[layer], contract_last,
                                     preferred_element_type=f32)

        # fan-in layer 1
        dx1 = dh * (h[0].astype(f32) > 0)
        dpp1_acc = dpp1_acc + dx1
        dzz1_rows.append(jnp.sum(dx1, axis=0))

    dpp1_ref[:, :] = dpp1_acc
    dpp5_ref[:, :] = dpp5_acc
    dzz1_ref[:, :] += jnp.stack(dzz1_rows)
    dzz5_ref[:, :] += jnp.stack(dzz5_rows)
    dw_ref[:, :, :] += jnp.stack(dw_acc)
    db_ref[:, :] += jnp.stack(db_acc)
    dw8_ref[:, :] += jnp.broadcast_to(dw8_acc[:, None], dw8_ref.shape)
    db8_ref[:, :] += jnp.full(db8_ref.shape, db8_acc, f32)


def _projections(params, pts, latents, cd):
    pp1 = jnp.dot(pts, params["w1p"].astype(cd), preferred_element_type=cd)
    pp5 = jnp.dot(pts, params["w5p"].astype(cd), preferred_element_type=cd)
    z = latents.astype(cd)
    zz1 = (jnp.dot(z, params["w1z"].astype(cd), preferred_element_type=cd)
           + params["b1"].astype(cd))
    zz5 = (jnp.dot(z, params["w5z"].astype(cd), preferred_element_type=cd)
           + params["b5"].astype(cd))
    return pp1, pp5, zz1, zz5


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def apply_grid_trainable(params, grid_points, latents, tile: int = DEFAULT_TILE):
    """Differentiable fused grid evaluation: Pallas forward AND backward.

    Semantics match :func:`shapegan_tpu.ops.sdf_mlp.apply_grid` (bf16 trunk,
    fp32 accumulation). Gradients flow to params, grid_points, and latents.
    """
    return apply_grid_fused(params, grid_points, latents, tile=tile)


def _trainable_fwd(params, grid_points, latents, tile):
    out = apply_grid_fused(params, grid_points, latents, tile=tile)
    return out, (params, grid_points, latents)


def _trainable_bwd(tile, residuals, g):
    params, grid_points, latents = residuals
    cd = jnp.bfloat16
    p = grid_points.shape[0]
    b = latents.shape[0]
    breadth = params["w2"].shape[0]
    pad = (-p) % tile
    pts = jnp.pad(grid_points, ((0, pad), (0, 0))).astype(cd)
    p_padded = p + pad

    pp1, pp5, zz1, zz5 = _projections(params, pts, latents, cd)
    w_stack = jnp.stack([params[k].astype(cd) for k in ("w2", "w3", "w4", "w5h", "w6", "w7")])
    b_stack = jnp.stack(
        [params["b2"], params["b3"], params["b4"], params["b6"], params["b7"],
         jnp.zeros_like(params["b2"]),
         jnp.full((breadth,), params["b8"][0], dtype=params["b2"].dtype),
         jnp.zeros_like(params["b2"])]
    ).astype(cd)
    b_stack = b_stack[jnp.array(BIAS_STACK_ORDER)]
    w8row = params["w8"].astype(cd).T  # [1, 256]
    g_padded = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, pad)))

    grid = (p_padded // tile,)
    outs = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((p_padded, breadth), jnp.float32),   # d_pp1
            jax.ShapeDtypeStruct((p_padded, breadth), jnp.float32),   # d_pp5
            jax.ShapeDtypeStruct((b, breadth), jnp.float32),          # d_zz1
            jax.ShapeDtypeStruct((b, breadth), jnp.float32),          # d_zz5
            jax.ShapeDtypeStruct((6, breadth, breadth), jnp.float32),
            jax.ShapeDtypeStruct((8, breadth), jnp.float32),
            jax.ShapeDtypeStruct((breadth, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),  # db8 (lane 0 real)
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, breadth, breadth), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, breadth, breadth), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((breadth, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            # The unrolled in-kernel shape loop needs ~2 MB of live activation
            # per iteration; Mosaic's default scoped-VMEM cap (16 MB) is far
            # below the v5e's 128 MB of physical VMEM.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p_padded * 17 * breadth * breadth,
            bytes_accessed=4 * p_padded * breadth * 4 + b * p_padded * 4,
            transcendentals=b * p_padded,
        ),
    )(pp1, pp5, zz1, zz5, w_stack, b_stack, w8row, g_padded)

    d_pp1, d_pp5, d_zz1, d_zz5, d_w, d_b, d_w8, d_b8 = outs
    d_pp1 = d_pp1[:p]
    d_pp5 = d_pp5[:p]

    f32 = jnp.float32
    pts32 = grid_points.astype(f32)
    lat32 = latents.astype(f32)
    d_params = {
        "w1p": pts32.T @ d_pp1,
        "w1z": lat32.T @ d_zz1,
        "b1": jnp.sum(d_zz1, axis=0),
        "w5p": pts32.T @ d_pp5,
        "w5z": lat32.T @ d_zz5,
        "b5": jnp.sum(d_zz5, axis=0),
        "w2": d_w[0], "b2": d_b[0],
        "w3": d_w[1], "b3": d_b[1],
        "w4": d_w[2], "b4": d_b[2],
        "w5h": d_w[3],
        "w6": d_w[4], "b6": d_b[4],
        "w7": d_w[5], "b7": d_b[5],
        "w8": d_w8[:, :1],
        "b8": d_b8[0, :1],
    }
    d_params = {k: v.astype(params[k].dtype) for k, v in d_params.items()}
    d_grid = d_pp1 @ params["w1p"].astype(f32).T + d_pp5 @ params["w5p"].astype(f32).T
    d_latents = d_zz1 @ params["w1z"].astype(f32).T + d_zz5 @ params["w5z"].astype(f32).T
    return d_params, d_grid.astype(grid_points.dtype), d_latents.astype(latents.dtype)


apply_grid_trainable.defvjp(_trainable_fwd, _trainable_bwd)


# ======================================================================
# Activation-stash custom-VJP variant: the forward writes selected trunk
# activations to HBM; the backward reads them instead of recomputing.
# ======================================================================
#
# The recompute backward above runs at ~98% of its in-kernel-recompute
# roofline (BASELINE.md), so the only remaining lever at the 16x64^3
# flagship workload is algorithmic: trade recompute matmuls for HBM
# traffic by stashing trunk activations during the forward
# (BASELINE.md round-1 analysis). h1 = relu(pp1 + zz1) costs no matmul
# to rebuild (its inputs are already kernel operands), so the default
# stash set is the alternating {h3, h5, h7}: each stashed layer kills
# exactly one recompute matmul, halving the recompute (6 -> 3 matmuls)
# for 3 x B*P*256 bf16 of HBM (6.4 GB at the flagship) written once in
# the forward and read once in the backward — ~8 ms of DMA each way at
# the v5e's ~800 GB/s, overlappable with the surrounding MXU work.


def _trunk_stacks(params, cd):
    """The (w_stack, b_stack, w8row) kernel operands shared by every grid
    kernel launch (same layout as apply_grid_fused / _trainable_bwd)."""
    breadth = params["w2"].shape[0]
    w_stack = jnp.stack(
        [params[k].astype(cd) for k in ("w2", "w3", "w4", "w5h", "w6", "w7")]
    )
    b_stack = jnp.stack(
        [params["b2"], params["b3"], params["b4"], params["b6"], params["b7"],
         jnp.zeros_like(params["b2"]),
         jnp.full((breadth,), params["b8"][0], dtype=params["b2"].dtype),
         jnp.zeros_like(params["b2"])]
    ).astype(cd)
    b_stack = b_stack[jnp.array(BIAS_STACK_ORDER)]
    w8row = params["w8"].astype(cd).T  # [1, breadth]
    return w_stack, b_stack, w8row


def _stash_fwd_kernel(stash_js, pp1_ref, pp5_ref, zz1_ref, zz5_ref, w_ref,
                      b_ref, w8row_ref, out_ref, *stash_refs):
    """Batch-stacked forward (see _kernel) that additionally writes the
    h-chain positions named by ``stash_js`` (0-indexed into h1..h7) to
    HBM blocks for the stash backward."""
    f32 = jnp.float32
    batch = zz1_ref.shape[0]
    tile = pp1_ref.shape[0]
    breadth = pp1_ref.shape[1]

    def maybe_stash(j, x):
        if j in stash_js:
            stash_refs[stash_js.index(j)][:, :, :] = x.reshape(
                batch, tile, breadth)

    pp1 = pp1_ref[:, :]
    pp5 = pp5_ref[:, :]
    zz1 = zz1_ref[:, :]
    zz5 = zz5_ref[:, :]
    x = jax.nn.relu(pp1[None, :, :] + zz1[:, None, :]).reshape(batch * tile, breadth)
    maybe_stash(0, x)
    for layer in range(3):  # w2, w3, w4 -> h2..h4
        x = jax.nn.relu(
            jnp.dot(x, w_ref[layer], preferred_element_type=f32).astype(x.dtype)
            + b_ref[layer][None, :]
        )
        maybe_stash(layer + 1, x)
    x = jax.nn.relu(
        jnp.dot(x, w_ref[3], preferred_element_type=f32)
        .astype(x.dtype)
        .reshape(batch, tile, breadth)
        + pp5[None, :, :]
        + zz5[:, None, :]
    ).reshape(batch * tile, breadth)
    maybe_stash(4, x)
    for layer in (4, 5):  # w6, w7 -> h6, h7
        x = jax.nn.relu(
            jnp.dot(x, w_ref[layer], preferred_element_type=f32).astype(x.dtype)
            + b_ref[layer][None, :]
        )
        maybe_stash(layer + 1, x)
    w8row = w8row_ref[0, :].astype(f32)
    head = jnp.sum(x.astype(f32) * w8row[None, :], axis=1)
    b8 = b_ref[6, :].astype(f32)[0]
    out_ref[:, :] = jnp.tanh(head + b8).reshape(batch, tile).astype(out_ref.dtype)


def _stash_bwd_kernel(stash_js, pp1_ref, pp5_ref, zz1_ref, zz5_ref, w_ref,
                      b_ref, w8row_ref, g_ref, *rest):
    """Backward program for one point tile using stashed activations.

    Identical sweep to _bwd_kernel; the per-shape h-chain is assembled
    from the stashed HBM blocks, with only the non-stashed layers
    recomputed (ascending, so each recompute's predecessor is in hand).
    Stashed values are the forward's own bf16 activations, so the relu
    masks and dw operands match the forward bit-for-bit (the recompute
    kernel's differ by one bf16 rounding in the bias add)."""
    stash_refs = rest[: len(stash_js)]
    (dpp1_ref, dpp5_ref, dzz1_ref, dzz5_ref, dw_ref, db_ref, dw8_ref,
     db8_ref) = rest[len(stash_js):]
    f32 = jnp.float32
    batch = zz1_ref.shape[0]
    tile = pp1_ref.shape[0]
    breadth = pp1_ref.shape[1]
    cd = pp1_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dzz1_ref[:, :] = jnp.zeros_like(dzz1_ref)
        dzz5_ref[:, :] = jnp.zeros_like(dzz5_ref)
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)
        dw8_ref[:, :] = jnp.zeros_like(dw8_ref)
        db8_ref[:, :] = jnp.zeros_like(db8_ref)

    dpp1_acc = jnp.zeros((tile, breadth), f32)
    dpp5_acc = jnp.zeros((tile, breadth), f32)
    dw_acc = [jnp.zeros((breadth, breadth), f32) for _ in range(6)]
    db_acc = [jnp.zeros((breadth,), f32) for _ in range(8)]
    db8_acc = jnp.float32(0.0)
    dw8_acc = jnp.zeros((breadth,), f32)
    dzz1_rows = []
    dzz5_rows = []
    w8row = w8row_ref[0, :].astype(f32)  # [256]
    b8 = b_ref[6, :].astype(f32)[0]

    contract_t = (((0,), (0,)), ((), ()))      # [T, a] x [T, b] -> [a, b]
    contract_last = (((1,), (1,)), ((), ()))   # [T, a] x [b, a] -> [T, b]

    for b in range(batch):
        # ---- assemble the h-chain: stashed reads + ascending recompute
        x1 = pp1_ref[:, :].astype(f32) + zz1_ref[b, :][None, :].astype(f32)
        h = [jax.nn.relu(x1).astype(cd)]  # h[0] = h1, matmul-free
        for j in range(1, 7):
            if j in stash_js:
                h.append(stash_refs[stash_js.index(j)][b, :, :])
            elif j == 4:  # skip layer w5h
                x5 = (jnp.dot(h[3], w_ref[3], preferred_element_type=f32)
                      + pp5_ref[:, :].astype(f32)
                      + zz5_ref[b, :][None, :].astype(f32))
                h.append(jax.nn.relu(x5).astype(cd))
            else:
                acc = (jnp.dot(h[-1], w_ref[j - 1], preferred_element_type=f32)
                       + b_ref[j - 1][None, :].astype(f32))
                h.append(jax.nn.relu(acc).astype(cd))
        head = jnp.sum(h[-1].astype(f32) * w8row[None, :], axis=1)  # [T]
        out_col = jnp.tanh(head + b8)[:, None]  # [T, 1]

        # ---- backward sweep (identical to _bwd_kernel)
        gz_col = g_ref[b, :].astype(f32)[:, None] * (1.0 - out_col * out_col)
        dw8_acc = dw8_acc + jnp.sum(h[6].astype(f32) * gz_col, axis=0)
        db8_acc = db8_acc + jnp.sum(gz_col)
        dh = gz_col * w8row[None, :]  # [T, 256] = dh7

        for layer, h_prev, h_cur, db_row in ((5, h[5], h[6], 5), (4, h[4], h[5], 4)):
            dz = (dh * (h_cur.astype(f32) > 0)).astype(cd)
            dw_acc[layer] = dw_acc[layer] + jax.lax.dot_general(
                h_prev, dz, contract_t, preferred_element_type=f32)
            db_acc[db_row] = db_acc[db_row] + jnp.sum(dz.astype(f32), axis=0)
            dh = jax.lax.dot_general(dz, w_ref[layer], contract_last,
                                     preferred_element_type=f32)

        dz5 = (dh * (h[4].astype(f32) > 0)).astype(cd)
        dw_acc[3] = dw_acc[3] + jax.lax.dot_general(h[3], dz5, contract_t,
                                                    preferred_element_type=f32)
        dpp5_acc = dpp5_acc + dz5.astype(f32)
        dzz5_rows.append(jnp.sum(dz5.astype(f32), axis=0))
        dh = jax.lax.dot_general(dz5, w_ref[3], contract_last,
                                 preferred_element_type=f32)

        for layer, h_prev, h_cur, db_row in (
            (2, h[2], h[3], 2), (1, h[1], h[2], 1), (0, h[0], h[1], 0)
        ):
            dz = (dh * (h_cur.astype(f32) > 0)).astype(cd)
            dw_acc[layer] = dw_acc[layer] + jax.lax.dot_general(
                h_prev, dz, contract_t, preferred_element_type=f32)
            db_acc[db_row] = db_acc[db_row] + jnp.sum(dz.astype(f32), axis=0)
            dh = jax.lax.dot_general(dz, w_ref[layer], contract_last,
                                     preferred_element_type=f32)

        dx1 = dh * (h[0].astype(f32) > 0)
        dpp1_acc = dpp1_acc + dx1
        dzz1_rows.append(jnp.sum(dx1, axis=0))

    dpp1_ref[:, :] = dpp1_acc
    dpp5_ref[:, :] = dpp5_acc
    dzz1_ref[:, :] += jnp.stack(dzz1_rows)
    dzz5_ref[:, :] += jnp.stack(dzz5_rows)
    dw_ref[:, :, :] += jnp.stack(dw_acc)
    db_ref[:, :] += jnp.stack(db_acc)
    dw8_ref[:, :] += jnp.broadcast_to(dw8_acc[:, None], dw8_ref.shape)
    db8_ref[:, :] += jnp.full(db8_ref.shape, db8_acc, f32)


def _stash_fwd_call(params, grid_points, latents, tile, stash):
    """Forward launch returning (out [B, P] f32, stashed bf16 activations)."""
    cd = jnp.bfloat16
    p = grid_points.shape[0]
    b = latents.shape[0]
    breadth = params["w2"].shape[0]
    pad = (-p) % tile
    pts = jnp.pad(grid_points, ((0, pad), (0, 0))).astype(cd)
    p_padded = p + pad

    pp1, pp5, zz1, zz5 = _projections(params, pts, latents, cd)
    w_stack, b_stack, w8row = _trunk_stacks(params, cd)

    grid = (p_padded // tile,)
    stash_spec = pl.BlockSpec((b, tile, breadth), lambda j: (0, j, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_stash_fwd_kernel, tuple(stash)),
        out_shape=(jax.ShapeDtypeStruct((b, p_padded), jnp.float32),)
        + tuple(jax.ShapeDtypeStruct((b, p_padded, breadth), cd) for _ in stash),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, breadth, breadth), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        ) + tuple(stash_spec for _ in stash),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p_padded * 6 * breadth * breadth,
            bytes_accessed=(2 * p_padded * breadth * 2 + b * p_padded * 4
                            + len(stash) * b * p_padded * breadth * 2),
            transcendentals=b * p_padded,
        ),
    )(pp1, pp5, zz1, zz5, w_stack, b_stack, w8row)
    out = outs[0]
    return out[:, :p], tuple(outs[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def apply_grid_trainable_stash(params, grid_points, latents,
                               tile: int = DEFAULT_TILE, stash=(2, 4, 6)):
    """Differentiable fused grid evaluation with an activation-stash
    backward: the forward writes the h-chain positions in ``stash``
    (0-indexed into h1..h7; default h3/h5/h7) to HBM, and the backward
    reads them instead of recomputing — 3 fewer recompute matmuls per
    layer set at 2.15 GB of bf16 HBM per stashed layer (flagship shape).
    Semantics match apply_grid_trainable."""
    return apply_grid_fused(params, grid_points, latents, tile=tile)


def _stash_trainable_fwd(params, grid_points, latents, tile, stash):
    out, stashed = _stash_fwd_call(params, grid_points, latents, tile, stash)
    return out, (params, grid_points, latents, stashed)


def _stash_trainable_bwd(tile, stash, residuals, g):
    params, grid_points, latents, stashed = residuals
    cd = jnp.bfloat16
    p = grid_points.shape[0]
    b = latents.shape[0]
    breadth = params["w2"].shape[0]
    pad = (-p) % tile
    pts = jnp.pad(grid_points, ((0, pad), (0, 0))).astype(cd)
    p_padded = p + pad

    pp1, pp5, zz1, zz5 = _projections(params, pts, latents, cd)
    w_stack, b_stack, w8row = _trunk_stacks(params, cd)
    g_padded = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, pad)))

    grid = (p_padded // tile,)
    stash_spec = pl.BlockSpec((b, tile, breadth), lambda j: (0, j, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_stash_bwd_kernel, tuple(stash)),
        out_shape=(
            jax.ShapeDtypeStruct((p_padded, breadth), jnp.float32),   # d_pp1
            jax.ShapeDtypeStruct((p_padded, breadth), jnp.float32),   # d_pp5
            jax.ShapeDtypeStruct((b, breadth), jnp.float32),          # d_zz1
            jax.ShapeDtypeStruct((b, breadth), jnp.float32),          # d_zz5
            jax.ShapeDtypeStruct((6, breadth, breadth), jnp.float32),
            jax.ShapeDtypeStruct((8, breadth), jnp.float32),
            jax.ShapeDtypeStruct((breadth, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),  # db8 (lane 0 real)
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, breadth, breadth), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        ] + [stash_spec for _ in stash],
        out_specs=(
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, breadth, breadth), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((breadth, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p_padded * (17 - len(stash)) * breadth * breadth,
            bytes_accessed=(4 * p_padded * breadth * 4 + b * p_padded * 4
                            + len(stash) * b * p_padded * breadth * 2),
            transcendentals=b * p_padded,
        ),
    )(pp1, pp5, zz1, zz5, w_stack, b_stack, w8row, g_padded, *stashed)

    d_pp1, d_pp5, d_zz1, d_zz5, d_w, d_b, d_w8, d_b8 = outs
    d_pp1 = d_pp1[:p]
    d_pp5 = d_pp5[:p]

    f32 = jnp.float32
    pts32 = grid_points.astype(f32)
    lat32 = latents.astype(f32)
    d_params = {
        "w1p": pts32.T @ d_pp1,
        "w1z": lat32.T @ d_zz1,
        "b1": jnp.sum(d_zz1, axis=0),
        "w5p": pts32.T @ d_pp5,
        "w5z": lat32.T @ d_zz5,
        "b5": jnp.sum(d_zz5, axis=0),
        "w2": d_w[0], "b2": d_b[0],
        "w3": d_w[1], "b3": d_b[1],
        "w4": d_w[2], "b4": d_b[2],
        "w5h": d_w[3],
        "w6": d_w[4], "b6": d_b[4],
        "w7": d_w[5], "b7": d_b[5],
        "w8": d_w8[:, :1],
        "b8": d_b8[0, :1],
    }
    d_params = {k: v.astype(params[k].dtype) for k, v in d_params.items()}
    d_grid = d_pp1 @ params["w1p"].astype(f32).T + d_pp5 @ params["w5p"].astype(f32).T
    d_latents = d_zz1 @ params["w1z"].astype(f32).T + d_zz5 @ params["w5z"].astype(f32).T
    return d_params, d_grid.astype(grid_points.dtype), d_latents.astype(latents.dtype)


apply_grid_trainable_stash.defvjp(_stash_trainable_fwd, _stash_trainable_bwd)


# Trace-time counter: lets tests and the driver dryrun assert that the
# shard_map path (not a replicated fallback) was actually taken.
sharded_call_count = 0


def _trainable_dispatch(params, grid_points, latents):
    """Per-shard trainable evaluation: fused custom-VJP Pallas kernel on TPU,
    XLA (remat-chunked when large) elsewhere — the same dispatch the
    single-device trainers use (train/hybrid_gan.generate_volumes)."""
    if jax.default_backend() == "tpu":
        return apply_grid_trainable(params, grid_points, latents)
    n_points = grid_points.shape[0]
    if n_points * latents.shape[0] > 2**18:
        return sdf_mlp.apply_grid_remat(
            params, grid_points, latents, chunk_size=min(n_points, 16384)
        )
    return sdf_mlp.apply_grid(params, grid_points, latents)


def apply_grid_sharded(params, grid_points, latents, mesh, trainable: bool = False):
    """Multi-chip fused grid evaluation via shard_map.

    A Pallas kernel is opaque to XLA's SPMD partitioner, so for pod-scale
    runs the kernel is wrapped in shard_map: the point axis shards over
    'points' and the shape batch over 'data' (the evaluation is pointwise
    independent across P and B, so per-device kernels compute exact local
    results with no communication on the forward). Parameters are replicated;
    shard_map's reverse-mode transpose inserts the gradient psums.

    ``trainable=True`` uses the custom-VJP kernel (training); otherwise the
    forward-only dispatch. Off-TPU both fall back to the numerically
    equivalent XLA path per shard, so CPU dryruns compile and execute the
    exact same shard_map program structure a TPU pod would.
    """
    from jax.sharding import PartitionSpec as P

    from shapegan_tpu.parallel.mesh import DATA_AXIS, POINTS_AXIS

    global sharded_call_count
    sharded_call_count += 1

    inner = _trainable_dispatch if trainable else (lambda p, g, l: apply_grid_best(p, g, l))
    fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(POINTS_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, POINTS_AXIS),
    )
    return fn(params, grid_points, latents)


# ======================================================================
# Rowwise (per-point-latent) fused custom-VJP path: the autodecoder trunk.
# ======================================================================
#
# The DeepSDF autodecoder trains on batches whose EVERY point carries its own
# latent row (codes[shape_idx], /root/reference/train_sdf_autodecoder.py:78).
# The XLA path (ops/sdf_mlp.apply) materializes eight [N, 256] activation
# tensors in HBM through the backward; at the reference's 20k-point batch the
# step is far from the MXU bound. Here the trunk runs as ONE fused kernel in
# each direction: the forward takes the per-point fan-in latent terms
# zz1/zz5 = z @ w1z/5z + b (tiny XLA GEMMs over the gathered codes) and
# projects the raw points in-kernel; the backward recomputes the tile's
# activations in VMEM and emits per-ROW dzz1/dzz5 blocks (which autodiff
# chains through the XLA gather's transpose to the latent-table scatter) plus
# the usual constant-index-map weight accumulators.
#
# The chain to w1p/w5p/points closes in XLA from dzz1/dzz5 (three small
# GEMMs); w1z/b1/w5z/b5 receive their cotangents entirely through the zz
# inputs, so their in-VJP entries are zero.


def _rowwise_kernel(ptsT_ref, zz1_ref, zz5_ref, w1p_ref, w5p_ref, w_ref,
                    b_ref, w8row_ref, out_ref):
    """Forward program for one point tile with per-row latent terms."""
    pts = ptsT_ref[:, :].T  # [T, 8]
    head = _points_trunk(pts, zz1_ref[:, :], zz5_ref[:, :], w1p_ref, w5p_ref,
                         w_ref, b_ref, w8row_ref)
    out_ref[0, :] = jnp.tanh(head).astype(out_ref.dtype)


def _rowwise_bwd_kernel(ptsT_ref, zz1_ref, zz5_ref, w1p_ref, w5p_ref, w_ref,
                        b_ref, w8row_ref, g_ref,
                        dzz1_ref, dzz5_ref, dw_ref, db_ref, dw8_ref, db8_ref):
    """Backward program for one point tile: recompute the forward in VMEM
    (residuals are just the inputs), emit per-row dzz blocks and accumulate
    the weight/bias cotangents across the sequential grid (same accumulator
    design as _bwd_kernel — constant index maps keep one fp32 block in VMEM;
    the b_stack row layout is BIAS_STACK_ORDER)."""
    f32 = jnp.float32
    cd = zz1_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)
        dw8_ref[:, :] = jnp.zeros_like(dw8_ref)
        db8_ref[:, :] = jnp.zeros_like(db8_ref)

    pts = ptsT_ref[:, :].T  # [T, 8] cd

    # ---- recompute forward, keeping the activations
    x1 = (jnp.dot(pts, w1p_ref[:, :], preferred_element_type=f32)
          + zz1_ref[:, :].astype(f32))
    h = [jax.nn.relu(x1).astype(cd)]  # h[0] = h1
    for layer in range(3):  # w2, w3, w4 -> h2..h4
        acc = (jnp.dot(h[-1], w_ref[layer], preferred_element_type=f32)
               + b_ref[layer][None, :].astype(f32))
        h.append(jax.nn.relu(acc).astype(cd))
    x5 = (jnp.dot(h[-1], w_ref[3], preferred_element_type=f32)
          + jnp.dot(pts, w5p_ref[:, :], preferred_element_type=f32)
          + zz5_ref[:, :].astype(f32))
    h.append(jax.nn.relu(x5).astype(cd))  # h[4] = h5
    for layer in (4, 5):  # w6, w7 -> h6, h7
        acc = (jnp.dot(h[-1], w_ref[layer], preferred_element_type=f32)
               + b_ref[layer][None, :].astype(f32))
        h.append(jax.nn.relu(acc).astype(cd))
    w8row = w8row_ref[0, :].astype(f32)
    b8 = b_ref[6, :].astype(f32)[0]
    head = jnp.sum(h[6].astype(f32) * w8row[None, :], axis=1)
    out_col = jnp.tanh(head + b8)[:, None]  # [T, 1]

    # ---- backward
    gz_col = g_ref[0, :].astype(f32)[:, None] * (1.0 - out_col * out_col)
    dw8_acc = jnp.sum(h[6].astype(f32) * gz_col, axis=0)
    db8_acc = jnp.sum(gz_col)
    dh = gz_col * w8row[None, :]  # dh7

    contract_t = (((0,), (0,)), ((), ()))      # [T, a] x [T, b] -> [a, b]
    contract_last = (((1,), (1,)), ((), ()))   # [T, a] x [b, a] -> [T, b]
    dw_acc = [None] * 6
    db_acc = [None] * 8

    for layer, h_prev, h_cur, db_row in ((5, h[5], h[6], 5), (4, h[4], h[5], 4)):
        dz = (dh * (h_cur.astype(f32) > 0)).astype(cd)
        dw_acc[layer] = jax.lax.dot_general(h_prev, dz, contract_t,
                                            preferred_element_type=f32)
        db_acc[db_row] = jnp.sum(dz.astype(f32), axis=0)
        dh = jax.lax.dot_general(dz, w_ref[layer], contract_last,
                                 preferred_element_type=f32)

    dz5 = (dh * (h[4].astype(f32) > 0)).astype(cd)
    dw_acc[3] = jax.lax.dot_general(h[3], dz5, contract_t,
                                    preferred_element_type=f32)
    dzz5_ref[:, :] = dz5.astype(f32)
    dh = jax.lax.dot_general(dz5, w_ref[3], contract_last,
                             preferred_element_type=f32)

    for layer, h_prev, h_cur, db_row in (
        (2, h[2], h[3], 2), (1, h[1], h[2], 1), (0, h[0], h[1], 0)
    ):
        dz = (dh * (h_cur.astype(f32) > 0)).astype(cd)
        dw_acc[layer] = jax.lax.dot_general(h_prev, dz, contract_t,
                                            preferred_element_type=f32)
        db_acc[db_row] = jnp.sum(dz.astype(f32), axis=0)
        dh = jax.lax.dot_general(dz, w_ref[layer], contract_last,
                                 preferred_element_type=f32)

    dx1 = dh * (h[0].astype(f32) > 0)
    dzz1_ref[:, :] = dx1

    breadth = dw_ref.shape[1]
    zero_row = jnp.zeros((breadth,), f32)
    db_rows = [r if r is not None else zero_row for r in db_acc]
    dw_ref[:, :, :] += jnp.stack(dw_acc)
    db_ref[:, :] += jnp.stack(db_rows)
    dw8_ref[:, :] += jnp.broadcast_to(dw8_acc[:, None], dw8_ref.shape)
    db8_ref[:, :] += jnp.full(db8_ref.shape, db8_acc, f32)


def _rowwise_specs(tile, breadth, b_rows=8):
    """in_specs shared by the rowwise fwd/bwd pallas_calls (the bwd appends
    the incoming-cotangent spec)."""
    return [
        pl.BlockSpec((8, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((6, breadth, breadth), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b_rows, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
    ]


def _rowwise_pack(params, points, zz1, zz5, tile, cd):
    n = points.shape[0]
    pad = (-n) % tile
    ptsT = jnp.zeros((8, n + pad), cd).at[:3, :n].set(points.T.astype(cd))
    zz1p = jnp.pad(zz1.astype(cd), ((0, pad), (0, 0)))
    zz5p = jnp.pad(zz5.astype(cd), ((0, pad), (0, 0)))
    return n, pad, ptsT, zz1p, zz5p, _trunk_operands(params, cd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def apply_rowwise_trainable(params, points, zz1, zz5, tile: int = 1024,
                            compute_dtype=jnp.bfloat16):
    """Differentiable fused per-point-latent evaluation: points [N, 3] with
    per-row fan-in latent terms zz1/zz5 [N, breadth] -> [N] fp32 (tanh'd).

    zz1/zz5 are ``codes[shape_idx] @ w1z/w5z + b1/b5`` computed in XLA, so
    gradients flow to the latent table (scatter-add via the gather's
    transpose), to w1z/b1/w5z/b5 (via the zz matmuls), and — closed in XLA
    from the kernel's per-row dzz outputs — to points and w1p/w5p.

    STATUS — measured and REJECTED for the production autodecoder step
    (round 4, TPU v5e, ``bench_profile.py autodecoder=1`` at the reference
    workload of 20k points / 8 shapes x 25k): the full train step through
    this kernel runs at 935.5 us vs 819.6 us for the plain XLA bf16 path
    (train/sdf_autodecoder.py), i.e. ~14% slower. The reason: at 20k rows
    the XLA step is bandwidth/latency-bound, not activation-storage-bound —
    a stored-activation backward costs only ~29 us more than a rematerialized
    one (remat-delta row), while this kernel's in-kernel trunk recompute
    pays ~3x the trunk matmul FLOPs in the backward. The kernel is kept as
    a documented experiment (correctness tests in tests/test_pallas_kernels);
    the production step stays on XLA (see BASELINE.md "rowwise kernel"
    entry for the full decomposition).
    """
    out, _ = _rowwise_fwd(params, points, zz1, zz5, tile, compute_dtype)
    return out


def _rowwise_fwd(params, points, zz1, zz5, tile, cd):
    n, pad, ptsT, zz1p, zz5p, trunk = _rowwise_pack(params, points, zz1, zz5,
                                                    tile, cd)
    w1p, w5p, w_stack, b_stack, w8row = trunk
    breadth = w_stack.shape[1]
    out = pl.pallas_call(
        _rowwise_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n + pad), jnp.float32),
        grid=((n + pad) // tile,),
        in_specs=_rowwise_specs(tile, breadth),
        out_specs=pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (n + pad) * 6 * breadth * breadth,
            bytes_accessed=(n + pad) * (8 + 4 * breadth) * 2,
            transcendentals=n + pad,
        ),
    )(ptsT, zz1p, zz5p, w1p, w5p, w_stack, b_stack, w8row)
    return out[0, :n], (params, points, zz1, zz5)


def _rowwise_bwd(tile, cd, residuals, g):
    params, points, zz1, zz5 = residuals
    n, pad, ptsT, zz1p, zz5p, trunk = _rowwise_pack(params, points, zz1, zz5,
                                                    tile, cd)
    w1p, w5p, w_stack, b_stack, w8row = trunk
    breadth = w_stack.shape[1]
    f32 = jnp.float32
    g_padded = jnp.pad(g.astype(f32), (0, pad))[None, :]

    outs = pl.pallas_call(
        _rowwise_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n + pad, breadth), f32),   # dzz1
            jax.ShapeDtypeStruct((n + pad, breadth), f32),   # dzz5
            jax.ShapeDtypeStruct((6, breadth, breadth), f32),
            jax.ShapeDtypeStruct((8, breadth), f32),
            jax.ShapeDtypeStruct((breadth, 128), f32),
            jax.ShapeDtypeStruct((8, 128), f32),             # db8 (lane 0 real)
        ),
        grid=((n + pad) // tile,),
        in_specs=_rowwise_specs(tile, breadth) + [
            pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, breadth), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, breadth, breadth), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, breadth), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((breadth, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            # accumulators need the sequential grid default; VMEM cap as in
            # the grid backward (the recompute's live set exceeds 16 MB).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (n + pad) * 17 * breadth * breadth,
            bytes_accessed=(n + pad) * (8 + 8 * breadth) * 2,
            transcendentals=n + pad,
        ),
    )(ptsT, zz1p, zz5p, w1p, w5p, w_stack, b_stack, w8row, g_padded)

    dzz1, dzz5, d_w, d_b, d_w8, d_b8 = outs
    dzz1 = dzz1[:n]
    dzz5 = dzz5[:n]
    pts32 = points.astype(f32)
    zeros_like = lambda k: jnp.zeros_like(params[k], dtype=f32)
    d_params = {
        "w1p": pts32.T @ dzz1,
        "w5p": pts32.T @ dzz5,
        # w1z/b1/w5z/b5 receive their cotangents through the zz inputs.
        "w1z": zeros_like("w1z"), "b1": zeros_like("b1"),
        "w5z": zeros_like("w5z"), "b5": zeros_like("b5"),
        "w2": d_w[0], "b2": d_b[0],
        "w3": d_w[1], "b3": d_b[1],
        "w4": d_w[2], "b4": d_b[2],
        "w5h": d_w[3],
        "w6": d_w[4], "b6": d_b[4],
        "w7": d_w[5], "b7": d_b[5],
        "w8": d_w8[:, :1],
        "b8": d_b8[0, :1],
    }
    d_params = {k: v.astype(params[k].dtype) for k, v in d_params.items()}
    d_points = dzz1 @ params["w1p"].astype(f32).T + dzz5 @ params["w5p"].astype(f32).T
    return (d_params, d_points.astype(points.dtype),
            dzz1.astype(zz1.dtype), dzz5.astype(zz5.dtype))


apply_rowwise_trainable.defvjp(_rowwise_fwd, _rowwise_bwd)


def apply_rowwise(params, points, latents, dtype=jnp.bfloat16, tile: int = 1024):
    """Fused-kernel equivalent of :func:`shapegan_tpu.ops.sdf_mlp.apply`:
    points [N, 3] with per-point latents [N, L] -> [N] fp32. Differentiable
    wrt params, points, and latents (the autodecoder's latent-gather rows).
    """
    cd = dtype
    z = latents.astype(cd)
    zz1 = (jnp.dot(z, params["w1z"].astype(cd), preferred_element_type=cd)
           + params["b1"].astype(cd))
    zz5 = (jnp.dot(z, params["w5z"].astype(cd), preferred_element_type=cd)
           + params["b5"].astype(cd))
    return apply_rowwise_trainable(params, points, zz1, zz5, tile, cd)
