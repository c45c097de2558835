"""Fused Pallas TPU forward kernel for the point-GAN's SDFGenerator —
measured on TPU and REJECTED (round 4); kept as a tested experiment.

The hypothesis: the WGAN-GP critic step's fake-cloud generation
(/root/reference/train_point_gan.py:55-59 — under stop_gradient, so only
the forward matters) pays inter-layer HBM round trips that VMEM residency
would eliminate, the same argument that won 3-8× for the SDFNet kernels
(ops/sdf_mlp_pallas.py).

The measurement (v5e, batch 32 × 4096 pts, bf16, marginal-scan timing)
says otherwise: the XLA forward runs at **0.65 ms** — XLA's
matmul+LN+relu epilogue fusion already holds traffic to ~one bf16
write+read per layer boundary (~1 GB/frame ≈ the measured time), while
this kernel measures **0.92-1.09 ms** across tile sizes 512-2048: the
in-kernel fp32 LayerNorm (two cross-lane reductions + normalization per
layer, kept fp32 for flax parity) costs more VPU time than the saved HBM
traffic. The production D step therefore keeps ``generator.apply``; the
2.44 ms "fake generation" row in bench_profile's evolving-chain ablation
bounds the *ablation delta*, not the raw forward. The kernel remains
correct (interpret-mode test) for future re-measurement on hardware with
a different VPU/HBM balance.

Architecture handled (models/point_sdf_net.py SDFGenerator, parity with
/root/reference/model/point_sdf_net.py:83-117):

  * LayerNorm after layers 0..6, computed in fp32 in-kernel (matching
    flax's fp32-stats semantics under a bf16 dtype);
  * the latent enters ADDITIVELY at layers 0 and n/2 (zz1/zz2 rows,
    precomputed in XLA — two tiny [B,128]x[128,256] matmuls);
  * a positional skip concat at layer n/2, decomposed into
    x @ W4x + pos @ W4p (bit-equivalent fan-in split, the same trick as
    ops/sdf_mlp.py);
  * the raw (no tanh) [256 → 1] head as a VPU row-dot.

Each tile belongs to ONE batch item (tile | N), so the per-item zz rows are
selected by the BlockSpec index map — no in-kernel gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6  # flax.linen.LayerNorm default


def _ln_relu(x_f32, gamma_ref, beta_ref, row):
    """fp32 LayerNorm over the channel axis + relu (flax keeps LN statistics
    in fp32 under a bf16 dtype — normalization._compute_stats)."""
    mean = jnp.mean(x_f32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x_f32 - mean), axis=1, keepdims=True)
    y = (x_f32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    y = y * gamma_ref[row][None, :].astype(jnp.float32) \
        + beta_ref[row][None, :].astype(jnp.float32)
    return jax.nn.relu(y)


def _kernel(ptsT_ref, zz1_ref, zz2_ref, w0p_ref, w4p_ref, w_ref, b_ref,
            gamma_ref, beta_ref, w7row_ref, out_ref):
    """One point-tile program of the fused 8-layer generator trunk.

    ptsT_ref:  [8, T] transposed tile (rows 0-2 = xyz, rest zero)
    zz1/zz2:   [1, 1, C] this tile's batch item's additive latent row
               (carried as [B, 1, C] so the (1, 1, C) block satisfies the
               Mosaic last-two-dims rule; selected by the index map)
    w0p/w4p:   [8, C] fan-in weights for the raw-position matmuls
    w_ref:     [6, C, C] stacked (lin1, lin2, lin3, lin4_x, lin5, lin6)
    b_ref:     [8, C] rows (b0..b6, b7 broadcast)
    gamma/beta:[8, C] LayerNorm scale/bias rows 0..6 (row 7 unused)
    w7row_ref: [1, C] head weight as a row
    """
    f32 = jnp.float32
    cd = ptsT_ref.dtype
    pts = ptsT_ref[:, :].T  # [T, 8]

    # Layer 0: pos @ W0 + b0 + zz1, LN0, relu.
    x = (jnp.dot(pts, w0p_ref[:, :], preferred_element_type=f32)
         + b_ref[0][None, :].astype(f32) + zz1_ref[0, 0][None, :].astype(f32))
    x = _ln_relu(x, gamma_ref, beta_ref, 0).astype(cd)

    for layer in range(3):  # lin1, lin2, lin3
        x = (jnp.dot(x, w_ref[layer], preferred_element_type=f32)
             + b_ref[layer + 1][None, :].astype(f32))
        x = _ln_relu(x, gamma_ref, beta_ref, layer + 1).astype(cd)

    # Layer 4: concat(x, pos) @ W4 = x @ W4x + pos @ W4p, + b4 + zz2.
    x = (jnp.dot(x, w_ref[3], preferred_element_type=f32)
         + jnp.dot(pts, w4p_ref[:, :], preferred_element_type=f32)
         + b_ref[4][None, :].astype(f32) + zz2_ref[0, 0][None, :].astype(f32))
    x = _ln_relu(x, gamma_ref, beta_ref, 4).astype(cd)

    for layer in (4, 5):  # lin5, lin6
        x = (jnp.dot(x, w_ref[layer], preferred_element_type=f32)
             + b_ref[layer + 1][None, :].astype(f32))
        x = _ln_relu(x, gamma_ref, beta_ref, layer + 1).astype(cd)

    # Raw head (no tanh): VPU row-dot + scalar bias.
    head = jnp.sum(x.astype(f32) * w7row_ref[0, :].astype(f32)[None, :], axis=1)
    out_ref[0, :] = head + b_ref[7, :].astype(f32)[0]


@functools.partial(jax.jit, static_argnames=("tile", "compute_dtype", "interpret"))
def generate_fused(params, pos, z, tile: int = 1024,
                   compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Fused forward of the default SDFGenerator: pos [B, N, 3], z [B, L]
    → [B, N, 1] float32 (raw SDF values, matching ``SDFGenerator.apply``
    with ``norm=True, num_layers=8, dropout=0`` to compute-dtype tolerance).

    ``tile`` must divide N so every tile maps to one batch item (the caller
    dispatches to the XLA path otherwise — see :func:`generate_best`).
    """
    cd = compute_dtype
    b, n, _ = pos.shape
    c = params["lin1"]["kernel"].shape[0]
    assert n % tile == 0, "tile must divide the per-item point count"
    rows = b * n

    flat = pos.reshape(rows, 3)
    ptsT = jnp.zeros((8, rows), cd).at[:3].set(flat.T.astype(cd))

    zc = z.astype(cd)
    zz1 = (jnp.dot(zc, params["z_lin1"]["kernel"].astype(cd),
                   preferred_element_type=cd)
           + params["z_lin1"]["bias"].astype(cd))[:, None, :]
    zz2 = (jnp.dot(zc, params["z_lin2"]["kernel"].astype(cd),
                   preferred_element_type=cd)
           + params["z_lin2"]["bias"].astype(cd))[:, None, :]

    w0p = jnp.zeros((8, c), cd).at[:3].set(params["lin0"]["kernel"].astype(cd))
    # lin4 consumes concat(x[0:c], pos[c:c+3]) — split the kernel rows.
    w4 = params["lin4"]["kernel"]
    w4x = w4[:c].astype(cd)
    w4p = jnp.zeros((8, c), cd).at[:3].set(w4[c:].astype(cd))

    w_stack = jnp.stack([params[k]["kernel"].astype(cd)
                         for k in ("lin1", "lin2", "lin3")] + [w4x]
                        + [params[k]["kernel"].astype(cd)
                           for k in ("lin5", "lin6")])
    b_stack = jnp.stack(
        [params[f"lin{i}"]["bias"] for i in range(7)]
        + [jnp.full((c,), params["lin7"]["bias"][0],
                    dtype=params["lin0"]["bias"].dtype)]
    ).astype(cd)
    pad_row = jnp.zeros((c,), cd)
    gamma = jnp.stack([params[f"norm{i}"]["scale"].astype(cd)
                       for i in range(7)] + [pad_row])
    beta = jnp.stack([params[f"norm{i}"]["bias"].astype(cd)
                      for i in range(7)] + [pad_row])
    w7row = params["lin7"]["kernel"].astype(cd).T  # [1, c]

    tiles_per_item = n // tile
    const = lambda j: (0, 0)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((1, rows), jnp.float32),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda j: (j // tiles_per_item, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda j: (j // tiles_per_item, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, c, c), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),  # zz blocks revisit rows
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * 6 * c * c,
            bytes_accessed=rows * (8 * 2 + 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ptsT, zz1, zz2, w0p, w4p, w_stack, b_stack, gamma, beta, w7row)
    return out.reshape(b, n, 1)


_FORCE_FUSED_GENERATE = False  # A/B switch; see the rejection note above.


def generate_best(generator, params, pos, z):
    """Forward-only fake-cloud generation. The XLA path won the round-4
    measurement (module docstring), so this dispatches to
    ``generator.apply`` unless _FORCE_FUSED_GENERATE re-enables the kernel
    for A/B re-measurement."""
    kernel_ok = (
        _FORCE_FUSED_GENERATE
        and jax.default_backend() == "tpu"
        and pos.ndim == 3
        and generator.norm
        and generator.num_layers == 8
        and generator.dropout == 0.0
        and pos.shape[1] >= 1024
        and pos.shape[1] % 1024 == 0
    )
    if kernel_ok:
        return generate_fused(params, pos, z)
    return generator.apply({"params": params}, pos, z)
