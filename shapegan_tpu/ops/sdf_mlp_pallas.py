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


def _kernel(pp1_ref, pp5_ref, zz1_ref, zz5_ref, w_ref, b_ref, w8_ref, out_ref):
    """One point-tile program of the fused trunk; loops over the (small)
    shape batch in-kernel, so the output block is a full [B, tile] stripe.

    w_ref: [6, 256, 256] stacked (w2, w3, w4, w5h, w6, w7)
    b_ref: [8, 256] rows (b2, b3, b4, unused, b6, b7, b8 broadcast, unused)
    w8_ref: [256, 128] (column 0 = the real head, rest zero-padding)
    """
    f32 = jnp.float32
    batch = zz1_ref.shape[0]

    def one_shape(b):
        x = jax.nn.relu(pp1_ref[:, :] + zz1_ref[b, :][None, :])
        for layer in range(3):  # w2, w3, w4
            x = jax.nn.relu(
                jnp.dot(x, w_ref[layer], preferred_element_type=f32).astype(x.dtype)
                + b_ref[layer][None, :]
            )
        x = jax.nn.relu(
            jnp.dot(x, w_ref[3], preferred_element_type=f32).astype(x.dtype)
            + pp5_ref[:, :]
            + zz5_ref[b, :][None, :]
        )
        for layer in (4, 5):  # w6, w7
            x = jax.nn.relu(
                jnp.dot(x, w_ref[layer], preferred_element_type=f32).astype(x.dtype)
                + b_ref[layer][None, :]
            )
        head = jnp.dot(x, w8_ref[:, :], preferred_element_type=f32)  # [T, 128]
        b8 = b_ref[6, :].astype(f32)[0]  # 32-bit scalar extract (Mosaic rule)
        out = jnp.tanh(head[:, 0] + b8)
        out_ref[b, :] = out.astype(out_ref.dtype)

    # Static unroll over the shape batch: dynamic sublane indices into the
    # packed bf16 latent rows are not provably aligned for Mosaic.
    for b in range(batch):
        one_shape(b)


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
    b_stack = b_stack[jnp.array([0, 1, 2, 5, 3, 4, 6, 7])]
    w8 = jnp.pad(params["w8"].astype(cd), ((0, 0), (0, 127)))

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
            pl.BlockSpec((breadth, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p_padded * 6 * breadth * breadth,
            bytes_accessed=2 * p_padded * breadth * 2 + b * p_padded * 4,
            transcendentals=b * p_padded,
        ),
    )(pp1, pp5, zz1, zz5, w_stack, b_stack, w8)
    return out[:, :p]


def apply_grid_best(params, grid_points, latents, dtype=jnp.float32):
    """Dispatch: fused Pallas kernel on TPU, XLA path elsewhere."""
    if jax.default_backend() == "tpu":
        return apply_grid_fused(params, grid_points, latents)
    return sdf_mlp.apply_grid(params, grid_points, latents, dtype=dtype)
