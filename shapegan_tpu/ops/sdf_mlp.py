"""The DeepSDF implicit-function MLP — the framework's hottest kernel.

Architecture parity with the reference ``SDFNet``
(/root/reference/model/sdf_net.py:23-61): an 8x256 ReLU MLP over
``concat(xyz, z128)`` with the raw input re-concatenated after layer 4 and a
final Tanh.

TPU-native formulation
----------------------
The reference materializes a per-point copy of the latent code
(``latent.repeat(res**3)``, /root/reference/train_hybrid_gan.py:63-66) and
concatenates it to every point before each of the two fan-in layers. On TPU
that is pure wasted HBM bandwidth. We instead split each fan-in layer's weight
matrix along its input axis:

    concat(p, z) @ W  ==  p @ W[:3]  +  z @ W[3:]

so the latent contribution is computed **once per shape** ([B, 256]) and
broadcast over its points by the compiler, while the point contribution is a
small [N, 3] x [3, 256] matmul. The math is bit-equivalent to the concat
formulation (verified in tests/test_sdf_mlp.py) but the per-point work is pure
256-wide GEMMs that map straight onto the MXU.

Three apply paths:
  * :func:`apply`        — per-point latents [N, L] (autodecoder training).
  * :func:`apply_grid`   — shared point set [P, 3] x shape latents [B, L]
                           (hybrid GAN dense-grid generation; the 4.2M
                           evals/step workload at 64^3).
  * :func:`apply_grid_fused` — the Pallas kernel path (see
                           :mod:`shapegan_tpu.ops.sdf_mlp_pallas`) with this
                           module's XLA path as fallback.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from shapegan_tpu import LATENT_CODE_SIZE

SDF_NET_BREADTH = 256

Params = Dict[str, jax.Array]


def _torch_linear_init(key, fan_in: int, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — the PyTorch nn.Linear default
    (kaiming_uniform with a=sqrt(5)), so training dynamics match the
    reference's initialization regime."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def init(key: jax.Array, latent_size: int = LATENT_CODE_SIZE, breadth: int = SDF_NET_BREADTH) -> Params:
    """Initialize SDFNet parameters.

    Weight storage is pre-split along the fan-in concat boundaries:
    ``w1p``/``w1z`` correspond to rows [0:3]/[3:3+L] of the reference's first
    Linear; ``w5h``/``w5p``/``w5z`` to rows [0:B]/[B:B+3]/[B+3:] of the
    reference's fifth Linear (layers2[0], whose input is cat(h, p, z)).
    """
    # One key per tensor: sharing a key between a weight and its bias makes
    # the bias exactly equal the weight's first row (counter-based PRNG), not
    # the independent draws of the PyTorch default this claims parity with.
    keys = jax.random.split(key, 18)
    b = breadth
    fi1 = 3 + latent_size
    fi5 = b + 3 + latent_size
    p = {
        "w1p": _torch_linear_init(keys[0], fi1, (3, b)),
        "w1z": _torch_linear_init(keys[1], fi1, (latent_size, b)),
        "b1": _torch_linear_init(keys[2], fi1, (b,)),
        "w2": _torch_linear_init(keys[3], b, (b, b)),
        "b2": _torch_linear_init(keys[13], b, (b,)),
        "w3": _torch_linear_init(keys[4], b, (b, b)),
        "b3": _torch_linear_init(keys[14], b, (b,)),
        "w4": _torch_linear_init(keys[5], b, (b, b)),
        "b4": _torch_linear_init(keys[15], b, (b,)),
        "w5h": _torch_linear_init(keys[6], fi5, (b, b)),
        "w5p": _torch_linear_init(keys[7], fi5, (3, b)),
        "w5z": _torch_linear_init(keys[8], fi5, (latent_size, b)),
        "b5": _torch_linear_init(keys[9], fi5, (b,)),
        "w6": _torch_linear_init(keys[10], b, (b, b)),
        "b6": _torch_linear_init(keys[16], b, (b,)),
        "w7": _torch_linear_init(keys[11], b, (b, b)),
        "b7": _torch_linear_init(keys[17], b, (b,)),
        "w8": _torch_linear_init(keys[12], b, (b, 1)),
        "b8": _torch_linear_init(jax.random.fold_in(keys[12], 1), b, (1,)),
    }
    return p


def _body(params: Params, x: jax.Array, p1: jax.Array, p5: jax.Array, dtype) -> jax.Array:
    """Shared trunk given precomputed fan-in contributions.

    ``p1``/``p5`` are the full pre-activation inputs of layers 1 and 5
    *minus* the hidden-state term (layer 5 adds ``x @ w5h``). Shapes
    broadcast: [..., breadth]. Matmul inputs are ``dtype`` (bf16 on TPU for
    MXU rate) but ALWAYS accumulate in fp32; activations are cast back to
    ``dtype`` between layers and the output is fp32.
    """
    f32 = jnp.float32
    w = {k: params[k].astype(dtype) for k in ("w2", "w3", "w4", "w5h", "w6", "w7", "w8")}
    bias = {k: params[k].astype(f32) for k in ("b2", "b3", "b4", "b6", "b7", "b8")}

    def layer(x, wk, extra):
        acc = jnp.dot(x, wk, preferred_element_type=f32) + extra
        return jax.nn.relu(acc).astype(dtype)

    x = jax.nn.relu(p1).astype(dtype)
    x = layer(x, w["w2"], bias["b2"])
    x = layer(x, w["w3"], bias["b3"])
    x = layer(x, w["w4"], bias["b4"])
    x = layer(x, w["w5h"], p5.astype(f32))
    x = layer(x, w["w6"], bias["b6"])
    x = layer(x, w["w7"], bias["b7"])
    x = jnp.tanh(jnp.dot(x, w["w8"], preferred_element_type=f32) + bias["b8"])
    return x[..., 0]


def apply(params: Params, points: jax.Array, latents: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Evaluate SDF at ``points`` [N, 3] with per-point latents [N, L] → [N].

    Equivalent to the reference forward (/root/reference/model/sdf_net.py:56-61).
    The fan-in dots keep ``preferred_element_type=dtype`` deliberately: the
    MXU accumulates in fp32 regardless (bf16 preferred only rounds the
    OUTPUT, one rounding like any layer), while a fp32 preferred type makes
    the pre-activations fp32 and so forces the backward's fan-in transpose
    matmuls to run with fp32 cotangents at fp32 rate — measured 1.5x slower
    per autodecoder train step.
    """
    pts = points.astype(dtype)
    z = latents.astype(dtype)
    p1 = (
        jnp.dot(pts, params["w1p"].astype(dtype), preferred_element_type=dtype)
        + jnp.dot(z, params["w1z"].astype(dtype), preferred_element_type=dtype)
        + params["b1"].astype(dtype)
    )
    p5 = (
        jnp.dot(pts, params["w5p"].astype(dtype), preferred_element_type=dtype)
        + jnp.dot(z, params["w5z"].astype(dtype), preferred_element_type=dtype)
        + params["b5"].astype(dtype)
    )
    return _body(params, pts, p1, p5, dtype)


def apply_grid(params: Params, grid_points: jax.Array, latents: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Evaluate a shared point set [P, 3] for every shape latent [B, L] → [B, P].

    This is the dense-grid generation path used by the hybrid GANs
    (the reference's ``generator(batch_grid_points, repeated_codes)`` at
    /root/reference/train_hybrid_progressive_gan.py:139). The latent
    projection is computed once per shape and broadcast — no [B*P, L]
    materialization ever exists.
    """
    pts = grid_points.astype(dtype)
    z = latents.astype(dtype)
    pp1 = jnp.dot(pts, params["w1p"].astype(dtype), preferred_element_type=dtype)  # [P, B']
    pp5 = jnp.dot(pts, params["w5p"].astype(dtype), preferred_element_type=dtype)
    zz1 = jnp.dot(z, params["w1z"].astype(dtype), preferred_element_type=dtype) + params["b1"].astype(dtype)
    zz5 = jnp.dot(z, params["w5z"].astype(dtype), preferred_element_type=dtype) + params["b5"].astype(dtype)
    p1 = pp1[None, :, :] + zz1[:, None, :]  # [B, P, breadth]
    p5 = pp5[None, :, :] + zz5[:, None, :]
    return _body(params, pts, p1, p5, dtype)


def apply_grid_remat(
    params: Params,
    grid_points: jax.Array,
    latents: jax.Array,
    chunk_size: int = 16384,
    dtype=jnp.float32,
) -> jax.Array:
    """Differentiable grid evaluation with rematerialization, for training
    losses over large grids.

    At the flagship workload (16 x 64^3) a plain backward stores eight
    [B, P, 256] fp32 activation tensors (~4.3 GB each) and overflows HBM.
    Here the point axis is scanned in chunks under ``jax.checkpoint``: the
    forward keeps only the [B, P] outputs and the backward recomputes one
    chunk's activations at a time (+1 forward of FLOPs, bounded memory).
    """
    p = grid_points.shape[0]
    pad = (-p) % chunk_size
    pts = jnp.pad(grid_points, ((0, pad), (0, 0)))
    chunks = pts.reshape(-1, chunk_size, 3)

    @jax.checkpoint
    def eval_chunk(params, latents, chunk):
        return apply_grid(params, chunk, latents, dtype=dtype)  # [B, chunk]

    out = jax.lax.map(lambda c: eval_chunk(params, latents, c), chunks)
    out = jnp.moveaxis(out, 0, 1).reshape(latents.shape[0], p + pad)
    return out[:, :p]


def apply_indexed(
    params: Params,
    points: jax.Array,
    latent_table: jax.Array,
    shape_indices: jax.Array,
    dtype=jnp.float32,
) -> jax.Array:
    """Evaluate points [N, 3] whose latent is ``latent_table[shape_indices]``.

    Autodecoder path (/root/reference/train_sdf_autodecoder.py:78-87):
    gather the [N, L] latent rows, then run the split fan-in matmuls.

    Formulation note (measured, round 3): projecting the whole table to
    [M, breadth] once and gathering the projections looks cheaper on paper
    (no per-point latent GEMM), but under ``jax.grad`` its latent-table
    cotangent is a scatter-add of [N, breadth] rows — and TPU scatters cost
    far more than the [N, L] scatter plus two MXU GEMMs of this
    formulation. The gather-then-matmul step measured ~1.27x faster
    end-to-end at the reference batch (20k points); bench.py's
    ``autodecoder_steps_per_sec`` baseline is exactly this trade.
    """
    pts = points.astype(dtype)
    z = latent_table.astype(dtype)[shape_indices]
    p1 = (
        jnp.dot(pts, params["w1p"].astype(dtype), preferred_element_type=dtype)
        + jnp.dot(z, params["w1z"].astype(dtype), preferred_element_type=dtype)
        + params["b1"].astype(dtype)
    )
    p5 = (
        jnp.dot(pts, params["w5p"].astype(dtype), preferred_element_type=dtype)
        + jnp.dot(z, params["w5z"].astype(dtype), preferred_element_type=dtype)
        + params["b5"].astype(dtype)
    )
    return _body(params, pts, p1, p5, dtype)


def fold_latent(params: Params, latent: jax.Array) -> Params:
    """Specialize the network to one FIXED latent code: fold the latent's two
    fan-in contributions into the layer-1/-5 biases and shrink ``w1z``/``w5z``
    to zero rows, yielding a latent-free (L=0) parameter set.

    ``apply_grid(folded, pts, latent[:0][None])`` is bit-identical in fp32 to
    ``apply_grid(params, pts, latent[None])`` — the z terms were rank-1
    updates independent of the points. Rendering paths evaluate millions of
    points against a single code (raymarching a frame, dense-grid mesh
    extraction), where this removes the 2x[L, 256] matmul work and the latent
    broadcast from EVERY evaluation: ~12% of trunk FLOPs at L=128, and the
    fused kernel's latent DMA disappears entirely.
    """
    z = latent.reshape(-1).astype(params["w1z"].dtype)
    folded = dict(params)
    folded["b1"] = params["b1"] + z @ params["w1z"]
    folded["b5"] = params["b5"] + z @ params["w5z"]
    folded["w1z"] = params["w1z"][:0]
    folded["w5z"] = params["w5z"][:0]
    return folded


def parameter_count(params: Params) -> int:
    return sum(int(v.size) for v in jax.tree.leaves(params))
