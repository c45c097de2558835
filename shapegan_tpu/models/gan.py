"""Voxel GAN: 3D-CNN generator and discriminator.

Architecture parity with /root/reference/model/gan.py:
  * Generator: z128 → reshape [1,1,1,128] → 4x ConvTranspose3d
    (256/128/64/1, k4, first stride 1 then stride 2) with BatchNorm +
    LeakyReLU(0.2) between and Tanh at the end → [B, 32, 32, 32].
  * Discriminator: 4x Conv3d (64/128/256/1, k4, stride 2/2/2/1) with
    LeakyReLU(0.2); optional final sigmoid (GAN) or raw score (WGAN critic).

WGAN weight clipping (/root/reference/model/gan.py:67-69) lives in
:func:`clip_parameters` as a pure pytree map — no mutable module state.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from shapegan_tpu import LATENT_CODE_SIZE
from shapegan_tpu.models import (
    make_torch_bias_init,
    torch_uniform_init,
    torch_uniform_init_transpose,
)


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class Generator(nn.Module):
    latent_code_size: int = LATENT_CODE_SIZE
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, z, *, train: bool = True):
        bn = lambda name: nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, axis_name=self.bn_axis_name, name=name,
            use_fast_variance=False,  # stable two-pass variance (see autoencoder.py)
        )
        x = z.reshape((-1, 1, 1, 1, self.latent_code_size))
        x = nn.ConvTranspose(
            256, kernel_size=(4, 4, 4), strides=(1, 1, 1), padding="VALID",
            kernel_init=torch_uniform_init_transpose,
            bias_init=make_torch_bias_init(256 * 64), name="convt0",
        )(x)
        x = _lrelu(bn("bn0")(x, use_running_average=not train))
        for i, features in enumerate((128, 64)):
            x = nn.ConvTranspose(
                features, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding="SAME",
                kernel_init=torch_uniform_init_transpose,
                bias_init=make_torch_bias_init(features * 64), name=f"convt{i + 1}",
            )(x)
            x = _lrelu(bn(f"bn{i + 1}")(x, use_running_average=not train))
        x = nn.ConvTranspose(
            1, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding="SAME",
            kernel_init=torch_uniform_init_transpose,
            bias_init=make_torch_bias_init(1 * 64), name="convt3",
        )(x)
        return jnp.tanh(jnp.squeeze(x, axis=-1))  # [B, 32, 32, 32]


class Discriminator(nn.Module):
    """32^3 voxel volume → per-sample score.

    ``use_sigmoid`` selects GAN (probability) vs WGAN-critic (raw) output,
    mirroring /root/reference/model/gan.py:47,56.
    """

    use_sigmoid: bool = True

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4:
            x = x[..., None]  # add channel axis (NDHWC)
        for i, (features, in_ch) in enumerate(((64, 1), (128, 64), (256, 128))):
            x = nn.Conv(
                features, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding=[(1, 1)] * 3,
                kernel_init=torch_uniform_init,
                bias_init=make_torch_bias_init(in_ch * 64), name=f"conv{i}",
            )(x)
            x = _lrelu(x)
        x = nn.Conv(
            1, kernel_size=(4, 4, 4), strides=(1, 1, 1), padding="VALID",
            kernel_init=torch_uniform_init,
            bias_init=make_torch_bias_init(256 * 64), name="conv3",
        )(x)
        x = x.reshape((x.shape[0],))
        return jax.nn.sigmoid(x) if self.use_sigmoid else x


def clip_parameters(params, limit: float):
    """WGAN weight clipping as a pure pytree transform
    (reference: /root/reference/model/gan.py:67-69)."""
    return jax.tree.map(lambda p: jnp.clip(p, -limit, limit), params)
