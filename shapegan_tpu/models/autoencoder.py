"""32^3 voxel (variational) autoencoder.

Architecture parity with /root/reference/model/autoencoder.py:7-105:
encoder = 4x Conv3d(k4, s2/s2/s2/s1) + BatchNorm + LeakyReLU(0.2) with
channels 1→24→48→96→256, flatten, Linear→128 (VAE: +BN+LReLU and separate
mean / log-variance heads with reparameterization); decoder mirrors it with
transposed convolutions. Channel multiplier ``amcm = 24``.

TPU-native differences: NDHWC layout, BatchNorm batch-stats carried as an
explicit flax collection (and optionally synchronized across the data mesh
axis via ``axis_name`` — the reference's BN stats are per-GPU under
DataParallel, so per-device stats are also faithful).
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

AUTOENCODER_MODEL_COMPLEXITY_MULTIPLIER = 24
amcm = AUTOENCODER_MODEL_COMPLEXITY_MULTIPLIER


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class Autoencoder(nn.Module):
    is_variational: bool = True
    latent_code_size: int = LATENT_CODE_SIZE
    bn_axis_name: Optional[str] = None  # set to 'data' for cross-device BN stats

    def setup(self):
        # use_fast_variance=False: the E[x^2]-E[x]^2 shortcut is catastrophic-
        # cancellation-prone in fp32 and makes gradients partitioning-order
        # dependent; the two-pass variance is stable and SPMD-reproducible.
        bn = lambda: nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, axis_name=self.bn_axis_name, use_fast_variance=False
        )
        # bias fan-in follows torch: Conv = in_ch*k^3, ConvTranspose = out_ch*k^3
        conv = lambda f, in_ch, s, p: nn.Conv(
            f, kernel_size=(4, 4, 4), strides=(s,) * 3, padding=p,
            kernel_init=torch_uniform_init, bias_init=make_torch_bias_init(in_ch * 64),
        )
        convt = lambda f, s, p: nn.ConvTranspose(
            f, kernel_size=(4, 4, 4), strides=(s,) * 3, padding=p,
            kernel_init=torch_uniform_init_transpose, bias_init=make_torch_bias_init(f * 64),
        )
        halve = [(1, 1)] * 3

        self.enc_convs = [
            conv(amcm, 1, 2, halve),
            conv(2 * amcm, amcm, 2, halve),
            conv(4 * amcm, 2 * amcm, 2, halve),
            conv(self.latent_code_size * 2, 4 * amcm, 1, "VALID"),
        ]
        self.enc_bns = [bn() for _ in range(4)]
        self.enc_dense = nn.Dense(
            self.latent_code_size, kernel_init=torch_uniform_init,
            bias_init=make_torch_bias_init(self.latent_code_size * 2),
        )

        if self.is_variational:
            self.vae_bn = bn()
            self.encode_mean = nn.Dense(
                self.latent_code_size, kernel_init=torch_uniform_init,
                bias_init=make_torch_bias_init(self.latent_code_size),
            )
            self.encode_log_variance = nn.Dense(
                self.latent_code_size, kernel_init=torch_uniform_init,
                bias_init=make_torch_bias_init(self.latent_code_size),
            )

        self.dec_dense = nn.Dense(
            self.latent_code_size * 2, kernel_init=torch_uniform_init,
            bias_init=make_torch_bias_init(self.latent_code_size),
        )
        self.dec_bn_dense = bn()
        self.dec_convts = [
            convt(4 * amcm, 1, "VALID"),
            convt(2 * amcm, 2, "SAME"),
            convt(amcm, 2, "SAME"),
            convt(1, 2, "SAME"),
        ]
        self.dec_bns = [bn() for _ in range(3)]

    def encode(
        self,
        x,
        *,
        train: bool = True,
        rng: Optional[jax.Array] = None,
        return_mean_and_log_variance: bool = False,
    ):
        # [B, 32, 32, 32] (or flat) -> NDHWC
        x = x.reshape((-1, 32, 32, 32, 1))
        for conv, bn in zip(self.enc_convs, self.enc_bns):
            x = _lrelu(bn(conv(x), use_running_average=not train))
        x = x.reshape((x.shape[0], -1))
        x = self.enc_dense(x)

        if not self.is_variational:
            return x

        x = _lrelu(self.vae_bn(x, use_running_average=not train))
        mean = self.encode_mean(x)

        log_variance = None
        if train or return_mean_and_log_variance:
            log_variance = self.encode_log_variance(x)

        if train:
            if rng is None:
                rng = self.make_rng("reparam")
            std = jnp.exp(log_variance * 0.5)
            eps = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
            z = mean + std * eps
        else:
            z = mean

        if return_mean_and_log_variance:
            return z, mean, log_variance
        return z

    def decode(self, z, *, train: bool = True):
        if z.ndim == 1:
            z = z[None, :]
        x = _lrelu(self.dec_bn_dense(self.dec_dense(z), use_running_average=not train))
        x = x.reshape((-1, 1, 1, 1, self.latent_code_size * 2))
        for i, convt in enumerate(self.dec_convts[:-1]):
            x = _lrelu(self.dec_bns[i](convt(x), use_running_average=not train))
        x = self.dec_convts[-1](x)
        return jnp.squeeze(x, axis=-1)

    def __call__(self, x, *, train: bool = True, rng: Optional[jax.Array] = None):
        if self.is_variational:
            z, mean, log_variance = self.encode(
                x, train=train, rng=rng, return_mean_and_log_variance=True
            )
            return self.decode(z, train=train), mean, log_variance
        return self.decode(self.encode(x, train=train), train=train)

    @property
    def checkpoint_name(self) -> str:
        base = f"autoencoder-{self.latent_code_size:d}"
        return ("variational-" + base) if self.is_variational else base
