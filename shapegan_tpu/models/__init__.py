"""The network zoo.

All seven reference network families (SURVEY.md §2.1), re-implemented as
flax.linen modules (conv stacks) or pure-function kernels (the implicit MLP):

  * :class:`~shapegan_tpu.models.autoencoder.Autoencoder` — 32^3 voxel AE/VAE
  * :class:`~shapegan_tpu.models.gan.Generator` / ``Discriminator`` — voxel GAN
  * :class:`~shapegan_tpu.models.progressive_gan.ProgressiveDiscriminator`
  * :class:`~shapegan_tpu.models.classifier.Classifier`
  * :class:`~shapegan_tpu.models.point_sdf_net.PointNet` / ``SDFGenerator``
  * :class:`~shapegan_tpu.models.sdf_net.SDFNet` — DeepSDF wrapper over
    :mod:`shapegan_tpu.ops.sdf_mlp`

Voxel tensors are NDHWC (channels-last — the TPU-native conv layout), with the
channel axis added/stripped at the module boundary so trainers see plain
[B, res, res, res] volumes like the reference.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from shapegan_tpu import LATENT_CODE_SIZE  # noqa: F401

MODEL_PATH = "models"
LATENT_CODES_FILENAME = "sdf_net_latent_codes"


def torch_uniform_init(key, shape, dtype=jnp.float32):
    """PyTorch's default Linear/Conv weight init: kaiming_uniform(a=sqrt(5)),
    i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    For linen kernels the shape is (*spatial, in, out) for convs and
    (in, out) for Dense; fan_in = prod(shape[:-1]).
    """
    fan_in = math.prod(shape[:-1])
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def torch_uniform_init_transpose(key, shape, dtype=jnp.float32):
    """PyTorch's default ConvTranspose weight init.

    Torch stores transposed-conv weights as (in, out, *k) and computes
    fan_in from dim 1 — i.e. out_channels * prod(k), NOT in_channels *
    prod(k). Linen ConvTranspose kernels are (*spatial, in, out), so the
    torch-equivalent fan_in is shape[-1] * prod(shape[:-2])."""
    fan_in = shape[-1] * math.prod(shape[:-2])
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)

    return init
