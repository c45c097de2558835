"""Loss functions shared by the trainers.

Each function is a pure jnp function matching the reference's loss semantics
exactly (cited per function); all are jit/grad-compatible, including the
WGAN-GP gradient penalty which is expressed as grad-of-grad.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def sdf_reconstruction_loss(output: jax.Array, target: jax.Array, interior_weight: float = 32.0) -> jax.Array:
    """Sign-weighted L1 reconstruction loss for SDF voxel volumes.

    Parity with /root/reference/train_autoencoder.py:57-62: absolute error,
    with the error on *occupied* voxels (target < 0) scaled by 32, then the
    mean over every element.
    """
    difference = jnp.abs(output - target)
    weight = jnp.where(target < 0, interior_weight, 1.0)
    return jnp.mean(difference * weight)


def kld_loss(mean: jax.Array, log_variance: jax.Array) -> jax.Array:
    """VAE KL divergence, normalized by element count.

    Parity with /root/reference/train_autoencoder.py:54-55.
    """
    return -0.5 * jnp.sum(1.0 + log_variance - mean**2 - jnp.exp(log_variance)) / mean.size


def voxel_sign_difference(output: jax.Array, target: jax.Array) -> jax.Array:
    """Fraction of voxels whose SDF sign disagrees.

    Parity with /root/reference/train_autoencoder.py:50-52.
    """
    wrong = (output * target) < 0
    return jnp.mean(wrong.astype(jnp.float32))


def bce_loss(predictions: jax.Array, targets: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Binary cross entropy over probabilities (discriminator outputs after
    sigmoid), matching ``torch.nn.functional.binary_cross_entropy`` as used at
    /root/reference/train_gan.py:30,78,84."""
    p = jnp.clip(predictions, eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))


def gradient_penalty(
    critic_fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    real: jax.Array,
    fake: jax.Array,
    weight: float = 10.0,
    norm_axes: tuple = None,
) -> jax.Array:
    """WGAN-GP gradient penalty on real/fake interpolates.

    Parity with /root/reference/train_hybrid_progressive_gan.py:102-111: a
    per-sample uniform interpolation coefficient, the L2 norm of
    d critic / d interpolate taken over all non-batch axes, and
    ``weight * mean((norm - 1)^2)``.

    ``critic_fn`` maps a batch of samples to per-sample scores. The
    grad-of-grad (the reference's ``autograd.grad(create_graph=True)``)
    happens naturally: this function is itself differentiated by the caller's
    ``jax.grad`` over critic parameters.
    """
    alpha = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1), dtype=real.dtype)
    interpolated = alpha * real + (1.0 - alpha) * fake

    def summed_critic(x):
        return jnp.sum(critic_fn(x))

    grads = jax.grad(summed_critic)(interpolated)
    if norm_axes is None:
        norm_axes = tuple(range(1, real.ndim))
    norms = jnp.sqrt(jnp.sum(grads**2, axis=norm_axes) + 1e-12)
    return weight * jnp.mean((norms - 1.0) ** 2)
