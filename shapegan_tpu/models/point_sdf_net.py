"""Point-set SDF GAN networks.

Parity with /root/reference/model/point_sdf_net.py:
  * :class:`PointNet` — a per-point MLP 4→64→128→256→512 followed by a max
    pool over the point axis (or a segment-max over a ragged batch vector)
    and an MLP 512→256→128→out. The reference's optional ``torch_scatter``
    dependency becomes ``jax.ops.segment_max``.
  * :class:`SDFGenerator` — a parameterized batched DeepSDF variant
    ([B, N, 3] + z → [B, N, 1]) with LayerNorm, a mid-network positional
    skip concat, and the latent injected *additively* through two Linear
    projections at layer 0 and layer n/2 (reference :83-84, :108-112).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from shapegan_tpu.models import make_torch_bias_init, torch_uniform_init


class PointNet(nn.Module):
    """(pos, sdf) point-set critic. ``out_channels=1`` for the WGAN critic.

    ``dtype`` is the computation/activation dtype (params stay fp32, the
    returned logits are fp32): at the trainer workloads (batch 32 × 4096
    points) every layer is HBM-bandwidth-bound on its activation traffic
    (~64-512 fp32 channels × 131k rows), so bf16 activations halve the
    step's dominant cost — the same master-weight scheme as the
    autodecoder's (train/sdf_autodecoder.py COMPUTE_DTYPE), gated by the
    same grad-cosine test (tests/test_train_point_gan.py)."""

    out_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        pos,
        dist,
        batch: Optional[jax.Array] = None,
        num_segments: Optional[int] = None,
        mask: Optional[jax.Array] = None,
    ):
        """``batch``+``num_segments`` pools ragged flat point sets via
        segment-max (the reference's optional torch_scatter path). ``mask``
        [..., N] instead excludes points from the max pool — the TPU-native
        (static-shape) representation of ragged per-shape subsets used by the
        refinement trainer (/root/reference/train_point_gan_ref.py:31-51)."""
        if dist.shape[-1] != 1:
            dist = dist[..., None]
        x = jnp.concatenate([pos, dist], axis=-1)

        dense = lambda f, fan: nn.Dense(
            f, kernel_init=torch_uniform_init, bias_init=make_torch_bias_init(fan),
            dtype=self.dtype,
        )
        for features in (64, 128, 256):
            x = nn.relu(dense(features, x.shape[-1])(x))
        x = dense(512, x.shape[-1])(x)

        if batch is None:
            if mask is not None:
                x = jnp.where(mask[..., None], x, -jnp.inf)
            x = jnp.max(x, axis=-2)
        else:
            if num_segments is None:
                raise ValueError("num_segments must be static when using a batch vector")
            x = jax.ops.segment_max(x, batch, num_segments=num_segments)

        for features in (256, 128):
            x = nn.relu(dense(features, x.shape[-1])(x))
        return dense(self.out_channels, x.shape[-1])(x).astype(jnp.float32)


class SDFGenerator(nn.Module):
    """Batched implicit SDF generator: (pos [B, N, 3], z [B, L]) → [B, N, 1].

    The final layer's output is raw (no tanh), matching the reference where
    the last Linear maps hidden→1 with no activation (:114-117 guard).
    """

    latent_channels: int = 128
    hidden_channels: int = 256
    num_layers: int = 8
    norm: bool = True
    dropout: float = 0.0
    # Computation/activation dtype; params and returned SDF values stay
    # fp32 (see PointNet.dtype). flax LayerNorm computes its statistics in
    # fp32 regardless, so bf16 here only touches matmul/activation traffic.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pos, z, *, train: bool = False, rng: Optional[jax.Array] = None):
        assert self.num_layers % 2 == 0
        if pos.ndim == 2:
            pos = pos[None, ...]
        if z.ndim == 1:
            z = z[None, ...]
        assert pos.shape[-1] == 3 and z.shape[-1] == self.latent_channels
        assert pos.shape[0] == z.shape[0]

        half = self.num_layers // 2
        z_dense = lambda name: nn.Dense(
            self.hidden_channels, kernel_init=torch_uniform_init,
            bias_init=make_torch_bias_init(self.latent_channels), name=name,
            dtype=self.dtype,
        )
        z1 = z_dense("z_lin1")(z)
        z2 = z_dense("z_lin2")(z)

        dropout_rng = rng
        pos = pos.astype(self.dtype)
        x = pos
        for i in range(self.num_layers):
            if i == half:
                x = jnp.concatenate([x, pos], axis=-1)
            out_features = 1 if i == self.num_layers - 1 else self.hidden_channels
            x = nn.Dense(
                out_features, kernel_init=torch_uniform_init,
                bias_init=make_torch_bias_init(x.shape[-1]), name=f"lin{i}",
                dtype=self.dtype,
            )(x)
            if i == 0:
                x = x + z1[:, None, :]
            if i == half:
                x = x + z2[:, None, :]
            if i < self.num_layers - 1:
                if self.norm:
                    x = nn.LayerNorm(name=f"norm{i}", dtype=self.dtype)(x)
                x = nn.relu(x)
                if self.dropout > 0.0 and train:
                    if dropout_rng is None:
                        dropout_rng = self.make_rng("dropout")
                    dropout_rng, sub = jax.random.split(dropout_rng)
                    keep = jax.random.bernoulli(sub, 1.0 - self.dropout, x.shape)
                    x = jnp.where(keep, x / (1.0 - self.dropout), 0.0)
        return x.astype(jnp.float32)
