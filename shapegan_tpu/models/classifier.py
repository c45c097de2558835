"""3D CNN voxel category classifier.

Architecture parity with /root/reference/model/classifier.py:3-33:
Conv3d(12, k5) + ReLU + MaxPool(2) → Conv3d(16, k5) + ReLU + MaxPool(2) →
Conv3d(32, k5) + ReLU → flatten → Linear(label_count) → Softmax.

The reference ships the network with no training script; we also provide
``scripts/train_classifier.py`` so the component is actually exercisable.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from shapegan_tpu.models import make_torch_bias_init, torch_uniform_init


class Classifier(nn.Module):
    label_count: int

    @nn.compact
    def __call__(self, x, *, return_logits: bool = False):
        if x.ndim == 3:
            x = x[None, ...]
        if x.ndim == 4:
            x = x[..., None]  # NDHWC channel axis

        conv = lambda f, in_ch: nn.Conv(
            f, kernel_size=(5, 5, 5), padding="VALID", kernel_init=torch_uniform_init,
            bias_init=make_torch_bias_init(in_ch * 125),
        )
        x = nn.relu(conv(12, 1)(x))
        x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
        x = nn.relu(conv(16, 12)(x))
        x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
        x = nn.relu(conv(32, 16)(x))
        x = x.reshape((x.shape[0], -1))
        logits = nn.Dense(
            self.label_count, kernel_init=torch_uniform_init,
            bias_init=make_torch_bias_init(x.shape[-1]),
        )(x)
        if return_logits:
            return logits
        return jnp.asarray(nn.softmax(logits, axis=1))
