"""Progressive-growing discriminator for the hybrid WGAN-GP (the paper's
headline model).

Architecture parity with /root/reference/model/progressive_gan.py:
  * ``RESOLUTIONS = [8, 16, 32, 64]``, ``FEATURE_COUNTS = [128, 64, 32, 1]``.
  * ``from_sdf`` zero-pads the single SDF channel up to the layer's expected
    feature count (the fromRGB analogue, reference :9-16).
  * One optional conv layer per resolution (k4, s2, LeakyReLU 0.2); at
    iteration ``i`` the input passes layers ``i, i-1, …, 0`` ending at a
    4^3 x 256 volume, then a shared Linear(64*256 → 128 → 1) head.
  * Fade-in: while ``fade_in_progress < 1`` the freshly-grown layer's output
    is blended with the previous iteration's path applied to a stride-2
    downsample ``x[:, ::2, ::2, ::2]`` (reference :48-50).

TPU-native design: all four optional layers' parameters always exist (one
static parameter pytree across growth iterations), and ``iteration`` is a
Python-static argument — each growth step is a new jit specialization, which
replaces the reference's ``strict=False`` partial checkpoint restore.
``fade_in_progress`` is a traced scalar so fade-in does NOT retrigger
compilation every batch.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from shapegan_tpu import LATENT_CODE_SIZE  # noqa: F401
from shapegan_tpu.models import make_torch_bias_init, torch_uniform_init

RESOLUTIONS = [8, 16, 32, 64]
FEATURE_COUNTS = [128, 64, 32, 1]
FINAL_LAYER_FEATURES = 256


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def from_sdf(x, iteration: int):
    """Zero-pad an SDF volume's channel dim to FEATURE_COUNTS[iteration].

    NDHWC analogue of /root/reference/model/progressive_gan.py:9-16.
    """
    resolution = RESOLUTIONS[iteration]
    target = FEATURE_COUNTS[iteration]
    x = x.reshape((-1, resolution, resolution, resolution, 1))
    if target > 1:
        pad = [(0, 0)] * 4 + [(0, target - 1)]
        x = jnp.pad(x, pad)
    return x


class ProgressiveDiscriminator(nn.Module):
    """Growing critic for 8^3 → 64^3 SDF volumes.

    ``iteration`` is passed per call (static); ``fade_in_progress`` is a
    traced scalar in [0, 1].

    ``entry_slice`` (default on) applies the entry conv with its kernel
    sliced to the one real input channel instead of zero-padding the input
    with ``from_sdf`` first — bit-exact (conv is linear; the padded channels
    are zero) but up to 32× fewer FLOPs in the entry layer, which sits at
    the iteration's largest spatial resolution. Measured on v5e at 32³
    batch 16: WGAN-GP critic step 8.6 → 5.1 ms. The reference genuinely
    computes the padded conv (/root/reference/model/progressive_gan.py:9-16,
    :44-47); bench.py uses ``entry_slice=False`` for the baseline runner.
    """

    entry_slice: bool = True

    def setup(self):
        self.optional_layers = [
            nn.Conv(
                FEATURE_COUNTS[i - 1] if i > 0 else FINAL_LAYER_FEATURES,
                kernel_size=(4, 4, 4),
                strides=(2, 2, 2),
                padding=[(1, 1)] * 3,
                kernel_init=torch_uniform_init,
                bias_init=make_torch_bias_init(FEATURE_COUNTS[i] * 64),
            )
            for i in range(len(FEATURE_COUNTS))
        ]
        self.head_dense1 = nn.Dense(
            128, kernel_init=torch_uniform_init,
            bias_init=make_torch_bias_init(64 * FINAL_LAYER_FEATURES),
        )
        self.head_dense2 = nn.Dense(
            1, kernel_init=torch_uniform_init, bias_init=make_torch_bias_init(128)
        )

    def _entry_conv(self, iteration: int, x):
        """The grown iteration's first conv on the raw 1-channel SDF volume.

        Init-time (and with ``entry_slice=False``) this is the literal
        reference computation — zero-pad channels, full conv — so the
        parameter pytree is identical either way; at apply time the sliced
        kernel computes the same values directly from the single channel.
        """
        if self.is_initializing() or not self.entry_slice or FEATURE_COUNTS[iteration] == 1:
            return self.optional_layers[iteration](from_sdf(x, iteration))
        p = self.variables["params"][f"optional_layers_{iteration}"]
        resolution = RESOLUTIONS[iteration]
        x = x.reshape((-1, resolution, resolution, resolution, 1))
        y = lax.conv_general_dilated(
            x, p["kernel"][:, :, :, :1, :], window_strides=(2, 2, 2),
            padding=[(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + p["bias"]

    def __call__(self, x, iteration: int = 0, fade_in_progress=1.0):
        x_in = x
        x = _lrelu(self._entry_conv(iteration, x))
        if iteration > 0:
            # Fade-in blends the freshly-grown layer's output with the RAW
            # zero-padded stride-2 downsample of the input (reference :48-50).
            # With fade_in_progress clipped to 1 the blend is the identity, so
            # it is safe (and retrace-free) to apply it unconditionally.
            down = x_in.reshape((-1,) + (RESOLUTIONS[iteration],) * 3)[:, ::2, ::2, ::2]
            x2 = from_sdf(down, iteration - 1)
            alpha = jnp.clip(fade_in_progress, 0.0, 1.0)
            x = alpha * x + (1.0 - alpha) * x2
        for i in range(iteration - 1, -1, -1):
            x = _lrelu(self.optional_layers[i](x))
        x = x.reshape((x.shape[0], -1))  # [B, 64 * 256]
        x = _lrelu(self.head_dense1(x))
        return self.head_dense2(x).reshape((-1,))
