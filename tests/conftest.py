"""Test configuration: force an 8-virtual-device CPU platform so sharding and
multi-chip code paths are exercised without TPU hardware (SURVEY.md §4).

Note: the environment may pre-set JAX_PLATFORMS (e.g. to a tunneled TPU
backend), so we must overwrite — not setdefault — and also update jax.config
after import, which wins over anything a sitecustomize hook re-exports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# PyOpenGL binds its function loader at first import; on this display-less CI
# host only the EGL loader can drive the viewer's headless surfaceless-GL
# path (test_software_render.py). Harmless for every other test: the pygame
# window init fails before any GL call either way.
os.environ.setdefault("PYOPENGL_PLATFORM", "egl")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"
