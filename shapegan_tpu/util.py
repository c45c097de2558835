"""Cross-cutting utilities.

Behavioral parity with the reference's ``util.py`` (/root/reference/util.py):
ASCII SDF slice rendering, unit-sphere rejection sampling, image cropping and
directory bootstrap — re-expressed for numpy/JAX arrays.
"""

from __future__ import annotations

import os

import numpy as np

CHARACTERS = "      `.-:/+osyhdmm###############"


def ensure_directory(directory: str) -> None:
    os.makedirs(directory, exist_ok=True)


def probe_jax_backend(timeout_s: float = 120.0):
    """``(device_count, detail)`` for the platform jax would select here,
    probed in a throwaway subprocess so a hung backend bringup (e.g. a dead
    remote-TPU tunnel, which hangs the first ``jax.devices()`` touch FOREVER)
    cannot hang the caller. ``device_count`` is -1 on failure or timeout;
    ``detail`` then carries the reason. The one probe shared by bench.py's
    fail-fast guard and __graft_entry__'s ambient-device check, so the
    banner-stripping stdout parse and the diagnostics live in one place."""
    import subprocess
    import sys

    # The probe must EXECUTE a computation and pull its value, not just
    # enumerate devices: an observed tunnel failure mode (round 5) answers
    # jax.devices() fine while every compile/execute RPC hangs forever.
    probe_src = (
        "import jax, jax.numpy as jnp; "
        "assert float(jnp.ones((8, 8)).sum()) == 64.0; "
        "print(len(jax.devices()))"
    )
    try:
        result = subprocess.run(
            [sys.executable, "-c", probe_src],
            capture_output=True, text=True, timeout=timeout_s,
        )
        if result.returncode == 0:
            # last line: skips any banner/warning noise printed before it
            return int(result.stdout.strip().splitlines()[-1]), ""
        tail = (result.stderr or "").strip().splitlines()[-1:]
        return -1, tail[0] if tail else f"probe exited {result.returncode}"
    except subprocess.TimeoutExpired:
        return -1, f"backend bringup still hung after {timeout_s:.0f} s"
    except Exception as exc:  # pragma: no cover - probe plumbing
        return -1, repr(exc)


def create_text_slice(voxels) -> str:
    """ASCII-art density slice of a voxel SDF volume.

    Matches /root/reference/util.py:17-29: takes the x-slice at ``res // 4``,
    maps SDF in [-1, 1] onto a density ramp, thins rows by a factor of 2.2
    (terminal aspect compensation) and renders bottom-up.

    Accepts a numpy array or a JAX array of shape [res, res, res].
    """
    voxels = np.asarray(voxels)
    resolution = voxels.shape[-1]
    center = voxels.shape[-1] // 4
    data = voxels[center, :, :]
    data = np.clip(data * -0.5 + 0.5, 0.0, 1.0) * (len(CHARACTERS) - 1)
    data = data.astype(np.int32)
    lines = ["|" + "".join(CHARACTERS[i] for i in line) + "|" for line in data]
    rows = []
    for i in range(resolution):
        if len(rows) < i / 2.2:
            rows.append(lines[i])
    frame = "+" + "—" * resolution + "+\n"
    return frame + "\n".join(reversed(rows)) + "\n" + frame


def get_points_in_unit_sphere(n: int, rng: np.random.Generator | None = None) -> np.ndarray:
    """Rejection-sample ``n`` points uniformly inside the unit sphere.

    Host-side helper (parity with /root/reference/util.py:32-39). For jitted
    on-device sampling use :func:`shapegan_tpu.ops.coords.sample_unit_sphere`.
    """
    if rng is None:
        rng = np.random.default_rng()
    x = rng.random((int(n * 2.5), 3), dtype=np.float32) * 2.0 - 1.0
    x = x[np.linalg.norm(x, axis=1) < 1.0][:n]
    if x.shape[0] < n:
        print("Warning: Did not find enough points.")
    return x


def crop_image(image: np.ndarray, background=255) -> np.ndarray:
    """Crop an image to a square around its non-background content.

    Parity with /root/reference/util.py:41-58.
    """
    mask = image[:, :] != background
    if mask.ndim == 3:
        mask = mask.any(axis=-1)
    coords = np.array(np.nonzero(mask))

    if coords.size != 0:
        top_left = np.min(coords, axis=1)
        bottom_right = np.max(coords, axis=1)
    else:
        top_left = np.array((0, 0))
        bottom_right = np.array(image.shape[:2])
        print("Warning: Image contains only background pixels.")

    half_size = int(max(bottom_right[0] - top_left[0], bottom_right[1] - top_left[1]) / 2)
    center = ((top_left + bottom_right) / 2).astype(int)
    center = (
        min(max(half_size, center[0]), image.shape[0] - half_size),
        min(max(half_size, center[1]), image.shape[1] - half_size),
    )
    if half_size > 100:
        image = image[
            center[0] - half_size : center[0] + half_size,
            center[1] - half_size : center[1] + half_size,
        ]
    return image
