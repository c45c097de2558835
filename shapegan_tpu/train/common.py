"""Shared training infrastructure.

Reproduces the reference's observability conventions (SURVEY.md §5):
space-separated CSV logs in ``plots/`` (append-on-continue, flushed per
epoch), rolling 50-step histories for printed numbers, epoch-resume, the
per-epoch "latest slot" + periodic snapshot checkpoint cadence — and adds
what the reference lacks: step timing as a first-class metric and optional
``jax.profiler`` traces.
"""

from __future__ import annotations

import collections
import os
import time
from typing import Optional

import jax
import numpy as np

from shapegan_tpu.util import ensure_directory, create_text_slice


class CSVLogger:
    """Space-separated CSV in the reference's format; the line count doubles
    as resume state (/root/reference/train_sdf_autodecoder.py:49-51)."""

    def __init__(self, path: str, resume: bool = False):
        ensure_directory(os.path.dirname(path) or ".")
        self.path = path
        self.first_epoch = 0
        if resume and os.path.exists(path):
            with open(path) as f:
                self.first_epoch = sum(1 for _ in f)
        self._file = open(path, "a" if resume else "w")

    def write(self, *values) -> None:
        self._file.write(" ".join(_fmt(v) for v in values) + "\n")
        self._file.flush()

    def close(self) -> None:
        self._file.close()


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def effective_batch_size(requested: int, dataset_len: int) -> int:
    """Clamp the batch size to the dataset size.

    The loaders drop the final partial batch to keep jitted step shapes
    static (one compile per run); the reference's DataLoader instead yields
    partial batches (drop_last defaults to False). Without this clamp a
    dataset smaller than one batch would yield ZERO batches and train
    nothing — with it, small datasets train on a single full-dataset batch,
    which is the closest static-shape equivalent of the reference semantics.
    """
    if dataset_len <= 0:
        raise ValueError("dataset is empty — nothing to train on")
    if dataset_len < requested:
        print(
            f"Dataset has only {dataset_len} samples; clamping batch size "
            f"{requested} -> {dataset_len}."
        )
        return dataset_len
    return requested


class RollingHistory:
    """Rolling mean over the last N steps (reference uses deque(maxlen=50))."""

    def __init__(self, maxlen: int = 50):
        self._values = collections.deque(maxlen=maxlen)

    def append(self, value) -> None:
        self._values.append(float(value))

    @property
    def mean(self) -> float:
        return float(np.mean(self._values)) if self._values else float("nan")

    def __len__(self):
        return len(self._values)


class EpochTimer:
    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.duration = time.time() - self.start
        return False


class StepProfiler:
    """Per-step wall-clock stats + optional jax.profiler trace of a step window."""

    def __init__(self, trace_dir: Optional[str] = None, trace_steps: range = range(0)):
        self.trace_dir = trace_dir
        self.trace_steps = trace_steps
        self.step = 0
        self.times = collections.deque(maxlen=200)
        self._tracing = False

    def __enter__(self):
        if self.trace_dir and self.step in self.trace_steps and not self._tracing:
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        if self._tracing and self.step not in self.trace_steps:
            jax.profiler.stop_trace()
            self._tracing = False
        self.step += 1
        return False

    @property
    def mean_step_time(self) -> float:
        """Mean over recent steps, excluding compile outliers: samples more
        than 20x the median are dropped (first-call jit compiles)."""
        if not self.times:
            return float("nan")
        times = np.asarray(self.times)
        median = np.median(times)
        return float(times[times <= 20 * median].mean())


def maybe_print_slice(volume, enabled: bool, scale: float = 1.0) -> None:
    """The reference's headless visual check (show_slice flag,
    /root/reference/train_gan.py:108-110)."""
    if enabled:
        print(create_text_slice(np.asarray(jax.device_get(volume)) / scale))


def resolve_voxel_dataset(config, resolution: int = 32, rescale_sdf: bool = True, clamp: float = 0.1):
    """Voxel dataset resolution order: synthetic (if requested) → split file →
    glob — mirroring the reference's per-trainer dataset constructors
    (/root/reference/train_autoencoder.py:24, train_hybrid_progressive_gan.py:43)."""
    import os

    from shapegan_tpu.data.datasets import ArrayDataset, VoxelDataset
    from shapegan_tpu.data.synthetic import make_voxel_dataset

    if config.synthetic:
        return ArrayDataset(
            make_voxel_dataset(
                config.synthetic, resolution, clamp=clamp, rescale=rescale_sdf, seed=config.seed
            )
        )
    split = os.path.join(config.data_dir, config.category, "train.txt")
    pattern_dir = os.path.join(config.data_dir, config.category, f"voxels_{resolution}")
    if os.path.exists(split):
        return VoxelDataset.from_split(
            os.path.join(pattern_dir, "{:s}.npy"), split, clamp=clamp, rescale_sdf=rescale_sdf
        )
    return VoxelDataset.glob(os.path.join(pattern_dir, "**.npy"), clamp=clamp, rescale_sdf=rescale_sdf)


def make_viewer(nogui: bool):
    """Create the GL live viewer unless nogui / unavailable.

    Returns an object with set_voxels/set_mesh/stop or None. Never raises —
    headless hosts simply train without the viewer.
    """
    if nogui:
        return None
    try:
        from shapegan_tpu.render.viewer import MeshRenderer

        return MeshRenderer()
    except Exception as e:  # pragma: no cover - depends on GL availability
        print(f"Viewer unavailable ({type(e).__name__}: {e}); continuing headless.")
        return None
