"""Input pipeline: voxel and point datasets + a prefetching batch loader.

Semantics parity with /root/reference/datasets.py:
  * :class:`VoxelDataset` — per-item ``np.load`` of one [res]^3 SDF grid,
    clamp to ±clamp and optional rescale to [-1, 1] (reference :16-23);
    constructors ``glob()`` (:25-32) and ``from_split()`` (:34-40).
  * :class:`PointDataset` — per-shape uniform + near-surface point files with
    random subsampling to ``num_points`` (reference :53-90).
  * :class:`BatchLoader` — replaces ``torch.utils.data.DataLoader``: threaded
    prefetch of shuffled fixed-size batches. Batches are dense numpy arrays
    ready for a single host→device transfer; the final short batch is
    dropped when ``drop_remainder`` (jit caches stay warm on one shape).
"""

from __future__ import annotations

import concurrent.futures
import glob as globlib
import os
from typing import Optional, Sequence

import numpy as np


class VoxelDataset:
    def __init__(self, files: Sequence[str], clamp: Optional[float] = 0.1, rescale_sdf: bool = True):
        self.files = list(files)
        self.clamp = clamp
        self.rescale_sdf = rescale_sdf

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, index: int) -> np.ndarray:
        array = np.load(self.files[index]).astype(np.float32)
        if self.clamp is not None:
            array = np.clip(array, -self.clamp, self.clamp)
            if self.rescale_sdf:
                array = array / self.clamp
        return array

    @staticmethod
    def glob(pattern: str, clamp: float = 0.1, rescale_sdf: bool = True) -> "VoxelDataset":
        files = sorted(globlib.glob(pattern, recursive=True))
        if not files:
            raise FileNotFoundError(f"No files found for glob pattern {pattern}.")
        return VoxelDataset(files, clamp=clamp, rescale_sdf=rescale_sdf)

    @staticmethod
    def from_split(pattern: str, split_file_name: str, clamp: float = 0.1, rescale_sdf: bool = True) -> "VoxelDataset":
        with open(split_file_name) as f:
            ids = [line.strip() for line in f if line.strip()]
        files = [pattern.format(i) for i in ids]
        files = [f for f in files if os.path.exists(f)]
        return VoxelDataset(files, clamp=clamp, rescale_sdf=rescale_sdf)

    def show(self, delay: float = 0.5) -> None:
        """Cycle the dataset's volumes through the GL viewer
        (reference datasets.py:42-50)."""
        import time

        from shapegan_tpu.render.viewer import MeshRenderer

        viewer = MeshRenderer()
        try:
            for item in self:
                viewer.set_voxels(item)
                time.sleep(delay)
        finally:
            viewer.stop()


class PointDataset:
    """Per-shape uniform + near-surface SDF point samples ([N, 4]: xyz + sdf).

    Subsampling is deterministic when ``seed`` is given: each item draws from
    ``default_rng((seed, epoch, idx))``, so an interrupted run resumed at
    epoch N sees exactly the samples the uninterrupted run would have (the
    reference's unseeded global np.random — datasets.py:74-75 — cannot make
    that guarantee). Trainers advance ``epoch`` via :meth:`set_epoch`
    (BatchLoader forwards it, including into process-pool workers)."""

    def __init__(self, root: str, filenames: Sequence[str], num_points: int = 1024,
                 seed: Optional[int] = None):
        self.root = os.path.expanduser(os.path.normpath(root))
        self.filenames = list(filenames)
        self.num_points = num_points
        self.seed = seed
        self.epoch = 0
        assert 0 < num_points <= 64**3

    def __len__(self) -> int:
        return len(self.filenames)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def _rng_for(self, idx: int) -> np.random.Generator:
        if self.seed is None:
            return np.random.default_rng()  # reference semantics: fresh draw
        return np.random.default_rng((self.seed, self.epoch, idx))

    def __getitem__(self, idx: int):
        name = self.filenames[idx]
        uniform = np.load(os.path.join(self.root, "uniform", f"{name}.npy")).astype(np.float32)
        surface = np.load(os.path.join(self.root, "surface", f"{name}.npy")).astype(np.float32)
        rng = self._rng_for(idx)
        sample = rng.choice(uniform.shape[0], self.num_points)
        if surface.shape[0] == uniform.shape[0]:
            # Reference parity: one shared index draw for both files
            # (/root/reference/datasets.py:74-75; prep writes equal counts).
            return uniform[sample], surface[sample]
        # Prep configured with distinct uniform/surface counts: reusing the
        # uniform indices would crash (or bias the surface subsample).
        return uniform[sample], surface[rng.choice(surface.shape[0], self.num_points)]

    @staticmethod
    def from_split(root: str, split: str, num_points: int = 1024,
                   seed: Optional[int] = None) -> "PointDataset":
        with open(os.path.join(root, f"{split}.txt")) as f:
            filenames = [line for line in f.read().split("\n") if line]
        return PointDataset(root, filenames, num_points, seed=seed)


class ArrayDataset:
    """Map-style dataset over an in-memory array (synthetic data / tests)."""

    def __init__(self, array: np.ndarray):
        self.array = array

    def __len__(self) -> int:
        return len(self.array)

    def __getitem__(self, index: int) -> np.ndarray:
        return self.array[index]


def _process_worker_init(dataset):
    """Runs in each loader worker process: pin the dataset as a global so
    tasks only ship index arrays, not the dataset."""
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _process_worker_collate(indices, epoch=None):
    # The worker's pinned dataset is a fork/spawn-time COPY — the parent's
    # set_epoch never reaches it, so the epoch rides along with each task.
    if epoch is not None and hasattr(_WORKER_DATASET, "set_epoch"):
        _WORKER_DATASET.set_epoch(epoch)
    items = [_WORKER_DATASET[int(i)] for i in indices]
    if isinstance(items[0], tuple):
        return tuple(np.stack(parts) for parts in zip(*items))
    return np.stack(items)


class BatchLoader:
    """Shuffled, parallel, prefetching batch iterator over a map-style dataset.

    The TPU-side replacement for DataLoader(num_workers=4..8)
    (/root/reference/train_autoencoder.py:25): workers load+collate batches
    ahead of the training loop so the host→device copy never waits on disk.

    Backends:
      * ``thread`` — a ThreadPoolExecutor; zero setup cost, scales while
        item decode releases the GIL (np.load IO does).
      * ``process`` — a persistent spawn-based process pool (the reference's
        DataLoader worker model); scales CPU-bound decode past the GIL.
      * ``auto`` (default) — processes for file-backed datasets on multicore
        hosts with several workers, threads otherwise (in-memory datasets
        gain nothing from shipping themselves to subprocesses).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_remainder: bool = False,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: Optional[int] = None,
        backend: str = "auto",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self._epoch = None
        self._epoch_pinned = False
        self._rng = np.random.default_rng(seed)
        if backend == "auto":
            in_memory = isinstance(dataset, ArrayDataset)
            multicore = (os.cpu_count() or 1) >= 4
            backend = "process" if (self.num_workers > 1 and multicore and not in_memory) else "thread"
        if backend not in ("thread", "process"):
            raise ValueError(f"unknown loader backend {backend!r}")
        self.backend = backend
        self._pool = None

    def _process_pool(self):
        """Lazy persistent worker pool. ``spawn`` (not fork): the training
        process has live XLA runtime threads by the time iteration starts,
        and forking those is undefined behavior — spawn re-imports cleanly
        and receives the (picklable) dataset once via the initializer."""
        if self._pool is None:
            import multiprocessing

            context = multiprocessing.get_context("spawn")
            self._pool = context.Pool(
                self.num_workers, initializer=_process_worker_init, initargs=(self.dataset,)
            )
        return self._pool

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle deterministically from (seed, epoch) so an
        interrupted run resumed at epoch N draws the exact batch order the
        uninterrupted run would have — the piece of resume reproducibility
        the reference never had (its DataLoader order is process-lifetime
        state). Forwards to the dataset (per-item subsample determinism);
        shuffle reseed is a no-op without a seed."""
        self._epoch = int(epoch)
        self._epoch_pinned = True
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        if self.seed is not None:
            self._rng = np.random.default_rng((self.seed, epoch))

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            chunk = order[start : start + self.batch_size]
            if self.drop_remainder and len(chunk) < self.batch_size:
                return
            yield chunk

    def _collate(self, indices):
        items = [self.dataset[int(i)] for i in indices]
        if isinstance(items[0], tuple):
            return tuple(np.stack(parts) for parts in zip(*items))
        return np.stack(items)

    def _iter_bounded(self, submit, resolve):
        """Epoch-order streaming with REAL back-pressure: at most
        ``num_workers + prefetch`` batches are submitted-but-unconsumed, so a
        slow training step bounds decoded-batch memory at window x batch
        bytes instead of the whole epoch (Pool.imap and eagerly-submitted
        executor futures both buffer every finished batch). The bounded
        in-flight deque is ``prefetch_to_device`` — same invariant, with
        ``submit`` as the dispatch and ``resolve`` joining each handle."""
        window = self.num_workers + self.prefetch
        for handle in prefetch_to_device(self._batch_indices(), submit, buffer_size=window):
            yield resolve(handle)

    def __iter__(self):
        # Epoch freshness without set_epoch: a consumer that just iterates
        # the loader repeatedly still advances the (seed, epoch, idx)
        # subsample keys each pass — otherwise an epoch-keyed dataset
        # (PointDataset with a seed) would silently serve the SAME
        # num_points subsample of every shape forever. Trainers that call
        # set_epoch (for resume reproducibility) pin the epoch explicitly
        # and are unaffected.
        if self._epoch_pinned:
            self._epoch_pinned = False
        else:
            self.set_epoch(0 if self._epoch is None else self._epoch + 1)
            self._epoch_pinned = False
        if self.backend == "process":
            # Early break / exception: the <= window already-submitted batches
            # finish decoding in the persistent pool and are dropped — bounded
            # waste, no cancellation API on apply_async.
            pool = self._process_pool()
            yield from self._iter_bounded(
                lambda idx: pool.apply_async(_process_worker_collate, (idx, self._epoch)),
                lambda r: r.get(),
            )
            return
        pool = concurrent.futures.ThreadPoolExecutor(self.num_workers)
        try:
            yield from self._iter_bounded(
                lambda idx: pool.submit(self._collate, idx),
                lambda fut: fut.result(),
            )
        finally:
            # Early break / exception: drop queued work so the epoch stops.
            pool.shutdown(wait=False, cancel_futures=True)


def prefetch_to_device(iterator, put, buffer_size: int = 2):
    """Double-buffered host→device pipeline: keep ``buffer_size`` batches
    already dispatched to the accelerator while the current step runs
    (the host→device half of the reference's DataLoader+pin_memory overlap;
    jax.device_put is async, so this overlaps the copy with compute).

    ``put`` maps a host batch to its device form (e.g.
    ``lambda b: shard_batch(mesh, b)``).
    """
    import collections

    buffer = collections.deque()
    it = iter(iterator)
    for _ in range(buffer_size):
        try:
            buffer.append(put(next(it)))
        except StopIteration:
            break
    while buffer:
        batch = buffer.popleft()
        try:
            buffer.append(put(next(it)))
        except StopIteration:
            pass
        yield batch
