"""Dataset semantics: clamp/rescale, constructors, loader behavior."""

import numpy as np
import pytest

from shapegan_tpu.data.datasets import ArrayDataset, BatchLoader, PointDataset, VoxelDataset
from shapegan_tpu.data.synthetic import write_voxel_dataset_files


def make_files(tmp_path, count=5, res=8):
    d = tmp_path / "voxels_8"
    names = write_voxel_dataset_files(str(d), count, resolution=res, seed=0)
    return d, names


def test_voxel_dataset_clamp_and_rescale(tmp_path):
    d, names = make_files(tmp_path)
    ds = VoxelDataset.glob(str(d / "*.npy"))
    item = ds[0]
    assert item.shape == (8, 8, 8)
    assert item.min() >= -1.0 and item.max() <= 1.0  # clamped to ±0.1, /0.1

    raw = VoxelDataset.glob(str(d / "*.npy"), rescale_sdf=False)
    item_raw = raw[0]
    assert abs(item_raw).max() <= 0.1 + 1e-6
    np.testing.assert_allclose(item, item_raw / 0.1, atol=1e-6)

    unclamped = VoxelDataset.glob(str(d / "*.npy"), clamp=None)
    assert abs(unclamped[0]).max() > 0.1  # raw SDF exceeds the clamp band


def test_voxel_dataset_from_split(tmp_path):
    d, names = make_files(tmp_path)
    split = tmp_path / "train.txt"
    split.write_text("\n".join(names[:3]) + "\nmissing_id\n")
    ds = VoxelDataset.from_split(str(d / "{:s}.npy"), str(split))
    assert len(ds) == 3  # missing ids are dropped


def test_voxel_dataset_glob_raises_when_empty(tmp_path):
    with pytest.raises(FileNotFoundError):
        VoxelDataset.glob(str(tmp_path / "nothing" / "*.npy"))


def test_point_dataset_from_split(tmp_path):
    root = tmp_path / "cat"
    (root / "uniform").mkdir(parents=True)
    (root / "surface").mkdir()
    rng = np.random.default_rng(0)
    for name in ("a", "b"):
        np.save(root / "uniform" / f"{name}.npy", rng.normal(size=(100, 4)).astype(np.float32))
        np.save(root / "surface" / f"{name}.npy", rng.normal(size=(100, 4)).astype(np.float32))
    (root / "train.txt").write_text("a\nb\n")
    ds = PointDataset.from_split(str(root), "train", num_points=32)
    uniform, surface = ds[0]
    assert uniform.shape == (32, 4) and surface.shape == (32, 4)


def test_batch_loader_shapes_and_drop_remainder():
    data = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    ds = ArrayDataset(data)

    loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_remainder=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2 and all(b.shape == (4, 3) for b in batches)

    loader2 = BatchLoader(ds, batch_size=4, shuffle=False, drop_remainder=False, seed=0)
    batches2 = list(loader2)
    assert len(batches2) == 3 and batches2[-1].shape == (2, 3)
    np.testing.assert_array_equal(np.concatenate(batches2), data)


def test_batch_loader_shuffles_between_epochs():
    ds = ArrayDataset(np.arange(64, dtype=np.float32).reshape(64, 1))
    loader = BatchLoader(ds, batch_size=64, shuffle=True, seed=0)
    first = next(iter(loader)).reshape(-1)
    second = next(iter(loader)).reshape(-1)
    assert not np.array_equal(first, second)
    np.testing.assert_array_equal(np.sort(first), np.sort(second))


def test_batch_loader_tuple_collation():
    class PairDataset:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return np.full((2,), i, np.float32), np.full((3,), -i, np.float32)

    loader = BatchLoader(PairDataset(), batch_size=3, shuffle=False)
    a, b = next(iter(loader))
    assert a.shape == (3, 2) and b.shape == (3, 3)


def test_batch_loader_auto_advances_epoch_without_set_epoch():
    """A consumer that never calls set_epoch must still get a fresh
    (seed, epoch, idx) subsample draw each pass — not the same fixed
    num_points subset of every shape forever. Pinned epochs (set_epoch)
    still reproduce exactly."""
    from shapegan_tpu.data.synthetic import SyntheticPointDataset

    ds = SyntheticPointDataset(2, pool_size=512, num_points=16, seed=0)
    loader = BatchLoader(ds, 2, shuffle=False, seed=0)
    first = [np.copy(b[0]) for b in loader]
    second = [np.copy(b[0]) for b in loader]
    assert not np.array_equal(first[0], second[0])

    loader.set_epoch(5)
    a = [np.copy(b[0]) for b in loader]
    loader.set_epoch(5)
    b = [np.copy(b[0]) for b in loader]
    np.testing.assert_array_equal(a[0], b[0])


def test_resident_batches_match_streaming_order_and_sharding():
    """ResidentBatches must be a pure transport change: same (seed, epoch)
    shuffle order and batch contents as BatchLoader + shard_batch, with the
    gathered batch sharded over 'data' on the mesh. A divergence here would
    silently change every voxel trainer's training trajectory when the
    dataset goes HBM-resident."""
    import jax

    from shapegan_tpu.parallel.mesh import DATA_AXIS, get_mesh, shard_batch
    from shapegan_tpu.train.common import ResidentBatches, make_voxel_batches

    data = np.random.default_rng(3).normal(size=(10, 4, 4, 4)).astype(np.float32)
    ds = ArrayDataset(data)
    mesh = get_mesh(batch_size=4)
    resident = ResidentBatches(data, mesh, 4, shuffle=True, drop_remainder=True, seed=7)
    loader = BatchLoader(ds, 4, shuffle=True, drop_remainder=True, seed=7)

    for epoch in (0, 3):
        resident.set_epoch(epoch)
        loader.set_epoch(epoch)
        got = [np.asarray(b) for b in resident]
        want = [np.asarray(shard_batch(mesh, b)) for b in loader]
        assert len(got) == len(want) == len(resident) == 2  # drop remainder
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    resident.set_epoch(0)
    batch = next(iter(resident))
    spec = batch.sharding.spec
    assert spec and spec[0] == DATA_AXIS


def test_make_voxel_batches_mode_selection():
    from shapegan_tpu.parallel.mesh import get_mesh
    from shapegan_tpu.train.common import (
        ResidentBatches,
        _StreamingBatches,
        make_voxel_batches,
    )

    data = np.zeros((8, 4, 4, 4), dtype=np.float32)
    ds = ArrayDataset(data)
    mesh = get_mesh(batch_size=4)
    assert isinstance(make_voxel_batches(ds, mesh, 4, 0, {}), ResidentBatches)
    assert isinstance(
        make_voxel_batches(ds, mesh, 4, 0, {"resident": "0"}), _StreamingBatches
    )
    # Over the (tiny, forced) byte cap -> streaming fallback.
    tiny_cap = {"resident_max_gb": 1e-9}
    assert isinstance(make_voxel_batches(ds, mesh, 4, 0, tiny_cap), _StreamingBatches)
    with pytest.raises(ValueError):
        make_voxel_batches(ds, mesh, 4, 0, {"resident": "sometimes"})
