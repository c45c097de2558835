"""Data prep: native/numpy SDF engine, prep pipeline end-to-end on generated
meshes, taxonomy metadata, example fixture."""

import os

import numpy as np
import pytest

from shapegan_tpu.data.mesh_io import TriangleMesh, load_mesh
from shapegan_tpu.data.mesh_to_sdf import (
    BadMeshException,
    MeshSDF,
    mesh_to_voxels,
    sample_sdf_near_surface,
    sample_surface_sdf,
    sample_uniform_sdf,
)
from shapegan_tpu.data.prepare import (
    PrepareConfig,
    combine_sdf_clouds,
    process_mesh_files,
    write_split_file,
)
from shapegan_tpu.data.shapenet import ShapeNetMetadata
from shapegan_tpu.examples import example_chair_mesh, example_chair_sdf


def make_sphere_mesh(res=32, radius=0.6):
    from shapegan_tpu.data.synthetic import sphere_sdf
    from shapegan_tpu.ops.coords import voxel_coordinate_grid
    from shapegan_tpu.ops.mesh_extract import extract_mesh

    vox = sphere_sdf(voxel_coordinate_grid(res), radius=radius).astype(np.float32)
    v, f = extract_mesh(vox, spacing=2.0 / (res - 1), origin=(-1, -1, -1))
    return TriangleMesh(v, f).weld()


def test_sdf_engine_accuracy_on_sphere():
    mesh = make_sphere_mesh()
    oracle = MeshSDF(mesh)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (3000, 3)).astype(np.float32)
    sdf = oracle.query(pts)
    true = np.linalg.norm(pts, axis=1) - 0.6
    assert np.abs(sdf - true).mean() < 0.01
    assert (((sdf < 0) == (true < 0)).mean()) > 0.99


def test_numpy_fallback_matches_native():
    # parity method: exercises the BVH-vs-numpy distance/parity agreement
    # without the scan rasterization (scan fallback agreement is covered at
    # reduced scan params in test_scan_sign.py).
    mesh = make_sphere_mesh(res=16)
    pts = np.random.default_rng(1).uniform(-1, 1, (200, 3)).astype(np.float32)
    native = MeshSDF(mesh, sign_method="parity").query(pts)
    fallback = MeshSDF(mesh, use_native=False, sign_method="parity").query(pts)
    np.testing.assert_allclose(native, fallback, atol=1e-4)


def test_mesh_to_voxels_shape_and_sign():
    mesh = make_sphere_mesh()
    vox = mesh_to_voxels(mesh, voxel_resolution=16)
    assert vox.shape == (16, 16, 16)
    assert vox[8, 8, 8] < 0  # center inside
    assert vox[0, 0, 0] > 0  # corner outside


def test_sampling_apis():
    mesh = make_sphere_mesh().scaled_to_unit_sphere()
    uniform = sample_uniform_sdf(mesh, 2000, rng=np.random.default_rng(0))
    assert uniform.shape == (2000, 4)
    surface = sample_surface_sdf(mesh, 1000, rng=np.random.default_rng(0), seed=0)
    assert np.abs(surface[:, 3]).mean() < 0.1  # near-surface by construction
    pts, sdf = sample_sdf_near_surface(mesh, 3000, rng=np.random.default_rng(0))
    assert pts.shape == (3000, 3) and sdf.shape == (3000,)
    assert (np.abs(sdf) < 0.1).mean() > 0.5  # biased toward the surface


def test_bad_mesh_detection():
    # A tiny sliver far from covering 1% of the unit sphere volume.
    tiny = TriangleMesh(
        np.array([[0, 0, 0], [0.001, 0, 0], [0, 0.001, 0]], dtype=np.float32),
        np.array([[0, 1, 2]], dtype=np.int32),
    )
    with pytest.raises(BadMeshException):
        sample_uniform_sdf(tiny, 500, rng=np.random.default_rng(0))


def test_prepare_pipeline_end_to_end(tmp_path):
    # Write two meshes, run prep single-worker, verify layout + resume +
    # combine + split.
    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    make_sphere_mesh(res=20, radius=0.5).save(str(mesh_dir / "sphere_a.obj"))
    make_sphere_mesh(res=20, radius=0.7).save(str(mesh_dir / "sphere_b.stl"))

    config = PrepareConfig(
        output_dir=str(tmp_path / "out"),
        voxel_resolutions=[8, 16],
        uniform_count=500,
        surface_count=500,
        cloud_count=1000,
        workers=1,
    )
    paths = sorted(str(p) for p in mesh_dir.iterdir())
    results = process_mesh_files(paths, config, workers=1)
    assert results == ["ok", "ok"]

    for res in (8, 16):
        assert (tmp_path / "out" / f"voxels_{res}" / "sphere_a.npy").exists()
    assert (tmp_path / "out" / "uniform" / "sphere_b.npy").exists()
    assert (tmp_path / "out" / "surface" / "sphere_a.npy").exists()
    assert (tmp_path / "out" / "cloud" / "sphere_a.npy").exists()

    # idempotent: second run skips everything
    assert process_mesh_files(paths, config, workers=1) == ["skipped", "skipped"]

    vox = np.load(tmp_path / "out" / "voxels_16" / "sphere_a.npy")
    assert vox.shape == (16, 16, 16)
    assert vox[8, 8, 8] < 0

    write_split_file(config)
    train = (tmp_path / "out" / "train.txt").read_text().strip().splitlines()
    test = (tmp_path / "out" / "test.txt").read_text().strip().splitlines()
    assert len(train) + len(test) == 2

    combine_sdf_clouds(config, out_dir=str(tmp_path))
    points = np.load(tmp_path / "sdf_points.npy")
    values = np.load(tmp_path / "sdf_values.npy")
    assert points.shape == (2000, 3) and values.shape == (2000,)


def test_shapenet_metadata_fallback():
    meta = ShapeNetMetadata(directory="/nonexistent")
    assert meta.label_count >= 5
    chair = meta.categories["03001627"]
    assert chair.name == "chair"
    assert meta.label_for_directory("03001627") == chair.label
    assert len(meta.get_color(chair.label)) == 3


def test_example_chair():
    mesh = example_chair_mesh(resolution=32)
    assert len(mesh.faces) > 100
    lo, hi = mesh.bounding_box
    assert (lo > -1.01).all() and (hi < 1.01).all()
    # the seat region is inside the chair
    pts = np.array([[0.0, -0.1, 0.0], [0.9, 0.9, 0.9]], dtype=np.float32)
    sdf = example_chair_sdf(pts)
    assert sdf[0] < 0 < sdf[1]
