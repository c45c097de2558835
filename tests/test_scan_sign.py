"""Visibility-scan sign determination (the reference's virtual-scan method,
prepare_shapenet_dataset.py:32-35) vs ray parity, validated against analytic
truth on adversarial non-watertight fixtures.

The scan method's contract: a point is OUTSIDE iff some orthographic view can
see it; cavities invisible from every direction are inside. That makes
open-shell / double-walled / self-intersecting meshes (i.e. ShapeNet) give
usable SDF signs where crossing parity demonstrably does not — each test
here asserts both sides of that claim."""

import numpy as np
import pytest

from shapegan_tpu.data.fixtures import (
    box_mesh,
    double_wall_box,
    open_box,
    overlapping_union,
    uv_sphere_mesh,
)
from shapegan_tpu.data.mesh_to_sdf import MeshSDF

SCANS = dict(scan_count=50, scan_resolution=256)


def sign_of(oracle, points):
    return np.sign(oracle.query(np.asarray(points, np.float32)))


def test_watertight_sphere_scan_matches_parity_and_analytic():
    mesh = uv_sphere_mesh(radius=0.5)
    pts = np.array([
        [0.0, 0.0, 0.0], [0.3, 0.1, -0.2], [0.0, 0.45, 0.0],
        [0.7, 0.0, 0.0], [0.0, -0.8, 0.3], [0.9, 0.9, 0.9],
    ], np.float32)
    truth = np.sign(np.linalg.norm(pts, axis=1) - 0.5)
    scan = MeshSDF(mesh, sign_method="scan", **SCANS)
    parity = MeshSDF(mesh, sign_method="parity")
    np.testing.assert_array_equal(sign_of(scan, pts), truth)
    np.testing.assert_array_equal(sign_of(parity, pts), truth)
    # Magnitudes identical (shared BVH distance), only signs differ by method.
    np.testing.assert_allclose(
        np.abs(scan.query(pts)), np.abs(parity.query(pts)), atol=1e-6
    )


def test_open_shell_scan_sees_through_the_opening():
    """A box missing its +y face encloses nothing: its 'interior' is visible
    through the opening, so every sample is outside. Parity counts one
    crossing and wrongly calls the interior inside."""
    mesh = open_box(half_extents=(0.5, 0.5, 0.5), missing="+y")
    interior = np.array([
        [0.0, 0.0, 0.0], [0.2, -0.3, 0.1], [-0.3, 0.2, -0.2],
    ], np.float32)
    scan = MeshSDF(mesh, sign_method="scan", **SCANS)
    parity = MeshSDF(mesh, sign_method="parity")
    assert (sign_of(scan, interior) > 0).all(), "scan must see through the opening"
    assert (sign_of(parity, interior) < 0).any(), (
        "parity is expected to misclassify the open shell's interior (rays "
        "crossing the single shell wall count odd) — if this starts passing, "
        "the adversarial fixture no longer demonstrates the difference"
    )


def test_double_wall_cavity_is_solid_under_scans():
    """Double-walled shell: the inner hollow is invisible from outside. The
    scan method labels it inside (reference semantics: hidden cavities are
    solid); parity counts two crossings and wrongly calls it outside."""
    mesh = double_wall_box(outer=0.5, wall=0.1)
    hollow = np.array([
        [0.0, 0.0, 0.0], [0.1, 0.05, -0.1], [-0.2, 0.1, 0.2],
    ], np.float32)
    in_wall = np.array([[0.45, 0.0, 0.0], [0.0, -0.45, 0.1]], np.float32)
    outside = np.array([[0.8, 0.0, 0.0], [0.0, 0.9, 0.0]], np.float32)
    scan = MeshSDF(mesh, sign_method="scan", **SCANS)
    parity = MeshSDF(mesh, sign_method="parity")
    assert (sign_of(scan, hollow) < 0).all(), "hidden cavity must be inside"
    assert (sign_of(scan, in_wall) < 0).all()
    assert (sign_of(scan, outside) > 0).all()
    assert (sign_of(parity, hollow) > 0).all(), (
        "parity is expected to fail on double walls (even crossings)"
    )


def test_self_intersecting_union_overlap_is_inside():
    """Two interpenetrating boxes, interior walls retained: in the overlap a
    ray usually exits through two surfaces (even parity → wrongly outside);
    no scan can see the overlap, so the scan sign is correctly inside."""
    mesh = overlapping_union(offset=0.35, half=0.4)
    overlap = np.array([
        [0.0, 0.0, 0.0], [0.0, 0.2, -0.2], [0.02, -0.25, 0.15],
    ], np.float32)
    single = np.array([[-0.6, 0.0, 0.0], [0.6, 0.0, 0.0]], np.float32)
    outside = np.array([[0.0, 0.6, 0.0], [1.0, 0.0, 0.5]], np.float32)
    scan = MeshSDF(mesh, sign_method="scan", **SCANS)
    parity = MeshSDF(mesh, sign_method="parity")
    assert (sign_of(scan, overlap) < 0).all()
    assert (sign_of(scan, single) < 0).all()
    assert (sign_of(scan, outside) > 0).all()
    assert (sign_of(parity, overlap) > 0).all(), (
        "parity is expected to fail in self-intersection overlaps"
    )


def test_winding_does_not_matter():
    """ShapeNet windings are unreliable; both oracles must ignore them."""
    flipped = box_mesh((0.4, 0.4, 0.4), flip_winding=True)
    pts = np.array([[0.0, 0.0, 0.0], [0.8, 0.0, 0.0]], np.float32)
    scan = MeshSDF(flipped, sign_method="scan", **SCANS)
    assert sign_of(scan, pts)[0] < 0 and sign_of(scan, pts)[1] > 0


def test_numpy_fallback_matches_native_scan_signs():
    mesh = overlapping_union(offset=0.3, half=0.35)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.9, 0.9, (200, 3)).astype(np.float32)
    small = dict(scan_count=20, scan_resolution=96)
    native = MeshSDF(mesh, use_native=True, sign_method="scan", **small)
    fallback = MeshSDF(mesh, use_native=False, sign_method="scan", **small)
    if native._handle is None:
        pytest.skip("native library unavailable")
    s_native = native.query(pts)
    s_fallback = fallback.query(pts)
    # Identical scan geometry => identical signs away from the bias margin.
    clear = np.abs(s_native) > 4.0 * (2.0 * 1.02 * np.sqrt(3) * 0.35 / 96)
    agree = np.sign(s_native[clear]) == np.sign(s_fallback[clear])
    assert agree.mean() > 0.99, f"fallback disagrees on {(~agree).sum()} points"
    np.testing.assert_allclose(
        np.abs(s_native), np.abs(s_fallback), atol=5e-4
    )


def test_prepare_pipeline_defaults_to_scan_sign(tmp_path):
    """data/prepare.py must digest a non-watertight mesh with scan signs: an
    open box yields no interior → every uniform sample positive → the <1%
    occupancy guard quarantines it as a bad mesh (matching what the
    reference's scan method would do), instead of parity hallucinating an
    interior and emitting poisoned data."""
    from shapegan_tpu.data.mesh_io import save_obj
    from shapegan_tpu.data.prepare import PrepareConfig, process_mesh_file

    path = tmp_path / "open.obj"
    save_obj(open_box(), str(path))
    config = PrepareConfig(output_dir=str(tmp_path / "out"), make_voxels=False,
                           make_cloud=False, uniform_count=2000, surface_count=500)
    assert process_mesh_file(str(path), config) == "bad"
    assert (tmp_path / "out" / "open.badmesh").exists()


def test_scan_build_is_lazy():
    """The scan_count x res^2 z-buffer stack is only rasterized on the first
    scan-signed query — unsigned queries (and oracles that are never asked
    for a sign) skip the build entirely."""
    mesh = uv_sphere_mesh()
    oracle = MeshSDF(mesh, sign_method="scan", **SCANS)
    assert not oracle._scans_built
    d = oracle.query(np.array([[2.0, 0.0, 0.0]]), signed=False)
    assert not oracle._scans_built
    assert d[0] > 0
    s = oracle.query(np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]]))
    assert oracle._scans_built
    assert s[0] < 0 < s[1]
