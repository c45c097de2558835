"""Mesh extraction, mesh IO, binary voxel meshing and the raymarcher,
verified against analytic SDFs."""



import pytest
import numpy as np
import jax

from shapegan_tpu.data.mesh_io import TriangleMesh, load_mesh
from shapegan_tpu.data.synthetic import sphere_sdf
from shapegan_tpu.ops.coords import voxel_coordinate_grid
from shapegan_tpu.ops.mesh_extract import extract_mesh, marching_cubes
from shapegan_tpu.render.binary_voxels import create_binary_voxel_mesh


def make_sphere_volume(res=32, radius=0.5):
    return sphere_sdf(voxel_coordinate_grid(res), radius=radius).astype(np.float32)


def test_extract_sphere_vertices_on_surface():
    res = 32
    voxels = make_sphere_volume(res)
    # spacing converts index space back to [-1, 1]
    vertices, faces = extract_mesh(voxels, level=0.0, spacing=2.0 / (res - 1), origin=(-1, -1, -1))
    assert vertices.shape[0] > 100
    radii = np.linalg.norm(vertices, axis=1)
    np.testing.assert_allclose(radii, 0.5, atol=0.02)


def test_extract_normals_point_outward():
    res = 24
    voxels = make_sphere_volume(res)
    vertices, faces = extract_mesh(voxels, level=0.0, spacing=2.0 / (res - 1), origin=(-1, -1, -1))
    tri = vertices[faces]  # [F, 3, 3]
    normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    centroids = tri.mean(axis=1)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    # outward = aligned with the radial direction for a sphere
    alignment = np.einsum("ij,ij->i", normals, centroids)
    assert (alignment > 0).mean() > 0.99


def test_extract_mesh_area_close_to_sphere():
    res = 48
    voxels = make_sphere_volume(res)
    vertices, faces = extract_mesh(voxels, level=0.0, spacing=2.0 / (res - 1), origin=(-1, -1, -1))
    mesh = TriangleMesh(vertices, faces)
    expected = 4 * np.pi * 0.5**2
    assert abs(mesh.area - expected) / expected < 0.05


def test_marching_cubes_facade():
    voxels = make_sphere_volume(16)
    verts, faces, normals, values = marching_cubes(voxels, level=0.0, spacing=(1.0, 1.0, 1.0))
    assert verts.shape[0] == normals.shape[0]
    assert faces.max() < verts.shape[0]


def test_empty_volume_gives_empty_mesh():
    voxels = np.ones((8, 8, 8), dtype=np.float32)
    vertices, faces = extract_mesh(voxels)
    assert vertices.shape[0] == 0


def test_mesh_weld_and_sample():
    voxels = make_sphere_volume(24)
    vertices, faces = extract_mesh(voxels, spacing=2.0 / 23, origin=(-1, -1, -1))
    soup = TriangleMesh(vertices, faces)
    welded = soup.weld()
    assert len(welded.vertices) < len(soup.vertices)
    assert abs(welded.area - soup.area) / soup.area < 1e-4
    pts = welded.sample(2000, seed=0)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 0.5, atol=0.03)


def test_mesh_io_roundtrip(tmp_path):
    voxels = make_sphere_volume(12)
    vertices, faces = extract_mesh(voxels, spacing=2.0 / 11, origin=(-1, -1, -1))
    mesh = TriangleMesh(vertices, faces).weld()
    for ext in ("obj", "stl"):
        path = str(tmp_path / f"sphere.{ext}")
        mesh.save(path)
        loaded = load_mesh(path)
        assert abs(loaded.area - mesh.area) / mesh.area < 1e-3


def test_scaling_conventions():
    rng = np.random.default_rng(0)
    mesh = TriangleMesh(rng.normal(2.0, 3.0, (30, 3)), np.arange(30).reshape(-1, 3))
    unit_sphere = mesh.scaled_to_unit_sphere()
    assert abs(np.linalg.norm(unit_sphere.vertices, axis=1).max() - 1.0) < 1e-5
    unit_cube = mesh.scaled_to_unit_cube()
    lo, hi = unit_cube.bounding_box
    assert abs((hi - lo).max() - 2.0) < 1e-5


def test_binary_voxel_mesh_cube_count():
    voxels = np.ones((4, 4, 4), dtype=np.float32)
    voxels[1, 1, 1] = -1.0  # one occupied voxel -> one cube = 12 triangles
    mesh = create_binary_voxel_mesh(voxels)
    assert len(mesh.faces) == 12
    assert len(mesh.vertices) == 8
    lo, hi = mesh.bounding_box
    np.testing.assert_allclose(lo, [1, 1, 1])
    np.testing.assert_allclose(hi, [2, 2, 2])


def test_binary_voxel_mesh_normals_outward():
    voxels = np.ones((4, 4, 4), dtype=np.float32)
    voxels[1:3, 1:3, 1:3] = -1.0
    mesh = create_binary_voxel_mesh(voxels)
    center = mesh.vertices.mean(axis=0)
    tri = mesh.triangles
    normals = mesh.face_normals
    outward = np.einsum("ij,ij->i", normals, tri.mean(axis=1) - center)
    assert (outward > 0).all()


@pytest.mark.slow
def test_sdfnet_get_mesh_and_raymarch_on_trained_sphere():
    """Overfit a tiny SDFNet to a sphere, then check BOTH inference paths:
    mesh extraction and the sphere-traced render."""
    import jax.numpy as jnp
    import optax

    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.render.raymarching import render_image

    net = SDFNet(latent_code_size=4, breadth=64)
    params = net.init(jax.random.PRNGKey(0))
    code = jnp.zeros(4)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.1, 1.1, (8192, 3)).astype(np.float32)
    target = np.clip(np.linalg.norm(pts, axis=1) - 0.5, -0.5, 0.5).astype(np.float32)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = net.apply_grid(p, jnp.asarray(pts), code[None])[0]
            return jnp.mean(jnp.abs(out - jnp.asarray(target)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    for _ in range(300):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.05

    mesh = net.get_mesh(params, code, voxel_resolution=32)
    assert mesh is not None
    radii = np.linalg.norm(mesh.vertices, axis=1)
    assert abs(np.median(radii) - 0.5) < 0.1

    image = render_image(net, params, code, resolution=64, ssaa=1, iterations=200)
    arr = np.asarray(image)
    assert arr.shape == (64, 64, 3)
    # the sphere must cover a plausible fraction of the frame
    non_background = (arr < 250).any(axis=2).mean()
    assert 0.05 < non_background < 0.9


@pytest.mark.slow
def test_shadow_bucket_holds_full_frame_mask():
    """Regression: at the fixed camera the shadow mask (model ∪ lit ground)
    covers ~0.67 of the frame; an n/2 shadow pre-compaction bucket
    overflowed ~0.17n lanes into the conservative shadowed fallback and
    rendered a flat gray band across the bottom of every large frame. A
    frame big enough to engage the staged schedules (n > 2048) must leave
    far-from-shadow ground pixels fully lit."""
    import jax.numpy as jnp

    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.render.raymarching import render_image

    net = SDFNet(latent_code_size=4, breadth=16)
    params = net.init(jax.random.PRNGKey(0))
    code = jnp.zeros(4)
    # An untrained tiny net is near-constant; force a small sphere by
    # overfitting a few steps is overkill here — sdf_offset shifts work
    # too, but simplest is a quick fit like the trained-sphere test.
    import optax

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.1, 1.1, (4096, 3)).astype(np.float32)
    target = np.clip(np.linalg.norm(pts, axis=1) - 0.4, -0.5, 0.5).astype(np.float32)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = net.apply_grid(p, jnp.asarray(pts), code[None])[0]
            return jnp.mean(jnp.abs(out - jnp.asarray(target)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    for _ in range(200):
        params, opt, loss = step(params, opt)

    image = np.asarray(render_image(net, params, code, resolution=96, ssaa=1,
                                    iterations=200))
    # Bottom corners: ground plane, far outside the sphere's shadow. They
    # must be lit (white), not the 0.35-darkened shadow gray.
    for corner in (image[-2, 1], image[-2, -2]):
        assert corner.min() >= 250, corner


def test_trace_compaction_is_semantics_preserving():
    """The staged trace's packed compaction (one [n,6|7] gather down + one
    [size,4] scatter back with the status bitcast into a float lane —
    render/raymarching.py:_trace_staged) must be bitwise invisible: a
    schedule with real bucket sizes must produce EXACTLY the points/status
    of the same stage structure with no-op buckets (size >= n skips the
    gather/scatter). Uses a random-init net with a positive sdf_offset so
    lanes march slowly and irregularly — active across every stage
    boundary, decaying gradually, hit/miss mix at the end."""
    import jax.numpy as jnp

    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.render import raymarching as rm

    net = SDFNet(latent_code_size=0, breadth=16)
    params = net.init(jax.random.PRNGKey(3))
    latent = jnp.zeros(0)

    cam = jnp.asarray(rm.CAMERA_POSITION, jnp.float32)
    points, dirs, entered = rm.camera_rays(cam, 72, xp=jnp)  # n=5184 > 2048
    status0 = jnp.where(entered, rm._ACTIVE, rm._MISS)
    n = points.shape[0]

    def run(kind, schedule, escape=None):
        fn = jax.jit(lambda p, s: rm._trace_staged(
            kind, params, latent, p, dirs, s, 220, 0.0005, 0.02, 0.03, 1.0,
            schedule, tail_cap=120, escape=escape))
        pts, st = fn(points, status0)
        return np.asarray(pts), np.asarray(st)

    # Generous buckets so no lane overflows (overflow degrades lanes
    # conservatively, which is correct but not bit-identical).
    real = ((0, -(-n * 9 // 10)), (60, -(-n * 3 // 4)), (40, -(-n // 2)))
    noop = ((0, n), (60, n), (40, n))
    p_real, s_real = run("primary", real)
    p_flat, s_flat = run("primary", noop)
    np.testing.assert_array_equal(s_real, s_flat)
    np.testing.assert_array_equal(p_real, p_flat)
    assert set(np.unique(s_real)) <= {rm._ACTIVE, rm._HIT, rm._MISS}

    # Shadow kind packs a 7th payload column (per-lane escape heights).
    esc = jnp.where(jnp.arange(n) % 2 == 0, 1.0, 0.6)
    p_real, s_real = run("shadow", ((40, -(-n * 3 // 4)),), escape=esc)
    p_flat, s_flat = run("shadow", ((40, n),), escape=esc)
    np.testing.assert_array_equal(s_real, s_flat)
    np.testing.assert_array_equal(p_real, p_flat)


def test_lanczos_downsample_matches_pil():
    """The on-device SSAA downsample vs PIL's Image.LANCZOS (the reference's
    resize, raymarching.py:176-177). Interior pixels must agree to within
    uint8 rounding; PIL renormalizes truncated border stencils while we
    edge-replicate, so the outer 3 pixels are excluded."""
    import jax.numpy as jnp
    from PIL import Image

    from shapegan_tpu.render.raymarching import _lanczos3_downsample

    rng = np.random.default_rng(7)
    for factor in (2, 3):
        big = rng.random((32 * factor, 32 * factor, 3)).astype(np.float32)
        ours = np.asarray(_lanczos3_downsample(jnp.asarray(big), factor))
        ours_u8 = np.round(np.clip(ours, 0, 1) * 255).astype(np.int32)
        pil = Image.fromarray(
            np.round(np.clip(big, 0, 1) * 255).astype(np.uint8), "RGB"
        ).resize((32, 32), Image.LANCZOS)
        pil_u8 = np.asarray(pil).astype(np.int32)
        diff = np.abs(ours_u8[3:-3, 3:-3] - pil_u8[3:-3, 3:-3])
        # PIL quantizes to uint8 BEFORE resampling here (the real pipeline
        # feeds PIL the already-quantized SSAA frame), so allow a few
        # rounding steps.
        assert diff.max() <= 4, diff.max()


def test_get_voxels_and_surface_points():
    import jax.numpy as jnp

    from shapegan_tpu.models.sdf_net import SDFNet

    net = SDFNet(latent_code_size=4, breadth=16)
    params = net.init(jax.random.PRNGKey(0))
    code = jnp.zeros(4)
    voxels = net.get_voxels(params, code, voxel_resolution=16, sphere_only=True)
    assert voxels.shape == (16, 16, 16)
    assert voxels[0, 0, 0] == 1.0  # outside the 1.1-sphere mask

    pts = net.get_surface_points(params, code, sample_size=2048, key=jax.random.PRNGKey(1))
    assert pts.ndim == 2 and pts.shape[1] == 3


def test_shadow_mask_capacity_exceeds_measured_fill():
    """The shadow pre-compaction bucket must be the GEOMETRIC capacity of
    the mask (entered-disc ∪ below-horizontal), not a measured fill: a
    shape filling the bounding sphere pushes the mask to ~0.89n at the
    reference camera, over the 3n/4 a chair-measured bucket allowed, and
    overflow lanes are never traced (they degrade to shadowed — the gray
    band regression)."""
    from shapegan_tpu.render.raymarching import CAMERA_POSITION, _shadow_mask_capacity

    size = 96
    n = size * size
    cap = _shadow_mask_capacity(CAMERA_POSITION, size)
    assert 3 * n // 4 < cap <= n, cap
    # 512-lane rounding keeps the jit cache small and the tiles MXU-friendly
    assert cap % 512 == 0 or cap == n


def test_render_image_crop_skips_device_downsample(monkeypatch):
    """Reference order (raymarching.py:170-177): crop happens at the SSAA
    frame size, THEN the image resizes to resolution². With crop=True the
    device downsample must therefore be skipped (ssaa=1 reaches
    _render_pixels) and the final image still comes out resolution²."""
    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.render import raymarching as rm

    seen = {}

    def fake_render_pixels(*args, **kwargs):
        seen.update(kwargs)
        size = kwargs["size"] // kwargs["ssaa"]
        frame = np.full((size, size, 3), 255, np.uint8)
        # a small dark square so crop_image has content to find
        frame[size // 4 : size // 2, size // 4 : size // 2] = 10
        return frame

    monkeypatch.setattr(rm, "_render_pixels", fake_render_pixels)
    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    code = np.zeros(128, np.float32)

    img = rm.render_image(net, params, code, resolution=32, ssaa=2, crop=True,
                          iterations=8)
    assert seen["ssaa"] == 1 and seen["size"] == 64  # full SSAA frame kept
    assert img.size == (32, 32)  # cropped region resized to resolution²

    seen.clear()
    img = rm.render_image(net, params, code, resolution=32, ssaa=2, crop=False,
                          iterations=8)
    assert seen["ssaa"] == 2  # no crop: downsample on device as before
    assert img.size == (32, 32)


def test_shadow_mask_capacity_cached():
    from shapegan_tpu.render import raymarching as rm

    rm._shadow_mask_capacity_cached.cache_clear()
    a = rm._shadow_mask_capacity(rm.CAMERA_POSITION, 64)
    b = rm._shadow_mask_capacity(rm.CAMERA_POSITION, 64)
    assert a == b
    assert rm._shadow_mask_capacity_cached.cache_info().hits >= 1


def test_render_image_sequence_matches_sequential():
    """Frame-parallel rendering (one frame per device) returns bitwise the
    same frames as the sequential path, in order, on the virtual device
    mesh."""
    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.render.raymarching import render_image, render_image_sequence

    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    codes = [np.zeros(128, np.float32),
             np.full(128, 0.05, np.float32),
             np.full(128, -0.05, np.float32)]
    kw = dict(resolution=24, ssaa=1, iterations=8, sdf_offset=0.1)
    seq = [render_image(net, params, c, **kw) for c in codes]
    par = render_image_sequence(net, params, codes, devices=jax.devices()[:3], **kw)
    assert len(par) == len(seq)
    for a, b in zip(par, seq):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_render_image_sequence_on_frame_callback():
    """on_frame fires exactly once per frame with the frame's latent-code
    index, on both the multi-device (device-pinned workers) and
    single-device paths. With a callback the default is streaming mode
    (returns None — bounded memory for long animations); keep_results=True
    additionally collects the SAME image objects the callback saw."""
    import threading

    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.render.raymarching import render_image_sequence

    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    codes = [np.full(128, 0.02 * i, np.float32) for i in range(5)]
    kw = dict(resolution=24, ssaa=1, iterations=8, sdf_offset=0.1)

    for devices in (jax.devices()[:3], jax.devices()[:1]):
        seen = {}
        lock = threading.Lock()

        def on_frame(i, img):
            with lock:
                assert i not in seen, f"on_frame fired twice for frame {i}"
                seen[i] = img

        out = render_image_sequence(net, params, codes, devices=devices,
                                    on_frame=on_frame, **kw)
        assert out is None  # streaming default: nothing retained
        assert sorted(seen) == list(range(len(codes)))

        seen.clear()
        out = render_image_sequence(net, params, codes, devices=devices,
                                    on_frame=on_frame, keep_results=True, **kw)
        assert sorted(seen) == list(range(len(codes)))
        for i, img in enumerate(out):
            assert seen[i] is img
