"""Software rasterizer + shadow-mapped viewer pipeline.

Covers VERDICT.md round-1 item 6: two-pass shadow rendering (light-space
depth map, PCF 3x3 + bilinear shadow lerp, floor plane with shadow
darkening) — reference pipeline /root/reference/rendering/__init__.py:174-196,
fragment.glsl:16-73 — reimplemented GL-free so it runs headless.
"""

import numpy as np
import pytest

from shapegan_tpu.render.camera import get_camera_transform
from shapegan_tpu.render.software import _load_native, render_scene


def _box_scene():
    """A unit box hovering above the floor, as a triangle soup."""
    from shapegan_tpu.data.mesh_io import TriangleMesh

    lo, hi = -0.4, 0.4
    corners = np.array(
        [[x, y, z] for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)],
        np.float32,
    )
    faces = np.array(
        [(0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),   # x- x+
         (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),   # y- y+
         (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3)],  # z- z+
        np.int32,
    )
    mesh = TriangleMesh(corners, faces)
    tri = mesh.triangles.reshape(-1, 3).astype(np.float32)
    normals = np.repeat(mesh.face_normals, 3, axis=0).astype(np.float32)
    return tri, normals


def _render(use_native, size=160):
    tri, normals = _box_scene()
    camera_vp = get_camera_transform(2.4, 147, 20, project=True)
    light_vp = get_camera_transform(6.0, 147, 50, project=True)
    return render_scene(
        tri, normals, camera_vp, light_vp,
        size=size, shadow_size=256, ground_level=-0.8, draw_floor=True,
        albedo=(0.8, 0.1, 0.1), use_native=use_native,
    )


def test_software_render_shows_model_floor_and_shadow():
    img = _render(use_native=_load_native() is not None)
    assert img.shape == (160, 160, 3) and img.dtype == np.uint8
    # Model visible: reddish pixels (R channel dominant).
    red = (img[:, :, 0].astype(int) - img[:, :, 2].astype(int)) > 40
    assert red.sum() > 100, "model not visible"
    # Floor shadow visible: grey pixels well below white but equal channels
    # (fragment.glsl:71-73 mixes toward 0.4 grey under full shadow).
    grey = (
        (np.abs(img.astype(int)[:, :, 0] - img.astype(int)[:, :, 1]) < 3)
        & (np.abs(img.astype(int)[:, :, 1] - img.astype(int)[:, :, 2]) < 3)
        & (img[:, :, 0] < 200)
        & (img[:, :, 0] > 60)
    )
    assert grey.sum() > 50, "ground shadow not visible"
    # Shadowed floor darkens toward mix(1.0, 0.8*0.5, 1.0) = 0.4 -> 102.
    assert img[grey][:, 0].min() <= 130


def test_native_and_numpy_rasterizers_agree():
    if _load_native() is None:
        pytest.skip("native rasterizer unavailable")
    native = _render(use_native=True, size=120).astype(int)
    fallback = _render(use_native=False, size=120).astype(int)
    # Identical math; differences only at edge pixels from float ordering.
    assert np.abs(native - fallback).mean() < 1.0
    assert (np.abs(native - fallback) > 8).mean() < 0.01


def test_viewer_get_image_headless_ground_shadow():
    """MeshRenderer.get_image works with no display and shows a ground shadow
    (VERDICT.md item 6 'done' criterion, on the voxelized box)."""
    from shapegan_tpu.render.viewer import MeshRenderer

    # A table: wide thin top on a narrow pillar — the tabletop casts a ground
    # shadow that stays visible around the base (a solid cube would occlude
    # its own shadow from this camera).
    res = 32
    coords = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
    top = np.maximum.reduce([np.abs(x) - 0.7, np.abs(y - 0.4) - 0.08, np.abs(z) - 0.7])
    pillar = np.maximum.reduce([np.abs(x) - 0.1, np.abs(y + 0.2) - 0.6, np.abs(z) - 0.1])
    sdf = np.minimum(top, pillar)

    viewer = MeshRenderer(size=160, start_thread=False)
    viewer.set_voxels(sdf.astype(np.float32))
    img = viewer.get_image()
    assert img.shape == (160, 160, 3)
    grey = (
        (np.abs(img.astype(int)[:, :, 0] - img.astype(int)[:, :, 1]) < 3)
        & (np.abs(img.astype(int)[:, :, 1] - img.astype(int)[:, :, 2]) < 3)
        & (img[:, :, 0] < 200)
        & (img[:, :, 0] > 60)
    )
    assert grey.sum() > 30, "viewer image shows no ground shadow"
    viewer.stop()


def test_headless_gl_viewer_matches_software_twin():
    """The REAL GL pipeline — the inline GLSL, both render passes, the
    shadow-map FBO — executed headless via a surfaceless-EGL context
    (VERDICT round-3 item 8: the GL path previously never ran anywhere).
    The frame must agree with the software twin to near pixel identity:
    both implement the same derivation of the reference pipeline
    (rendering/__init__.py:174-196, fragment.glsl)."""
    from shapegan_tpu.data.mesh_io import TriangleMesh
    from shapegan_tpu.render.viewer import MeshRenderer

    tri, _ = _box_scene()
    mesh = TriangleMesh(
        tri.reshape(-1, 3), np.arange(len(tri), dtype=np.int32).reshape(-1, 3)
    )
    viewer = MeshRenderer(size=200, start_thread=False)
    try:
        viewer.use_headless_gl()
    except Exception as e:  # hosts without an EGL/Mesa stack
        pytest.skip(f"headless GL unavailable: {e}")
    viewer.set_mesh(mesh)
    viewer.ground_level = -0.8

    img_gl = viewer.get_image()           # GL path (offscreen FBO readback)
    img_sw = viewer._get_image_software() # software twin, same scene state

    assert img_gl.shape == (200, 200, 3)
    # Model actually rendered through GL (red pixels), not just cleared.
    red = (img_gl[:, :, 0].astype(int) - img_gl[:, :, 2].astype(int)) > 40
    assert red.sum() > 1000, "GL path rendered no model"
    # Twin agreement: measured mean|Δ| ≈ 0.06 intensity levels with ~0.1% of
    # pixels differing by >16 (rasterization edge rules); bound with margin.
    diff = np.abs(img_gl.astype(int) - img_sw.astype(int))
    assert diff.mean() < 1.0, f"GL and software frames diverge: mean {diff.mean():.2f}"
    assert (diff > 16).mean() < 0.01
    viewer.stop()


def test_crop_and_output_size_options():
    from shapegan_tpu.render.viewer import MeshRenderer

    viewer = MeshRenderer(size=120, start_thread=False)
    tri, normals = _box_scene()
    from shapegan_tpu.data.mesh_io import TriangleMesh

    mesh = TriangleMesh(
        tri.reshape(-1, 3), np.arange(len(tri), dtype=np.int32).reshape(-1, 3)
    )
    viewer.set_mesh(mesh)
    img = viewer.get_image(crop=True, output_size=64)
    assert img.shape == (64, 64, 3)
    grey_img = viewer.get_image(greyscale=True)
    assert grey_img.ndim == 2
    viewer.stop()


def test_windowed_viewer_event_loop_dummy_driver(monkeypatch, tmp_path):
    """The windowed live-training GUI path — render thread, event loop,
    mouse-drag rotation, R reset, F12 screenshot, QUIT shutdown
    (reference rendering/__init__.py:297-318) — executed headlessly under
    SDL's dummy video driver (VERDICT round-4 item 8: this thread/input
    code had never run anywhere).

    The dummy driver cannot create a GL context, so GL init/draw/readback
    are stubbed to the software twin (those pixels are covered by
    test_headless_gl_viewer_matches_software_twin); everything else — the
    _run loop, the lock discipline, the pygame event dispatch, the
    rotation/reset/screenshot handlers, stop() — is the production code."""
    import time

    from shapegan_tpu.data.mesh_io import TriangleMesh
    from shapegan_tpu.render.viewer import MeshRenderer

    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
    monkeypatch.chdir(tmp_path)  # save_screenshot writes ./screenshots/

    import pygame

    def fake_init_gl(self):
        pygame.init()
        pygame.display.set_mode((self.size, self.size))  # no OPENGL flag
        self._window = True

    monkeypatch.setattr(MeshRenderer, "_init_gl", fake_init_gl)
    monkeypatch.setattr(MeshRenderer, "_draw", lambda self: None)
    monkeypatch.setattr(
        MeshRenderer, "_get_image_gl", MeshRenderer._get_image_software
    )
    monkeypatch.setattr(pygame.display, "flip", lambda: None)

    viewer = MeshRenderer(size=96, start_thread=True)
    try:
        tri, _ = _box_scene()
        viewer.set_mesh(TriangleMesh(
            tri.reshape(-1, 3), np.arange(len(tri), dtype=np.int32).reshape(-1, 3)
        ))

        def wait_until(cond, timeout=10.0, what=""):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if cond():
                    return
                time.sleep(0.02)
            raise AssertionError(f"timed out waiting for {what}")

        wait_until(lambda: viewer._window is not None, what="window init")
        rotation0 = list(viewer.rotation)

        # Mouse drag: press, move, release -> rotation integrates event.rel.
        pygame.event.post(pygame.event.Event(
            pygame.MOUSEBUTTONDOWN, button=1, pos=(10, 10)))
        pygame.event.post(pygame.event.Event(
            pygame.MOUSEMOTION, rel=(40, 20), pos=(50, 30), buttons=(1, 0, 0)))
        pygame.event.post(pygame.event.Event(
            pygame.MOUSEBUTTONUP, button=1, pos=(50, 30)))
        wait_until(lambda: viewer.rotation != rotation0, what="drag rotation")
        assert viewer.rotation[0] == pytest.approx(rotation0[0] + 40 * 0.3)
        assert viewer.rotation[1] == pytest.approx(rotation0[1] + 20 * 0.3)

        # Motion without a held button must NOT rotate.
        settled = list(viewer.rotation)
        pygame.event.post(pygame.event.Event(
            pygame.MOUSEMOTION, rel=(25, 25), pos=(75, 55), buttons=(0, 0, 0)))
        time.sleep(0.2)
        assert viewer.rotation == settled

        # R resets the camera.
        pygame.event.post(pygame.event.Event(pygame.KEYDOWN, key=pygame.K_r))
        wait_until(lambda: viewer.rotation == rotation0, what="R reset")

        # F12 saves a screenshot through get_image (software-twin backed).
        pygame.event.post(pygame.event.Event(pygame.KEYDOWN, key=pygame.K_F12))
        shot = tmp_path / "screenshots" / "screenshot-0.png"
        wait_until(shot.exists, what="F12 screenshot")
        from PIL import Image

        img = np.asarray(Image.open(shot))
        assert img.shape == (96, 96, 3)
        red = (img[:, :, 0].astype(int) - img[:, :, 2].astype(int)) > 40
        assert red.sum() > 50, "screenshot shows no model"

        # QUIT ends the loop; the thread exits on its own.
        pygame.event.post(pygame.event.Event(pygame.QUIT))
        wait_until(lambda: not viewer.thread.is_alive(), what="QUIT shutdown")
    finally:
        viewer.stop()
