#!/usr/bin/env python3
"""Latent-space traversal video frames for a trained DeepSDF autodecoder.

Role parity with /root/reference/demo_sdf_net.py: pick random latent codes
from the trained table, interpolate a smooth (Catmull-Rom spline) path
through them, and render one frame per step into
``screenshots/sdf_net_animation/``.

Two render modes:
  * ``mode=mesh`` (default) — the reference demo's own pipeline
    (demo_sdf_net.py:13-14 + README.md:131-133): dense 128^3 grid
    evaluation → marching-tetrahedra mesh extraction (on device) →
    rasterized frame with shadow mapping (the C++ software rasterizer, no
    GL context needed). This is the animation-throughput path — the
    reference quotes ~0.75 frames/s for 30x60 frames on its GPU.
  * ``mode=raymarch`` — sphere-traced frames directly against the network
    (the path quality figures use); slower per frame.

    python3 demo_sdf_net.py [mode=mesh|raymarch] [samples=N]
                            [frames_per_transition=N] [resolution=N]
                            [voxel_resolution=N]
"""

import os

import numpy as np
import jax

from shapegan_tpu import checkpoints
from shapegan_tpu.core.config import parse_cli
from shapegan_tpu.models import LATENT_CODES_FILENAME
from shapegan_tpu.models.sdf_net import SDFNet
from shapegan_tpu.render.raymarching import render_image, render_image_sequence
from shapegan_tpu.util import ensure_directory


def catmull_rom(points: np.ndarray, steps: int) -> np.ndarray:
    """Smooth closed spline through control points [N, D] with ``steps``
    samples per segment."""
    n = len(points)
    out = []
    for i in range(n):
        p0, p1, p2, p3 = (points[(i + k - 1) % n] for k in range(4))
        for s in range(steps):
            t = s / steps
            out.append(
                0.5
                * (
                    2 * p1
                    + (-p0 + p2) * t
                    + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t**2
                    + (-p0 + 3 * p1 - 3 * p2 + p3) * t**3
                )
            )
    return np.asarray(out)


def render_mesh_frame(net, params, code, resolution: int, voxel_resolution: int):
    """One rasterized frame: on-device grid eval + marching tetrahedra, then
    the shadow-mapped software rasterizer (reference MeshRenderer output
    conventions: fixed camera, light, floor just under the model)."""
    from PIL import Image

    from shapegan_tpu.render.camera import get_camera_transform
    from shapegan_tpu.render.software import render_scene

    mesh = net.get_mesh(params, code, voxel_resolution=voxel_resolution)
    if mesh is None:  # empty iso-surface: background-only frame
        return Image.fromarray(
            np.full((resolution, resolution, 3), 255, np.uint8), "RGB"
        )
    tri = mesh.triangles.reshape(-1, 3).astype(np.float32)
    normals = np.repeat(mesh.face_normals, 3, axis=0).astype(np.float32)
    camera_vp = get_camera_transform(2.2, 147, 20, project=True)
    light_vp = get_camera_transform(6.0, 164, 50, project=True)
    img = render_scene(
        tri, normals, camera_vp, light_vp, size=resolution,
        ground_level=float(tri[:, 1].min()),
    )
    return Image.fromarray(img, "RGB")


def main():
    config = parse_cli()
    mode = str(config.extras.get("mode", "mesh"))
    if mode not in ("mesh", "raymarch"):
        raise SystemExit(
            f"demo_sdf_net: unknown mode={mode!r} (expected mode=mesh or "
            "mode=raymarch) — refusing to guess between the ~1 s/frame mesh "
            "pipeline and the ~3 s/frame raymarcher"
        )
    sample_count = int(config.extras.get("samples", 30))
    frames_per_transition = int(config.extras.get("frames_per_transition", 60))
    resolution = int(config.extras.get("resolution", 800))
    voxel_resolution = int(config.extras.get("voxel_resolution", 128))

    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    params = checkpoints.load(params, "sdf_net", base=config.model_dir)
    codes = checkpoints.load_array(LATENT_CODES_FILENAME, base=config.model_dir)

    rng = np.random.default_rng(config.seed)
    keys = codes[rng.choice(len(codes), min(sample_count, len(codes)), replace=False)]
    path = catmull_rom(keys, frames_per_transition)

    out_dir = "screenshots/sdf_net_animation"
    ensure_directory(out_dir)
    import time

    t_start = time.time()
    rendered = 0
    todo = [(i, code.astype(np.float32)) for i, code in enumerate(path)
            if not os.path.exists(os.path.join(out_dir, f"frame-{i:05d}.png"))]
    n_dev = len(jax.local_devices())
    if mode == "raymarch" and n_dev > 1 and len(todo) > 1:
        # Frame-parallel raymarching: one frame per device-pinned worker over
        # the whole run (params placed once per device), with frames landing
        # on disk (and the run resumable) as each completes via on_frame.
        import threading

        progress_lock = threading.Lock()

        def on_frame(j, image):
            nonlocal rendered
            i = todo[j][0]
            image.save(os.path.join(out_dir, f"frame-{i:05d}.png"))
            with progress_lock:
                rendered += 1
                rate = rendered / max(time.time() - t_start, 1e-9)
                # Completed-count progress: frames finish out of index order
                # across device workers, so the frame index alone would read
                # as the run going backwards.
                print(f"{rendered}/{len(todo)} rendered (frame {i:05d}, "
                      f"{rate:.2f} frames/s, {n_dev} devices)")

        render_image_sequence(
            net, params, [c for _, c in todo], resolution=resolution,
            on_frame=on_frame,
        )
    else:
        for i, code in todo:
            if mode == "mesh":
                image = render_mesh_frame(net, params, code, resolution, voxel_resolution)
            else:
                image = render_image(net, params, code, resolution=resolution)
            image.save(os.path.join(out_dir, f"frame-{i:05d}.png"))
            rendered += 1
            rate = rendered / max(time.time() - t_start, 1e-9)
            print(f"frame {i + 1}/{len(path)} ({rate:.2f} frames/s)")


if __name__ == "__main__":
    main()
