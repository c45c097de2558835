"""Software rasterizer with shadow mapping (headless GL-pipeline parity).

Renders a triangle soup through the same two-pass pipeline as the reference's
GL viewer (/root/reference/rendering/__init__.py:174-196): a light-space
depth pre-pass into a 1024² shadow map, then a camera pass with z-buffering,
the reference fragment shader's shading (ambient 0.5 / diffuse 0.5 /
specular 0.3 pow-20 / rim light — fragment.glsl:9-64), PCF 3×3 shadow lookup
with bilinear shadow lerp (fragment.glsl:16-54), and a floor plane darkened
by the shadow factor (fragment.glsl:71-73).

The heavy lifting is the C++ rasterizer (native/rasterizer.cpp, multithreaded,
ctypes); a vectorized numpy fallback implements the identical math when the
shared library can't be built. Either way no display or GL context is needed,
so `MeshRenderer.get_image` works on headless TPU hosts.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from shapegan_tpu.native import load_library

SHADOW_TEXTURE_SIZE = 1024

_lib = None
_lib_failed = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    lib = load_library("rasterizer.cpp", "librasterizer.so")
    if lib is None:
        _lib_failed = True
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.rasterize_scene.restype = None
    lib.rasterize_scene.argtypes = [
        f32p, f32p, ctypes.c_long,          # vertices, normals, n_vertices
        f32p, f32p, f32p,                   # camera_vp, light_vp, light_vp_inv
        ctypes.c_float, ctypes.c_int,       # ground_level, draw_floor
        f32p, f32p,                         # albedo, background
        ctypes.c_int, ctypes.c_int,         # size, shadow_size
        ctypes.POINTER(ctypes.c_ubyte),     # out_rgb
    ]
    _lib = lib
    return _lib


def render_scene(
    vertices: np.ndarray,
    normals: np.ndarray,
    camera_vp: np.ndarray,
    light_vp: np.ndarray,
    *,
    size: int = 800,
    shadow_size: int = SHADOW_TEXTURE_SIZE,
    ground_level: float = -1.0,
    draw_floor: bool = True,
    albedo=(0.8, 0.1, 0.1),
    background=(1.0, 1.0, 1.0),
    use_native: bool = True,
) -> np.ndarray:
    """Render a triangle soup to an RGB uint8 image (row 0 = top).

    vertices/normals: [N, 3] float32 triangle soup (N divisible by 3).
    camera_vp/light_vp: 4×4 projected view matrices (see render.camera).
    """
    vertices = np.ascontiguousarray(vertices, dtype=np.float32).reshape(-1, 3)
    normals = np.ascontiguousarray(normals, dtype=np.float32).reshape(-1, 3)
    camera_vp = np.ascontiguousarray(camera_vp, dtype=np.float32)
    light_vp = np.ascontiguousarray(light_vp, dtype=np.float32)
    light_vp_inv = np.ascontiguousarray(
        np.linalg.inv(light_vp.astype(np.float64)), dtype=np.float32
    )

    lib = _load_native() if use_native else None
    if lib is not None:
        out = np.empty((size, size, 3), dtype=np.uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        albedo_arr = np.asarray(albedo, dtype=np.float32)
        bg_arr = np.asarray(background, dtype=np.float32)
        lib.rasterize_scene(
            vertices.ctypes.data_as(f32p), normals.ctypes.data_as(f32p),
            ctypes.c_long(len(vertices)),
            camera_vp.ctypes.data_as(f32p), light_vp.ctypes.data_as(f32p),
            light_vp_inv.ctypes.data_as(f32p),
            ctypes.c_float(float(ground_level)), ctypes.c_int(int(draw_floor)),
            albedo_arr.ctypes.data_as(f32p), bg_arr.ctypes.data_as(f32p),
            ctypes.c_int(size), ctypes.c_int(shadow_size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return out
    return _render_scene_numpy(
        vertices, normals, camera_vp, light_vp, light_vp_inv,
        size=size, shadow_size=shadow_size, ground_level=ground_level,
        draw_floor=draw_floor, albedo=albedo, background=background,
    )


# --------------------------------------------------------------------------
# numpy fallback — same math, vectorized over each triangle's bounding box.
# --------------------------------------------------------------------------


def _transform(matrix: np.ndarray, points: np.ndarray, w: float = 1.0) -> np.ndarray:
    hom = np.concatenate([points, np.full((len(points), 1), w, points.dtype)], axis=1)
    return hom @ matrix.T


def _depth_pass_numpy(vertices, light_vp, shadow_size):
    depth = np.full((shadow_size, shadow_size), 1.0, np.float32)
    clip = _transform(light_vp, vertices)
    tris = clip.reshape(-1, 3, 4)
    valid = (tris[:, :, 3] > 1e-6).all(axis=1)
    for tri in tris[valid]:
        inv_w = 1.0 / tri[:, 3]
        sx = (tri[:, 0] * inv_w * 0.5 + 0.5) * shadow_size
        sy = (tri[:, 1] * inv_w * 0.5 + 0.5) * shadow_size
        sz = tri[:, 2] * inv_w * 0.5 + 0.5
        _raster_tri_depth(depth, sx, sy, sz, shadow_size)
    return depth


def _raster_tri_depth(depth, sx, sy, sz, size):
    x0 = max(0, int(np.floor(sx.min())))
    x1 = min(size - 1, int(np.ceil(sx.max())))
    y0 = max(0, int(np.floor(sy.min())))
    y1 = min(size - 1, int(np.ceil(sy.max())))
    if x0 > x1 or y0 > y1:
        return
    area = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sy[1] - sy[0]) * (sx[2] - sx[0])
    if abs(area) < 1e-12:
        return
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1) + 0.5, np.arange(y0, y1 + 1) + 0.5)
    w0 = ((sx[1] - xs) * (sy[2] - ys) - (sy[1] - ys) * (sx[2] - xs)) / area
    w1 = ((sx[2] - xs) * (sy[0] - ys) - (sy[2] - ys) * (sx[0] - xs)) / area
    w2 = 1.0 - w0 - w1
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    z = w0 * sz[0] + w1 * sz[1] + w2 * sz[2]
    window = depth[y0 : y1 + 1, x0 : x1 + 1]
    np.minimum(window, np.where(inside, z, 1.0), out=window)


def _shadow_lookup_numpy(shadow, shadow_size, u, v, reference_depth):
    """Binary depth test at one (u, v) array pair; out-of-range samples clamp
    to the edge texel (GL_CLAMP_TO_EDGE, the wrap mode the reference binds)."""
    x = np.clip(np.floor(u * shadow_size).astype(np.int64), 0, shadow_size - 1)
    y = np.clip(np.floor(v * shadow_size).astype(np.int64), 0, shadow_size - 1)
    d = shadow[y, x]
    return (reference_depth > d).astype(np.float32)


def _shadow_lerp_numpy(shadow, shadow_size, u, v, reference_depth):
    texel = 1.0 / shadow_size
    fu = u * shadow_size + 0.5
    fv = v * shadow_size + 0.5
    frac_u, frac_v = fu - np.floor(fu), fv - np.floor(fv)
    cu, cv = np.floor(fu) / shadow_size, np.floor(fv) / shadow_size
    lb = _shadow_lookup_numpy(shadow, shadow_size, cu, cv, reference_depth)
    lt = _shadow_lookup_numpy(shadow, shadow_size, cu, cv + texel, reference_depth)
    rb = _shadow_lookup_numpy(shadow, shadow_size, cu + texel, cv, reference_depth)
    rt = _shadow_lookup_numpy(shadow, shadow_size, cu + texel, cv + texel, reference_depth)
    a = lb + (lt - lb) * frac_v
    b = rb + (rt - rb) * frac_v
    return a + (b - a) * frac_u


def _get_shadow_numpy(shadow, shadow_size, shadow_pos, light_dot_normal):
    w = shadow_pos[:, 3]
    safe_w = np.where(np.abs(w) < 1e-9, 1.0, w)
    sx = shadow_pos[:, 0] / safe_w * 0.5 + 0.5
    sy = shadow_pos[:, 1] / safe_w * 0.5 + 0.5
    sz = shadow_pos[:, 2] / safe_w * 0.5 + 0.5
    bias = np.maximum(0.002 * (1.0 - light_dot_normal), 0.001) / safe_w
    ref = sz - bias
    texel = 1.0 / shadow_size
    result = np.zeros_like(sx)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            result += _shadow_lerp_numpy(shadow, shadow_size, sx + dx * texel,
                                         sy + dy * texel, ref)
    result = np.clip(result / 9.0, 0.0, 1.0)
    return np.where((sz > 1.0) | (np.abs(w) < 1e-9), 0.0, result)


def _shade_numpy(normal, position, shadow_pos, shadow, shadow_size, light_position,
                 albedo, is_floor):
    n = normal / np.maximum(np.linalg.norm(normal, axis=1, keepdims=True), 1e-12)
    view = -position / np.maximum(np.linalg.norm(position, axis=1, keepdims=True), 1e-12)
    l = light_position[None, :] - position
    l /= np.maximum(np.linalg.norm(l, axis=1, keepdims=True), 1e-12)
    ldn = np.einsum("ij,ij->i", l, n)
    light_dot_normal = np.clip(ldn, 0.0, 1.0)
    shadow_f = _get_shadow_numpy(shadow, shadow_size, shadow_pos, light_dot_normal)
    if is_floor:
        v = 1.0 + (0.8 * 0.5 - 1.0) * shadow_f
        return np.stack([v, v, v], axis=1)
    refl = -(l - 2.0 * ldn[:, None] * n)
    rdv = np.clip(np.einsum("ij,ij->i", refl, view), 0.0, 1.0)
    rim = np.power(1.0 - np.clip(-n[:, 2], 0.0, 1.0), 4.0) * 0.3
    spec = 0.3 * np.power(rdv, 20.0) * (1.0 - shadow_f)
    diff = 0.5 * light_dot_normal * (1.0 - shadow_f)
    return np.asarray(albedo)[None, :] * (0.5 + diff)[:, None] + (spec + rim)[:, None]


_NEAR_W = 1e-4


def _clip_near_numpy(poly):
    """Sutherland-Hodgman clip of [n, 11] rows (clip4 | normal3 | shadow4)
    against the near plane w >= _NEAR_W."""
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        cur_in, nxt_in = cur[3] >= _NEAR_W, nxt[3] >= _NEAR_W
        if cur_in:
            out.append(cur)
        if cur_in != nxt_in:
            t = (_NEAR_W - cur[3]) / (nxt[3] - cur[3])
            out.append(cur + (nxt - cur) * t)
    return out


def _main_pass_numpy(vertices, normals, camera_vp, light_vp, y_offset, size,
                     shadow, shadow_size, light_position, albedo, is_floor,
                     zbuf, rgb):
    offset_vertices = vertices + np.array([0.0, y_offset, 0.0], np.float32)
    clip = _transform(camera_vp, offset_vertices)
    clip_n = _transform(camera_vp, normals, w=0.0)
    shadow_clip = _transform(light_vp, offset_vertices)
    packed = np.concatenate([clip, clip_n[:, :3], shadow_clip], axis=1).reshape(-1, 3, 11)
    screen_tris = []
    for poly in packed:
        if (poly[:, 3] >= _NEAR_W).all():
            screen_tris.append(poly)
            continue
        clipped = _clip_near_numpy(list(poly))
        for t in range(len(clipped) - 2):  # fan-triangulate
            screen_tris.append(np.stack([clipped[0], clipped[t + 1], clipped[t + 2]]))
    for packed_tri in screen_tris:
        tri = packed_tri[:, 0:4]
        tn = packed_tri[:, 4:7]
        ts = packed_tri[:, 7:11]
        inv_w = 1.0 / tri[:, 3]
        sx = (tri[:, 0] * inv_w * 0.5 + 0.5) * size
        sy = (1.0 - (tri[:, 1] * inv_w * 0.5 + 0.5)) * size
        sz = tri[:, 2] * inv_w
        x0 = max(0, int(np.floor(sx.min())))
        x1 = min(size - 1, int(np.ceil(sx.max())))
        y0 = max(0, int(np.floor(sy.min())))
        y1 = min(size - 1, int(np.ceil(sy.max())))
        if x0 > x1 or y0 > y1:
            continue
        area = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sy[1] - sy[0]) * (sx[2] - sx[0])
        if abs(area) < 1e-12:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1) + 0.5, np.arange(y0, y1 + 1) + 0.5)
        w0 = ((sx[1] - xs) * (sy[2] - ys) - (sy[1] - ys) * (sx[2] - xs)) / area
        w1 = ((sx[2] - xs) * (sy[0] - ys) - (sy[2] - ys) * (sx[0] - xs)) / area
        w2 = 1.0 - w0 - w1
        z = w0 * sz[0] + w1 * sz[1] + w2 * sz[2]
        window = zbuf[y0 : y1 + 1, x0 : x1 + 1]
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (z < window)
        if not inside.any():
            continue
        iy, ix = np.nonzero(inside)
        b0, b1, b2, zf = w0[inside], w1[inside], w2[inside], z[inside]
        window[iy, ix] = zf
        iw = b0 * inv_w[0] + b1 * inv_w[1] + b2 * inv_w[2]
        corr = 1.0 / iw

        def interp(values):  # values: [3, k] per-vertex varyings -> [n_pix, k]
            over_w = values * inv_w[:, None]
            return (b0[:, None] * over_w[0][None, :]
                    + b1[:, None] * over_w[1][None, :]
                    + b2[:, None] * over_w[2][None, :]) * corr[:, None]

        normal = interp(tn)
        position = interp(tri[:, :3])
        shadow_pos = interp(ts)
        color = _shade_numpy(normal, position, shadow_pos, shadow, shadow_size,
                             light_position, albedo, is_floor)
        rgb[y0 + iy, x0 + ix] = np.clip(color, 0.0, 1.0)


def _render_scene_numpy(vertices, normals, camera_vp, light_vp, light_vp_inv, *,
                        size, shadow_size, ground_level, draw_floor, albedo,
                        background):
    shadow = _depth_pass_numpy(vertices, light_vp, shadow_size)
    light_position = (camera_vp @ (light_vp_inv @ np.array([0, 0, -1, 1.0])))[:3]
    # Depth cleared to 1.0 — fragments beyond the far plane fail the test.
    zbuf = np.full((size, size), 1.0, np.float32)
    rgb = np.empty((size, size, 3), np.float32)
    rgb[:] = np.asarray(background, np.float32)[None, None, :]
    _main_pass_numpy(vertices, normals, camera_vp, light_vp, 0.0, size, shadow,
                     shadow_size, light_position, albedo, False, zbuf, rgb)
    if draw_floor:
        s = 6.0
        floor_vertices = np.array(
            [[-s, 0, -s], [-s, 0, s], [s, 0, s], [-s, 0, -s], [s, 0, s], [s, 0, -s]],
            np.float32,
        )
        floor_normals = np.tile(np.array([[0, 1, 0]], np.float32), (6, 1))
        _main_pass_numpy(floor_vertices, floor_normals, camera_vp, light_vp,
                         ground_level, size, shadow, shadow_size, light_position,
                         albedo, True, zbuf, rgb)
    return np.round(np.clip(rgb, 0.0, 1.0) * 255.0).astype(np.uint8)
