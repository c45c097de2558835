"""Interactive mesh/voxel viewer with shadow mapping (host-side).

Role parity with /root/reference/rendering/__init__.py (MeshRenderer): a
background render thread showing the latest mesh or voxel reconstruction
during training, with mouse-drag rotation, R to reset, F12 screenshots, and
offscreen ``get_image`` readback. Voxel input is meshed with the framework's
own extractors (marching tetrahedra or binary cubes) instead of skimage.

Render pipeline parity (reference rendering/__init__.py:174-196 +
vertex.glsl/fragment.glsl/depth_*.glsl): a light-space depth pre-pass into a
1024² shadow-map FBO, then a camera pass with PCF 3×3 + bilinear-lerp shadow
lookup, rim light, and a floor plane darkened by the shadow factor.

Three interchangeable backends share that pipeline:
  * GL (pygame + PyOpenGL) for interactive windows — the reference's path;
  * headless GL (surfaceless EGL + Mesa, ``use_headless_gl``) — the SAME
    shaders and draw calls without any display, rendering into an offscreen
    FBO (exercised in CI against the software twin,
    tests/test_software_render.py);
  * the native software rasterizer (render/software.py, C++/numpy) for
    ``get_image`` on hosts with no GL stack at all.
This module touches no TPU state; when neither a display nor GL is available
the viewer runs headless-only (trainers catch that in train/common.make_viewer)
but ``get_image`` still works through the software backend.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from shapegan_tpu.render.software import SHADOW_TEXTURE_SIZE

DEFAULT_ROTATION = (147.0, 20.0)

_EGL_CONTEXT = None  # one surfaceless context per process (contexts leak otherwise)


def _make_surfaceless_egl_context_current() -> None:
    """Create (once) and bind a surfaceless EGL OpenGL context — Mesa's
    display-less path (llvmpipe/swrast). Raises on hosts without a working
    EGL stack; callers treat that as 'no GL' and use the software twin."""
    global _EGL_CONTEXT
    import ctypes

    EGL_PLATFORM_SURFACELESS_MESA = 0x31DD
    EGL_SURFACE_TYPE = 0x3033
    EGL_RENDERABLE_TYPE = 0x3040
    EGL_OPENGL_BIT = 0x0008
    EGL_NONE = 0x3038
    EGL_OPENGL_API = 0x30A2
    EGL_NO_SURFACE = None

    egl = ctypes.CDLL("libEGL.so.1")
    egl.eglGetPlatformDisplay.restype = ctypes.c_void_p
    egl.eglGetPlatformDisplay.argtypes = [ctypes.c_uint, ctypes.c_void_p, ctypes.c_void_p]
    egl.eglInitialize.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
    ]
    egl.eglChooseConfig.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    egl.eglCreateContext.restype = ctypes.c_void_p
    egl.eglCreateContext.argtypes = [ctypes.c_void_p] * 4
    egl.eglMakeCurrent.argtypes = [ctypes.c_void_p] * 4

    if _EGL_CONTEXT is not None:
        dpy, ctx = _EGL_CONTEXT
        if not egl.eglMakeCurrent(dpy, EGL_NO_SURFACE, EGL_NO_SURFACE, ctx):
            raise RuntimeError("headless GL: eglMakeCurrent failed on cached context")
        return

    dpy = egl.eglGetPlatformDisplay(EGL_PLATFORM_SURFACELESS_MESA, None, None)
    if not dpy:
        raise RuntimeError("headless GL: no surfaceless EGL display")
    major, minor = ctypes.c_int(), ctypes.c_int()
    if not egl.eglInitialize(dpy, ctypes.byref(major), ctypes.byref(minor)):
        raise RuntimeError("headless GL: eglInitialize failed")
    attribs = (ctypes.c_int * 5)(
        EGL_SURFACE_TYPE, 0, EGL_RENDERABLE_TYPE, EGL_OPENGL_BIT, EGL_NONE
    )
    config, num = ctypes.c_void_p(), ctypes.c_int()
    if not egl.eglChooseConfig(dpy, attribs, ctypes.byref(config), 1, ctypes.byref(num)):
        raise RuntimeError("headless GL: eglChooseConfig failed")
    if not egl.eglBindAPI(EGL_OPENGL_API):
        raise RuntimeError("headless GL: desktop OpenGL API unavailable")
    ctx = egl.eglCreateContext(dpy, config if num.value else None, None, None)
    if not ctx:
        raise RuntimeError("headless GL: eglCreateContext failed")
    if not egl.eglMakeCurrent(dpy, EGL_NO_SURFACE, EGL_NO_SURFACE, ctx):
        raise RuntimeError(
            "headless GL: eglMakeCurrent failed (no EGL_KHR_surfaceless_context?)"
        )
    _EGL_CONTEXT = (dpy, ctx)

# Shading pipeline with pixel parity to the reference's GL output
# (fragment.glsl:9-73 semantics, derived constants: ambient 0.5, diffuse 0.5,
# specular 0.3 pow20, rim pow4*0.3, PCF 3x3 over a bilinearly blended binary
# depth comparison, floor darkened by the shadow factor). The GLSL below is
# written fresh against render/software.py's C++ twin — both implement the
# same derivation, structured as depth-test -> bilinear blend -> PCF kernel.
VERTEX_SHADER = """
#version 130
uniform mat4 u_camera_vp;
uniform mat4 u_light_vp;
uniform mat4 u_light_vp_inverse;
uniform float u_y_offset;
in vec3 a_position;
in vec3 a_normal;
out vec3 v_normal;
out vec3 v_position;
out vec4 v_light_clip;
out vec3 v_light_position;

void main() {
    vec3 world = a_position;
    world.y += u_y_offset;
    gl_Position = u_camera_vp * vec4(world, 1.0);
    v_position = gl_Position.xyz;
    v_light_clip = u_light_vp * vec4(world, 1.0);
    // Light position recovered by pushing the light's forward axis through
    // the inverse light VP, then into camera clip space.
    v_light_position = (u_camera_vp * u_light_vp_inverse * vec4(0.0, 0.0, -1.0, 1.0)).xyz;
    v_normal = (u_camera_vp * vec4(a_normal, 0.0)).xyz;
}
"""

FRAGMENT_SHADER = """
#version 130
uniform sampler2D u_depth_map;
uniform float u_floor_flag;
uniform vec3 u_base_color;
in vec3 v_normal;
in vec3 v_position;
in vec4 v_light_clip;
in vec3 v_light_position;
out vec4 out_color;

const float AMBIENT = 0.5;
const float DIFFUSE = 0.5;
const float SPECULAR = 0.3;
const float SPECULAR_POWER = 20.0;
const float RIM_POWER = 4.0;
const float RIM_STRENGTH = 0.3;

// Binary occlusion test against one stored light-space depth.
float depth_test(vec2 uv, float depth_ref) {
    return depth_ref > texture(u_depth_map, uv).r ? 1.0 : 0.0;
}

// Bilinear blend of the four binary tests around uv (smooths texel edges).
float occlusion_bilinear(vec2 uv, float depth_ref, float map_size) {
    float step = 1.0 / map_size;
    vec2 scaled = uv * map_size + 0.5;
    vec2 w = fract(scaled);
    vec2 base = floor(scaled) / map_size;
    float s00 = depth_test(base, depth_ref);
    float s01 = depth_test(base + vec2(0.0, step), depth_ref);
    float s10 = depth_test(base + vec2(step, 0.0), depth_ref);
    float s11 = depth_test(base + vec2(step, step), depth_ref);
    return mix(mix(s00, s01, w.y), mix(s10, s11, w.y), w.x);
}

// 3x3 percentage-closer filter over the bilinear occlusion lookup, with a
// slope-scaled depth bias.
float shadow_factor(vec4 light_clip, float n_dot_l) {
    vec3 ndc = light_clip.xyz / light_clip.w;
    vec3 map_coords = ndc * 0.5 + 0.5;
    if (map_coords.z > 1.0) {
        return 0.0;
    }
    float bias = max(0.002 * (1.0 - n_dot_l), 0.001) / light_clip.w;
    float depth_ref = map_coords.z - bias;
    float map_size = float(textureSize(u_depth_map, 0).x);
    float total = 0.0;
    for (int dx = -1; dx <= 1; dx++) {
        for (int dy = -1; dy <= 1; dy++) {
            vec2 tap = map_coords.xy + vec2(dx, dy) / map_size;
            total += occlusion_bilinear(tap, depth_ref, map_size);
        }
    }
    return clamp(total / 9.0, 0.0, 1.0);
}

void main() {
    vec3 n = normalize(v_normal);
    vec3 to_eye = normalize(-v_position);
    vec3 to_light = normalize(v_light_position - v_position);
    vec3 bounce = -normalize(reflect(to_light, n));
    float n_dot_l = clamp(dot(n, to_light), 0.0, 1.0);

    float shadow = shadow_factor(v_light_clip, n_dot_l);
    float lit = 1.0 - shadow;
    float rim = RIM_STRENGTH * pow(1.0 - clamp(-n.z, 0.0, 1.0), RIM_POWER);
    float glint = SPECULAR * pow(max(0.0, dot(bounce, to_eye)), SPECULAR_POWER);

    vec3 shade = u_base_color * (AMBIENT + DIFFUSE * n_dot_l * lit)
        + vec3(glint * lit + rim);
    if (u_floor_flag == 1.0) {
        // Floor: white where lit, blended toward dim grey where shadowed.
        shade = mix(vec3(1.0), vec3(0.8) * AMBIENT, shadow);
    }
    out_color = vec4(shade, 1.0);
}
"""

DEPTH_VERTEX_SHADER = """
#version 130
uniform mat4 u_camera_vp;
in vec3 a_position;
void main() { gl_Position = u_camera_vp * vec4(a_position, 1.0); }
"""

DEPTH_FRAGMENT_SHADER = """
#version 130
out vec4 out_color;
void main() { out_color = vec4(1.0); }
"""


class MeshRenderer:
    def __init__(self, size: int = 800, start_thread: bool = True,
                 background_color=(1, 1, 1, 1)):
        self.size = size
        self.background_color = background_color
        self.rotation = list(DEFAULT_ROTATION)
        self.model_size = 1.0
        self.model_color = (0.8, 0.1, 0.1)
        self.ground_level = -1.0
        self._lock = threading.Lock()
        self._vertices = np.zeros((0, 3), np.float32)  # triangle soup
        self._normals = np.zeros((0, 3), np.float32)
        self._dirty = False
        self._running = True
        self._vertex_count = 0
        self._window = None
        self.thread = None
        if start_thread:
            self.thread = threading.Thread(target=self._run, daemon=True)
            self.thread.start()

    # ------------------------------------------------------------- data in

    def set_mesh(self, mesh, center_and_scale: bool = False) -> None:
        """Show a TriangleMesh (or None to clear).

        Camera distance follows the reference's fixed model-size convention
        (rendering/__init__.py:163 — 1.08 for meshes, 1.4 for voxel meshes)."""
        if mesh is None:
            with self._lock:
                self._vertices = np.zeros((0, 3), np.float32)
                self._normals = np.zeros((0, 3), np.float32)
                self._dirty = True
            return
        tri = mesh.triangles.reshape(-1, 3).astype(np.float32)
        if center_and_scale and tri.size:
            tri = tri - (tri.min(axis=0) + tri.max(axis=0))[None, :] / 2.0
            tri = tri / max(float(np.linalg.norm(tri, axis=1).max()), 1e-9)
        normals = np.repeat(mesh.face_normals, 3, axis=0).astype(np.float32)
        with self._lock:
            self._vertices = tri
            self._normals = normals
            self.model_size = 1.08
            self.ground_level = float(tri[:, 1].min()) if tri.size else -1.0
            self._dirty = True

    def set_voxels(self, voxels, use_marching_cubes: bool = True, level: float = 0.0) -> None:
        voxels = np.asarray(voxels)
        if use_marching_cubes:
            from shapegan_tpu.ops.mesh_extract import extract_mesh
            from shapegan_tpu.data.mesh_io import TriangleMesh

            padded = np.pad(voxels, 1, mode="constant", constant_values=1.0)
            res = voxels.shape[0]
            vertices, faces = extract_mesh(padded, level=level, spacing=2.0 / res)
            mesh = TriangleMesh(vertices - 1.0 - 1.0 / res, faces)
        else:
            from shapegan_tpu.render.binary_voxels import create_binary_voxel_mesh

            mesh = create_binary_voxel_mesh(voxels, threshold=level)
            res = voxels.shape[0]
            mesh = type(mesh)(mesh.vertices * (2.0 / res) - 1.0, mesh.faces)
        self.set_mesh(mesh)
        self.model_size = 1.4  # reference set_voxels camera framing (:132)

    # ------------------------------------------------------------ lifecycle

    def stop(self) -> None:
        self._running = False
        if self.thread is not None and self.thread.is_alive():
            self.thread.join(timeout=2.0)

    # ----------------------------------------------------------- camera math

    def _matrices(self):
        """(camera VP, light VP) for the current rotation — reference
        rendering/__init__.py:230-236: light at distance 6, pitch 50, yaw
        follows the camera."""
        from shapegan_tpu.render.camera import get_camera_transform

        camera_vp = get_camera_transform(
            self.model_size * 2.0, self.rotation[0], self.rotation[1], project=True
        )
        light_vp = get_camera_transform(6.0, self.rotation[0], 50.0, project=True)
        return camera_vp, light_vp

    # --------------------------------------------------------------- GL path

    def _compile_program(self, GL, vertex_source, fragment_source):
        program = GL.glCreateProgram()
        for source, kind in ((vertex_source, GL.GL_VERTEX_SHADER),
                             (fragment_source, GL.GL_FRAGMENT_SHADER)):
            shader = GL.glCreateShader(kind)
            GL.glShaderSource(shader, source)
            GL.glCompileShader(shader)
            if not GL.glGetShaderiv(shader, GL.GL_COMPILE_STATUS):
                raise RuntimeError(GL.glGetShaderInfoLog(shader).decode())
            GL.glAttachShader(program, shader)
        GL.glLinkProgram(program)
        if not GL.glGetProgramiv(program, GL.GL_LINK_STATUS):
            raise RuntimeError(GL.glGetProgramInfoLog(program).decode())
        return program

    def _init_gl(self):
        import pygame
        from OpenGL import GL

        pygame.init()
        pygame.display.set_mode((self.size, self.size), pygame.OPENGL | pygame.DOUBLEBUF)
        pygame.display.set_caption("shapegan_tpu viewer")
        self._init_gl_objects(GL)
        self._window = True

    def use_headless_gl(self) -> None:
        """Run the REAL GL pipeline (same GLSL, same draw calls) without a
        display: a surfaceless-EGL context (Mesa llvmpipe/swrast) rendering
        into an offscreen FBO. After this, ``get_image`` reads back GL frames
        instead of the software rasterizer. Raises when no EGL/GL stack is
        available (callers fall back to the software twin).

        Parity note: the reference's renderer always needs a window
        (rendering/__init__.py:174-196); this gives its exact pipeline on
        headless hosts too."""
        import sys

        if "OpenGL" not in sys.modules:
            # PyOpenGL resolves its function loader at import time; without a
            # display only the EGL loader works.
            import os

            os.environ.setdefault("PYOPENGL_PLATFORM", "egl")
        else:
            from OpenGL.platform import PLATFORM

            if "EGL" not in type(PLATFORM).__name__:
                raise RuntimeError(
                    "headless GL needs PyOpenGL's EGL loader, but OpenGL was "
                    f"already imported with {type(PLATFORM).__name__}; set "
                    "PYOPENGL_PLATFORM=egl before the first OpenGL import"
                )
        _make_surfaceless_egl_context_current()
        from OpenGL import GL

        self._init_gl_objects(GL)

        # Surfaceless contexts have no default framebuffer — draw into an
        # offscreen FBO instead of framebuffer 0.
        self._offscreen_fbo = GL.glGenFramebuffers(1)
        GL.glBindFramebuffer(GL.GL_FRAMEBUFFER, self._offscreen_fbo)
        color_rb = GL.glGenRenderbuffers(1)
        GL.glBindRenderbuffer(GL.GL_RENDERBUFFER, color_rb)
        GL.glRenderbufferStorage(GL.GL_RENDERBUFFER, GL.GL_RGB8, self.size, self.size)
        GL.glFramebufferRenderbuffer(GL.GL_FRAMEBUFFER, GL.GL_COLOR_ATTACHMENT0,
                                     GL.GL_RENDERBUFFER, color_rb)
        depth_rb = GL.glGenRenderbuffers(1)
        GL.glBindRenderbuffer(GL.GL_RENDERBUFFER, depth_rb)
        GL.glRenderbufferStorage(GL.GL_RENDERBUFFER, GL.GL_DEPTH_COMPONENT24,
                                 self.size, self.size)
        GL.glFramebufferRenderbuffer(GL.GL_FRAMEBUFFER, GL.GL_DEPTH_ATTACHMENT,
                                     GL.GL_RENDERBUFFER, depth_rb)
        if GL.glCheckFramebufferStatus(GL.GL_FRAMEBUFFER) != GL.GL_FRAMEBUFFER_COMPLETE:
            raise RuntimeError("headless GL: offscreen framebuffer incomplete")
        self._target_fbo = int(self._offscreen_fbo)
        self._window = True

    def _init_gl_objects(self, GL):
        """GL state shared by the windowed and headless paths: shader
        programs, the shadow-map FBO, and the vertex buffers."""
        self._target_fbo = 0
        self._program = self._compile_program(GL, VERTEX_SHADER, FRAGMENT_SHADER)
        self._depth_program = self._compile_program(
            GL, DEPTH_VERTEX_SHADER, DEPTH_FRAGMENT_SHADER
        )

        # Shadow-map FBO (reference create_shadow_texture, __init__.py:28-52).
        self._shadow_texture = GL.glGenTextures(1)
        GL.glBindTexture(GL.GL_TEXTURE_2D, self._shadow_texture)
        GL.glTexImage2D(
            GL.GL_TEXTURE_2D, 0, GL.GL_DEPTH_COMPONENT,
            SHADOW_TEXTURE_SIZE, SHADOW_TEXTURE_SIZE, 0,
            GL.GL_DEPTH_COMPONENT, GL.GL_FLOAT, None,
        )
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_MAG_FILTER, GL.GL_NEAREST)
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_MIN_FILTER, GL.GL_NEAREST)
        # CLAMP_TO_EDGE matches both the reference's actual GL state
        # (rendering/__init__.py:44-45 — it sets a white border color too,
        # but EDGE wrap ignores it) and the headless software rasterizer
        # (native/rasterizer.cpp), so GL and headless frames agree at the
        # shadow-map boundary.
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_WRAP_S, GL.GL_CLAMP_TO_EDGE)
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_WRAP_T, GL.GL_CLAMP_TO_EDGE)
        GL.glBindTexture(GL.GL_TEXTURE_2D, 0)
        self._shadow_fbo = GL.glGenFramebuffers(1)

        self._vbo_positions = GL.glGenBuffers(1)
        self._vbo_normals = GL.glGenBuffers(1)

        # Floor quad (reference prepare_floor, size 6).
        s = 6.0
        floor_vertices = np.array(
            [[-s, 0, -s], [-s, 0, s], [s, 0, s], [-s, 0, -s], [s, 0, s], [s, 0, -s]],
            np.float32,
        )
        floor_normals = np.tile(np.array([[0, 1, 0]], np.float32), (6, 1))
        self._vbo_floor_positions = GL.glGenBuffers(1)
        self._vbo_floor_normals = GL.glGenBuffers(1)
        GL.glBindBuffer(GL.GL_ARRAY_BUFFER, self._vbo_floor_positions)
        GL.glBufferData(GL.GL_ARRAY_BUFFER, floor_vertices.nbytes, floor_vertices,
                        GL.GL_STATIC_DRAW)
        GL.glBindBuffer(GL.GL_ARRAY_BUFFER, self._vbo_floor_normals)
        GL.glBufferData(GL.GL_ARRAY_BUFFER, floor_normals.nbytes, floor_normals,
                        GL.GL_STATIC_DRAW)

        GL.glEnable(GL.GL_DEPTH_TEST)

    def _upload(self):
        from OpenGL import GL

        with self._lock:
            if not self._dirty:
                return
            vertices, normals = self._vertices, self._normals
            self._dirty = False
        GL.glBindBuffer(GL.GL_ARRAY_BUFFER, self._vbo_positions)
        GL.glBufferData(GL.GL_ARRAY_BUFFER, vertices.nbytes, vertices, GL.GL_DYNAMIC_DRAW)
        GL.glBindBuffer(GL.GL_ARRAY_BUFFER, self._vbo_normals)
        GL.glBufferData(GL.GL_ARRAY_BUFFER, normals.nbytes, normals, GL.GL_DYNAMIC_DRAW)
        self._vertex_count = len(vertices)

    def _bind_attributes(self, program, vbo_positions, vbo_normals, use_normals=True):
        from OpenGL import GL

        loc = GL.glGetAttribLocation(program, "a_position")
        GL.glBindBuffer(GL.GL_ARRAY_BUFFER, vbo_positions)
        GL.glEnableVertexAttribArray(loc)
        GL.glVertexAttribPointer(loc, 3, GL.GL_FLOAT, GL.GL_FALSE, 0, None)
        if use_normals:
            loc = GL.glGetAttribLocation(program, "a_normal")
            if loc >= 0:
                GL.glBindBuffer(GL.GL_ARRAY_BUFFER, vbo_normals)
                GL.glEnableVertexAttribArray(loc)
                GL.glVertexAttribPointer(loc, 3, GL.GL_FLOAT, GL.GL_FALSE, 0, None)

    def _draw(self):
        from OpenGL import GL

        self._upload()
        camera_vp, light_vp = self._matrices()
        camera_vp = camera_vp.astype(np.float32)
        light_vp32 = light_vp.astype(np.float32)
        light_vp_inv = np.linalg.inv(light_vp).astype(np.float32)

        # Pass 1 — light-space depth into the shadow-map FBO (mesh only,
        # reference _render_shadow_texture).
        GL.glBindFramebuffer(GL.GL_FRAMEBUFFER, self._shadow_fbo)
        GL.glFramebufferTexture2D(GL.GL_FRAMEBUFFER, GL.GL_DEPTH_ATTACHMENT,
                                  GL.GL_TEXTURE_2D, self._shadow_texture, 0)
        GL.glDrawBuffer(GL.GL_NONE)
        GL.glReadBuffer(GL.GL_NONE)
        GL.glViewport(0, 0, SHADOW_TEXTURE_SIZE, SHADOW_TEXTURE_SIZE)
        GL.glClear(GL.GL_DEPTH_BUFFER_BIT)
        if self._vertex_count:
            GL.glUseProgram(self._depth_program)
            loc = GL.glGetUniformLocation(self._depth_program, "u_camera_vp")
            GL.glUniformMatrix4fv(loc, 1, GL.GL_TRUE, light_vp32)
            self._bind_attributes(self._depth_program, self._vbo_positions,
                                  self._vbo_normals, use_normals=False)
            GL.glDrawArrays(GL.GL_TRIANGLES, 0, self._vertex_count)
        # Pass 2 — camera pass with shadow lookup (into the window's default
        # framebuffer, or the offscreen FBO on the headless-GL path).
        GL.glBindFramebuffer(GL.GL_FRAMEBUFFER, getattr(self, "_target_fbo", 0))
        GL.glViewport(0, 0, self.size, self.size)
        GL.glClearColor(*self.background_color)
        GL.glClear(GL.GL_COLOR_BUFFER_BIT | GL.GL_DEPTH_BUFFER_BIT)
        if self._vertex_count == 0:
            return
        GL.glUseProgram(self._program)

        def set_uniform_matrix(name, value):
            GL.glUniformMatrix4fv(GL.glGetUniformLocation(self._program, name),
                                  1, GL.GL_TRUE, value)

        set_uniform_matrix("u_camera_vp", camera_vp)
        set_uniform_matrix("u_light_vp", light_vp32)
        set_uniform_matrix("u_light_vp_inverse", light_vp_inv)
        GL.glActiveTexture(GL.GL_TEXTURE1)
        GL.glBindTexture(GL.GL_TEXTURE_2D, self._shadow_texture)
        GL.glUniform1i(GL.glGetUniformLocation(self._program, "u_depth_map"), 1)

        GL.glUniform1f(GL.glGetUniformLocation(self._program, "u_floor_flag"), 0.0)
        GL.glUniform1f(GL.glGetUniformLocation(self._program, "u_y_offset"), 0.0)
        GL.glUniform3f(GL.glGetUniformLocation(self._program, "u_base_color"),
                       *self.model_color)
        self._bind_attributes(self._program, self._vbo_positions, self._vbo_normals)
        GL.glDrawArrays(GL.GL_TRIANGLES, 0, self._vertex_count)

        # Floor with shadow darkening.
        GL.glUniform1f(GL.glGetUniformLocation(self._program, "u_floor_flag"), 1.0)
        GL.glUniform1f(GL.glGetUniformLocation(self._program, "u_y_offset"),
                       self.ground_level)
        self._bind_attributes(self._program, self._vbo_floor_positions,
                              self._vbo_floor_normals)
        GL.glDrawArrays(GL.GL_TRIANGLES, 0, 6)

    def _run(self):
        import pygame

        try:
            self._init_gl()
        except Exception as e:
            print(f"GL viewer disabled ({type(e).__name__}: {e})")
            # Remember the init failure so get_image goes straight to the
            # software rasterizer instead of re-attempting GL init per call.
            self._gl_failed = True
            self._running = False
            return
        dragging = False
        while self._running:
            for event in pygame.event.get():
                if event.type == pygame.QUIT:
                    self._running = False
                elif event.type == pygame.MOUSEBUTTONDOWN and event.button == 1:
                    dragging = True
                elif event.type == pygame.MOUSEBUTTONUP and event.button == 1:
                    dragging = False
                elif event.type == pygame.MOUSEMOTION and dragging:
                    self.rotation[0] += event.rel[0] * 0.3
                    self.rotation[1] = float(np.clip(self.rotation[1] + event.rel[1] * 0.3, -90, 90))
                elif event.type == pygame.KEYDOWN:
                    if event.key == pygame.K_r:
                        self.rotation = list(DEFAULT_ROTATION)
                    elif event.key == pygame.K_F12:
                        self.save_screenshot()
            self._draw()
            pygame.display.flip()
            time.sleep(1 / 60)
        pygame.quit()

    # ---------------------------------------------------------------- image

    def _get_image_gl(self):
        from OpenGL import GL

        if self._window is None:
            self._init_gl()
        self._draw()
        GL.glBindFramebuffer(GL.GL_FRAMEBUFFER, getattr(self, "_target_fbo", 0))
        data = GL.glReadPixels(0, 0, self.size, self.size, GL.GL_RGB, GL.GL_UNSIGNED_BYTE)
        return np.frombuffer(data, np.uint8).reshape(self.size, self.size, 3)[::-1]

    def _get_image_software(self):
        from shapegan_tpu.render.software import render_scene

        with self._lock:
            vertices, normals = self._vertices, self._normals
        camera_vp, light_vp = self._matrices()
        return render_scene(
            vertices, normals, camera_vp, light_vp,
            size=self.size, ground_level=self.ground_level,
            albedo=self.model_color, background=self.background_color[:3],
        )

    def get_image(self, crop: bool = False, output_size: int = None, greyscale: bool = False):
        """Offscreen readback of the current frame as a numpy array.

        Uses the GL window when one exists (interactive sessions); otherwise
        renders through the native software rasterizer — identical pipeline,
        no display needed."""
        if self._window is not None:
            image = self._get_image_gl()
        elif getattr(self, "_gl_failed", False):
            image = self._get_image_software()
        else:
            try:
                image = self._get_image_gl()
            except Exception as e:
                # Cache the failure: without this every headless get_image
                # call re-attempts (and re-fails) a full pygame/GL init.
                self._gl_failed = True
                self._window = None
                try:  # tear down a partially-initialized display/context
                    import pygame

                    pygame.display.quit()
                except Exception:
                    pass
                print(f"GL offscreen render unavailable ({e}); using software rasterizer")
                image = self._get_image_software()
        if greyscale:
            image = image.mean(axis=2).astype(np.uint8)
        if crop:
            from shapegan_tpu.util import crop_image

            image = crop_image(image, background=255)
        if output_size is not None and output_size != image.shape[0]:
            import cv2

            image = cv2.resize(image, (output_size, output_size), interpolation=cv2.INTER_AREA)
        return image

    def save_screenshot(self, filename: str = None) -> str:
        import os

        from shapegan_tpu.util import ensure_directory

        ensure_directory("screenshots")
        if filename is None:
            index = 0
            while os.path.exists(f"screenshots/screenshot-{index}.png"):
                index += 1
            filename = f"screenshots/screenshot-{index}.png"
        from PIL import Image

        Image.fromarray(self.get_image()).save(filename)
        print(f"Screenshot saved to {filename}.")
        return filename
