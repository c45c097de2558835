"""Interactive GL mesh/voxel viewer (host-side).

Role parity with /root/reference/rendering/__init__.py (MeshRenderer): a
background render thread showing the latest mesh or voxel reconstruction
during training, with mouse-drag rotation, R to reset, F12 screenshots, and
offscreen ``get_image`` readback. Voxel input is meshed with the framework's
own extractors (marching tetrahedra or binary cubes) instead of skimage.

This module touches no TPU state; it degrades gracefully (raises on
construction) when no display/GL is available — trainers catch that and run
headless (see train/common.make_viewer).
"""

from __future__ import annotations

import threading
import time

import numpy as np

VERTEX_SHADER = """
#version 130
uniform mat4 view_projection;
in vec3 position;
in vec3 normal;
out vec3 v_normal;
out vec3 v_position;
void main() {
    gl_Position = view_projection * vec4(position, 1.0);
    v_normal = normal;
    v_position = position;
}
"""

FRAGMENT_SHADER = """
#version 130
uniform vec3 albedo;
uniform vec3 light_direction;
uniform vec3 camera_position;
in vec3 v_normal;
in vec3 v_position;
out vec4 frag_color;
void main() {
    vec3 n = normalize(v_normal);
    float diffuse = clamp(dot(n, -light_direction), 0.0, 1.0);
    vec3 view = normalize(camera_position - v_position);
    vec3 h = normalize(view - light_direction);
    float specular = pow(clamp(dot(n, h), 0.0, 1.0), 32.0) * 0.3;
    float rim = pow(1.0 - clamp(dot(n, view), 0.0, 1.0), 4.0) * 0.2;
    vec3 color = albedo * (0.35 + 0.65 * diffuse) + vec3(specular + rim);
    frag_color = vec4(color, 1.0);
}
"""


class MeshRenderer:
    def __init__(self, size: int = 800, start_thread: bool = True, background_color=(1, 1, 1, 1)):
        self.size = size
        self.background_color = background_color
        self.rotation = [147.0, 20.0]
        self.model_size = 1.0
        self._lock = threading.Lock()
        self._vertices = None  # pending upload: [N, 3] float32
        self._normals = None
        self._dirty = False
        self._running = True
        self._vertex_count = 0
        self._window = None
        self.thread = None
        if start_thread:
            self.thread = threading.Thread(target=self._run, daemon=True)
            self.thread.start()
        else:
            self._init_gl()

    # ------------------------------------------------------------- data in

    def set_mesh(self, mesh) -> None:
        """Show a TriangleMesh (or None to clear)."""
        if mesh is None:
            with self._lock:
                self._vertices = np.zeros((0, 3), np.float32)
                self._normals = np.zeros((0, 3), np.float32)
                self._dirty = True
            return
        tri = mesh.triangles.reshape(-1, 3).astype(np.float32)
        normals = np.repeat(mesh.face_normals, 3, axis=0).astype(np.float32)
        with self._lock:
            self._vertices = tri
            self._normals = normals
            self.model_size = float(np.abs(tri).max()) if tri.size else 1.0
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

    # ------------------------------------------------------------ lifecycle

    def stop(self) -> None:
        self._running = False
        if self.thread is not None and self.thread.is_alive():
            self.thread.join(timeout=2.0)

    # --------------------------------------------------------------- render

    def _init_gl(self):
        import pygame
        from OpenGL import GL

        pygame.init()
        pygame.display.set_mode((self.size, self.size), pygame.OPENGL | pygame.DOUBLEBUF)
        pygame.display.set_caption("shapegan_tpu viewer")

        self._program = GL.glCreateProgram()
        for source, kind in ((VERTEX_SHADER, GL.GL_VERTEX_SHADER),
                             (FRAGMENT_SHADER, GL.GL_FRAGMENT_SHADER)):
            shader = GL.glCreateShader(kind)
            GL.glShaderSource(shader, source)
            GL.glCompileShader(shader)
            if not GL.glGetShaderiv(shader, GL.GL_COMPILE_STATUS):
                raise RuntimeError(GL.glGetShaderInfoLog(shader).decode())
            GL.glAttachShader(self._program, shader)
        GL.glLinkProgram(self._program)
        if not GL.glGetProgramiv(self._program, GL.GL_LINK_STATUS):
            raise RuntimeError(GL.glGetProgramInfoLog(self._program).decode())

        self._vbo_positions = GL.glGenBuffers(1)
        self._vbo_normals = GL.glGenBuffers(1)
        GL.glEnable(GL.GL_DEPTH_TEST)
        self._window = True

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

    def _draw(self):
        from OpenGL import GL

        from shapegan_tpu.render.camera import get_camera_transform, PROJECTION_MATRIX

        GL.glClearColor(*self.background_color)
        GL.glClear(GL.GL_COLOR_BUFFER_BIT | GL.GL_DEPTH_BUFFER_BIT)
        self._upload()
        if self._vertex_count == 0:
            return
        GL.glUseProgram(self._program)
        camera_distance = 2.4 * self.model_size
        vp = PROJECTION_MATRIX @ get_camera_transform(
            camera_distance, self.rotation[0], self.rotation[1]
        )
        loc = GL.glGetUniformLocation(self._program, "view_projection")
        GL.glUniformMatrix4fv(loc, 1, GL.GL_TRUE, vp.astype(np.float32))
        GL.glUniform3f(GL.glGetUniformLocation(self._program, "albedo"), 0.8, 0.1, 0.1)
        light = np.array([-0.3, -1.0, -0.4])
        light /= np.linalg.norm(light)
        GL.glUniform3f(GL.glGetUniformLocation(self._program, "light_direction"), *light)
        cam = np.linalg.inv(get_camera_transform(camera_distance, *self.rotation)) @ np.array(
            [0, 0, 0, 1.0]
        )
        GL.glUniform3f(GL.glGetUniformLocation(self._program, "camera_position"), *cam[:3])

        for attr_name, vbo in (("position", self._vbo_positions), ("normal", self._vbo_normals)):
            loc = GL.glGetAttribLocation(self._program, attr_name)
            GL.glBindBuffer(GL.GL_ARRAY_BUFFER, vbo)
            GL.glEnableVertexAttribArray(loc)
            GL.glVertexAttribPointer(loc, 3, GL.GL_FLOAT, GL.GL_FALSE, 0, None)
        GL.glDrawArrays(GL.GL_TRIANGLES, 0, self._vertex_count)

    def _run(self):
        import pygame

        try:
            self._init_gl()
        except Exception as e:
            print(f"Viewer disabled ({type(e).__name__}: {e})")
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
                        self.rotation = [147.0, 20.0]
                    elif event.key == pygame.K_F12:
                        self.save_screenshot()
            self._draw()
            pygame.display.flip()
            time.sleep(1 / 60)
        pygame.quit()

    # ---------------------------------------------------------------- image

    def get_image(self, crop: bool = False, output_size: int = None, greyscale: bool = False):
        """Offscreen readback of the current frame as a numpy array."""
        from OpenGL import GL

        if self._window is None:
            self._init_gl()
        self._draw()
        data = GL.glReadPixels(0, 0, self.size, self.size, GL.GL_RGB, GL.GL_UNSIGNED_BYTE)
        image = np.frombuffer(data, np.uint8).reshape(self.size, self.size, 3)[::-1]
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
