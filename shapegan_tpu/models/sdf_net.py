"""DeepSDF network wrapper: the implicit MLP plus its inference surface.

Parity targets (reference /root/reference/model/sdf_net.py):
  * ``forward``                    → :meth:`SDFNet.apply`
  * ``evaluate_in_batches``        → jitted chunked eval inside
                                     :meth:`SDFNet.evaluate` (lax.map chunks
                                     instead of a Python loop)
  * ``get_voxels``                 → :meth:`SDFNet.get_voxels`; the reference
                                     gathers only in-sphere points
                                     (sdf_net.py:77-95) — on TPU we evaluate
                                     the full dense grid (static shape, MXU
                                     friendly) and mask afterwards, producing
                                     the identical voxel volume.
  * ``get_mesh``                   → :meth:`SDFNet.get_mesh` (our own mesh
                                     extraction replaces skimage marching
                                     cubes; see ops/mesh_extract.py)
  * ``get_normals``                → autograd ∇SDF via jax.grad
  * ``get_surface_points``         → sample → project along normals → filter
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from shapegan_tpu import LATENT_CODE_SIZE
from shapegan_tpu.ops import sdf_mlp
from shapegan_tpu.ops.coords import voxel_coordinates, unit_sphere_mask, sample_unit_sphere

SDF_NET_BREADTH = sdf_mlp.SDF_NET_BREADTH


class SDFNet:
    """Functional DeepSDF module: static config + pure methods over params.

    Unlike the conv models this is not a linen module — the implicit MLP is
    the framework's hot kernel and lives in :mod:`shapegan_tpu.ops.sdf_mlp`
    (XLA path + Pallas fused path); this class adds the user-facing inference
    helpers.
    """

    def __init__(self, latent_code_size: int = LATENT_CODE_SIZE, breadth: int = SDF_NET_BREADTH):
        self.latent_code_size = latent_code_size
        self.breadth = breadth

    # ---------------------------------------------------------------- core

    def init(self, key: jax.Array) -> sdf_mlp.Params:
        return sdf_mlp.init(key, self.latent_code_size, self.breadth)

    def apply(self, params, points, latents, dtype=jnp.float32):
        """points [N, 3], per-point latents [N, L] → sdf [N]."""
        return sdf_mlp.apply(params, points, latents, dtype=dtype)

    def apply_grid(self, params, grid_points, latents, dtype=jnp.float32):
        """Shared points [P, 3] x shape latents [B, L] → [B, P]."""
        return sdf_mlp.apply_grid(params, grid_points, latents, dtype=dtype)

    def apply_indexed(self, params, points, latent_table, shape_indices, dtype=jnp.float32):
        return sdf_mlp.apply_indexed(params, points, latent_table, shape_indices, dtype=dtype)

    # ----------------------------------------------------------- inference

    @staticmethod
    def _apply_grid_inference(params, points, latents):
        """Forward-only grid eval: fused Pallas kernel on TPU, XLA elsewhere."""
        from shapegan_tpu.ops.sdf_mlp_pallas import apply_grid_best

        return apply_grid_best(params, points, latents)

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _evaluate_jit(self, params, points, latent_code, chunk_size):
        # Single fixed code: fold it into the biases so every chunk runs the
        # leaner latent-free network (sdf_mlp.fold_latent).
        params = sdf_mlp.fold_latent(params, latent_code)
        empty = latent_code[:0][None, :]
        n = points.shape[0]
        pad = (-n) % chunk_size
        pts = jnp.pad(points, ((0, pad), (0, 0)))
        chunks = pts.reshape(-1, chunk_size, 3)

        def eval_chunk(chunk):
            return self._apply_grid_inference(params, chunk, empty)[0]

        out = jax.lax.map(eval_chunk, chunks).reshape(-1)
        return out[:n]

    def evaluate(self, params, points, latent_code, chunk_size: int = 262144):
        """Evaluate many points for one latent code, chunked to bound memory.

        Replaces the reference's Python-loop ``evaluate_in_batches``
        (sdf_net.py:63-75) with a jitted ``lax.map`` over fixed-size chunks
        of the fused inference kernel.
        """
        points = jnp.asarray(points, dtype=jnp.float32)
        if points.shape[0] <= chunk_size:
            return self._apply_grid_inference(params, points, jnp.asarray(latent_code)[None, :])[0]
        return self._evaluate_jit(params, points, jnp.asarray(latent_code), chunk_size)

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _voxels_jit(self, params, latent_code, voxel_resolution):
        params = sdf_mlp.fold_latent(params, latent_code)
        pts = jnp.asarray(voxel_coordinates(voxel_resolution))
        return self._apply_grid_inference(params, pts, latent_code[:0][None, :])[0].reshape(
            (voxel_resolution,) * 3
        )

    def get_voxels(self, params, latent_code, voxel_resolution: int = 64, sphere_only: bool = True, pad: bool = False):
        """Dense SDF volume [res, res, res] (numpy).

        ``sphere_only`` assigns +1 outside the radius-1.1 sphere, reproducing
        the reference's sphere-masked evaluation output exactly.
        """
        voxels = np.asarray(self._voxels_jit(params, jnp.asarray(latent_code), int(voxel_resolution)))
        if sphere_only:
            mask = unit_sphere_mask(voxel_resolution)
            voxels = np.where(mask, voxels, 1.0).astype(np.float32)
        elif pad:
            voxels = np.pad(voxels, 1, mode="constant", constant_values=1.0)
        return voxels

    def get_mesh(self, params, latent_code, voxel_resolution: int = 64, sphere_only: bool = True, level: float = 0.0, raise_on_empty: bool = False):
        """Extract the iso-surface triangle mesh at ``level``.

        Mirrors reference get_mesh (sdf_net.py:97-112): pad the volume with +1
        so the surface closes at the boundary, extract, then center the
        vertices. Our extractor is a vectorized JAX marching-cubes
        (ops/mesh_extract.py) instead of skimage's Cython implementation.
        """
        from shapegan_tpu.ops.mesh_extract import extract_mesh
        from shapegan_tpu.data.mesh_io import TriangleMesh

        size = 2.0
        voxels = self.get_voxels(params, latent_code, voxel_resolution, sphere_only=sphere_only)
        voxels = np.pad(voxels, 1, mode="constant", constant_values=1.0)
        vertices, faces = extract_mesh(voxels, level=level, spacing=size / voxel_resolution)
        if vertices.shape[0] == 0:
            if raise_on_empty:
                raise ValueError("marching cubes produced an empty mesh")
            return None
        vertices = vertices - size / 2.0
        return TriangleMesh(vertices, faces)

    def get_uniform_surface_points(self, params, latent_code, point_count: int = 1000, voxel_resolution: int = 64, sphere_only: bool = True, level: float = 0.0, seed: int = 0):
        mesh = self.get_mesh(params, latent_code, voxel_resolution, sphere_only=sphere_only, level=level)
        return mesh.sample(point_count, seed=seed)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _normals_jit(self, params, latent_code, points):
        def sdf_sum(p):
            return jnp.sum(sdf_mlp.apply_grid(params, p, latent_code[None, :])[0])

        grads = jax.grad(sdf_sum)(points)
        return grads / (jnp.linalg.norm(grads, axis=1, keepdims=True) + 1e-12)

    def get_normals(self, params, latent_code, points):
        """Unit surface normals = normalized ∇_p SDF(p, z) via jax.grad.

        (Reference computes these with torch autograd, sdf_net.py:118-128.)
        """
        return self._normals_jit(params, jnp.asarray(latent_code), jnp.asarray(points, dtype=jnp.float32))

    @functools.partial(jax.jit, static_argnums=(0, 3, 5))
    def _surface_candidates_jit(self, params, latent_code, sample_size, key, use_unit_sphere):
        if use_unit_sphere:
            points = sample_unit_sphere(key, sample_size) * 1.1
        else:
            points = jax.random.uniform(key, (sample_size, 3)) * 2.2 - 1.1

        def sdf_sum(p):
            return jnp.sum(sdf_mlp.apply_grid(params, p, latent_code[None, :])[0])

        sdf = sdf_mlp.apply_grid(params, points, latent_code[None, :])[0]
        grads = jax.grad(sdf_sum)(points)
        normals = grads / (jnp.linalg.norm(grads, axis=1, keepdims=True) + 1e-12)
        projected = points - normals * sdf[:, None]
        return projected, normals, sdf

    def get_surface_points(self, params, latent_code, sample_size: int = 100000, sdf_cutoff: float = 0.1, return_normals: bool = False, use_unit_sphere: bool = True, key=None):
        """Sample points, project them to the zero level set along ∇SDF, and
        keep those whose |SDF| was below ``sdf_cutoff``.

        Parity with reference sdf_net.py:130-156. The data-dependent filter
        happens host-side on the returned arrays (TPU work is static-shape).
        """
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        projected, normals, sdf = self._surface_candidates_jit(
            params, jnp.asarray(latent_code), int(sample_size), key, bool(use_unit_sphere)
        )
        projected = np.asarray(projected)
        normals = np.asarray(normals)
        sdf = np.asarray(sdf)
        mask = (np.abs(sdf) < sdf_cutoff) & np.isfinite(projected).all(axis=1)
        if return_normals:
            return projected[mask], normals[mask]
        return projected[mask]

    def get_surface_points_in_batches(self, params, latent_code, amount: int = 1000, key=None):
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        result = np.zeros((amount, 3), dtype=np.float32)
        position = 0
        for _ in range(20):
            if position >= amount:
                break
            key, sub = jax.random.split(key)
            pts = self.get_surface_points(params, latent_code, sample_size=amount * 6, key=sub)
            used = min(amount - position, pts.shape[0])
            result[position : position + used] = pts[:used]
            position += used
        return result
