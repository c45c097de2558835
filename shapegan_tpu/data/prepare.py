"""Offline data preparation: triangle meshes → training artifacts.

Behavioral parity with /root/reference/prepare_shapenet_dataset.py and
prepare_data.py. Per mesh:
  * voxel grids at resolutions [8, 16, 32, 64] of the unit-cube-scaled mesh
    → ``<out>/voxels_<res>/<id>.npy``
  * uniform unit-sphere SDF samples → ``<out>/uniform/<id>.npy`` [N, 4]
  * jittered near-surface samples  → ``<out>/surface/<id>.npy`` [N, 4]
  * DeepSDF biased cloud (200k points) → ``<out>/cloud/<id>.npy`` [N, 4]
and a combine step concatenating all clouds into the monolithic
``sdf_points.npy`` / ``sdf_values.npy`` autodecoder artifacts
(reference :167-188, stored as .npy instead of torch .to).

Work fans out over a process pool (cpu_count // 2, reference :154-165); runs
are idempotent (existing outputs are skipped) and bad meshes are quarantined
with ``.badmesh`` marker files (reference :58-67). The mesh → SDF oracle is
the in-framework native BVH engine (data/mesh_to_sdf.py).
"""

from __future__ import annotations

import multiprocessing
import os
import traceback
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

VOXEL_RESOLUTIONS = [8, 16, 32, 64]
UNIFORM_SAMPLE_COUNT = 64**3
SURFACE_SAMPLE_COUNT = 64**3
CLOUD_SAMPLE_COUNT = 200000


@dataclass
class PrepareConfig:
    output_dir: str = "data/prepared"
    voxel_resolutions: List[int] = field(default_factory=lambda: list(VOXEL_RESOLUTIONS))
    make_voxels: bool = True
    make_points: bool = True
    make_cloud: bool = True
    uniform_count: int = UNIFORM_SAMPLE_COUNT
    surface_count: int = SURFACE_SAMPLE_COUNT
    cloud_count: int = CLOUD_SAMPLE_COUNT
    rotation: Optional[float] = None  # optional y-rotation in degrees
    workers: Optional[int] = None
    id_mode: str = "stem"  # 'stem' = filename; 'shapenet' = <id>/models/model_normalized.obj


def _mesh_id(path: str, mode: str = "stem") -> str:
    if mode == "shapenet":
        return os.path.normpath(path).split(os.sep)[-3]
    return os.path.splitext(os.path.basename(path))[0]


def _badmesh_path(config: PrepareConfig, mesh_id: str) -> str:
    return os.path.join(config.output_dir, f"{mesh_id}.badmesh")


def _outputs_exist(config: PrepareConfig, mesh_id: str) -> bool:
    checks = []
    if config.make_voxels:
        checks += [
            os.path.join(config.output_dir, f"voxels_{r}", f"{mesh_id}.npy")
            for r in config.voxel_resolutions
        ]
    if config.make_points:
        checks += [
            os.path.join(config.output_dir, "uniform", f"{mesh_id}.npy"),
            os.path.join(config.output_dir, "surface", f"{mesh_id}.npy"),
        ]
    if config.make_cloud:
        checks.append(os.path.join(config.output_dir, "cloud", f"{mesh_id}.npy"))
    return bool(checks) and all(os.path.exists(p) for p in checks)


def process_mesh_file(path: str, config: PrepareConfig) -> str:
    """Prepare one mesh. Returns 'ok', 'skipped', or 'bad'."""
    from shapegan_tpu.data.mesh_io import load_mesh
    from shapegan_tpu.data.mesh_to_sdf import (
        BadMeshException,
        MeshSDF,
        mesh_to_voxels,
        sample_surface_sdf,
        sample_uniform_sdf,
        sample_sdf_near_surface,
    )
    from shapegan_tpu.render.camera import rotation_matrix

    mesh_id = _mesh_id(path, config.id_mode)
    if os.path.exists(_badmesh_path(config, mesh_id)):
        return "skipped"
    if _outputs_exist(config, mesh_id):
        return "skipped"

    try:
        mesh = load_mesh(path)
        if config.rotation is not None:
            rot = rotation_matrix(config.rotation, "y")[:3, :3].astype(np.float32)
            mesh = type(mesh)(mesh.vertices @ rot.T, mesh.faces)

        if config.make_voxels:
            unit_cube = mesh.scaled_to_unit_cube()
            from shapegan_tpu.ops.coords import voxel_coordinates

            oracle = MeshSDF(unit_cube)
            for res in config.voxel_resolutions:
                out_dir = os.path.join(config.output_dir, f"voxels_{res}")
                os.makedirs(out_dir, exist_ok=True)
                out_path = os.path.join(out_dir, f"{mesh_id}.npy")
                if not os.path.exists(out_path):
                    sdf = oracle.query(voxel_coordinates(res)).reshape((res,) * 3)
                    np.save(out_path, sdf)

        if config.make_points or config.make_cloud:
            unit_sphere = mesh.scaled_to_unit_sphere()
            oracle = MeshSDF(unit_sphere)

            if config.make_points:
                rng = np.random.default_rng(abs(hash(mesh_id)) % 2**31)
                os.makedirs(os.path.join(config.output_dir, "uniform"), exist_ok=True)
                os.makedirs(os.path.join(config.output_dir, "surface"), exist_ok=True)
                upath = os.path.join(config.output_dir, "uniform", f"{mesh_id}.npy")
                if not os.path.exists(upath):
                    np.save(upath, sample_uniform_sdf(unit_sphere, config.uniform_count,
                                                      rng=rng, oracle=oracle))
                spath = os.path.join(config.output_dir, "surface", f"{mesh_id}.npy")
                if not os.path.exists(spath):
                    np.save(spath, sample_surface_sdf(unit_sphere, config.surface_count,
                                                      rng=rng, oracle=oracle))

            if config.make_cloud:
                os.makedirs(os.path.join(config.output_dir, "cloud"), exist_ok=True)
                cpath = os.path.join(config.output_dir, "cloud", f"{mesh_id}.npy")
                if not os.path.exists(cpath):
                    points, sdf = sample_sdf_near_surface(unit_sphere, config.cloud_count)
                    np.save(cpath, np.concatenate([points, sdf[:, None]], axis=1))
        return "ok"
    except BadMeshException:
        os.makedirs(config.output_dir, exist_ok=True)
        open(_badmesh_path(config, mesh_id), "w").close()
        return "bad"
    except Exception:
        traceback.print_exc()
        return "bad"


def process_mesh_files(paths: List[str], config: PrepareConfig, workers: Optional[int] = None):
    """Fan mesh prep over a process pool (reference :142-165)."""
    os.makedirs(config.output_dir, exist_ok=True)
    workers = workers or config.workers or max(1, (os.cpu_count() or 2) // 2)
    results = []
    if workers == 1:
        results = [process_mesh_file(p, config) for p in paths]
    else:
        with multiprocessing.Pool(workers) as pool:
            handles = [pool.apply_async(process_mesh_file, (p, config)) for p in paths]
            results = [h.get() for h in handles]
    counts = {s: results.count(s) for s in ("ok", "skipped", "bad")}
    print(f"prepared {counts['ok']}, skipped {counts['skipped']}, bad {counts['bad']}")
    return results


def combine_sdf_clouds(config: PrepareConfig, out_dir: Optional[str] = None):
    """Concatenate per-shape clouds into monolithic autodecoder tensors
    (reference combine step :167-188)."""
    cloud_dir = os.path.join(config.output_dir, "cloud")
    files = sorted(
        os.path.join(cloud_dir, f) for f in os.listdir(cloud_dir) if f.endswith(".npy")
    )
    if not files:
        raise FileNotFoundError(f"no clouds found in {cloud_dir}")
    points, values = [], []
    for f in files:
        data = np.load(f)
        points.append(data[:, :3].astype(np.float32))
        values.append(data[:, 3].astype(np.float32))
    out_dir = out_dir or os.path.dirname(config.output_dir.rstrip("/")) or "."
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "sdf_points.npy"), np.concatenate(points))
    np.save(os.path.join(out_dir, "sdf_values.npy"), np.concatenate(values))
    print(f"combined {len(files)} clouds -> {out_dir}/sdf_points.npy")


def write_split_file(config: PrepareConfig, train_fraction: float = 0.9, seed: int = 0):
    """Write train.txt / test.txt id lists (the reference consumes these via
    VoxelDataset.from_split)."""
    res = config.voxel_resolutions[0]
    vox_dir = os.path.join(config.output_dir, f"voxels_{res}")
    ids = sorted(os.path.splitext(f)[0] for f in os.listdir(vox_dir) if f.endswith(".npy"))
    rng = np.random.default_rng(seed)
    rng.shuffle(ids)
    split = int(len(ids) * train_fraction)
    with open(os.path.join(config.output_dir, "train.txt"), "w") as f:
        f.write("\n".join(ids[:split]) + "\n")
    with open(os.path.join(config.output_dir, "test.txt"), "w") as f:
        f.write("\n".join(ids[split:]) + "\n")
