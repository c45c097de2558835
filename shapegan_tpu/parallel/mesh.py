"""Device mesh and sharding layout.

The reference's entire distributed story is single-host ``nn.DataParallel``
around the progressive trainer (/root/reference/train_hybrid_progressive_gan.py:62-68,
SURVEY.md §2.5-2.6). Here scale-out is a first-class named mesh:

  * axis ``'data'``   — batch sharding: every trainer's conv stacks and the
                        per-sample losses shard along it; gradients are
                        reduced by XLA-inserted psums (the only collective
                        the training loops require, riding ICI).
  * axis ``'points'`` — the implicit-MLP "sequence" axis: dense-grid SDF
                        evaluation scales as res^3 per sample (4.2M
                        evals/step at 64^3, SURVEY.md §5), so the point/voxel
                        dimension shards across the mesh too; the all-gather
                        to assemble full volumes before the voxel
                        discriminator is the grid path's single collective.

Parameters and latent tables are replicated (they are tiny: the SDF MLP is
~460 KB fp32). All shardings are expressed as ``NamedSharding`` constraints;
XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINTS_AXIS = "points"


def get_mesh(
    devices=None, data: Optional[int] = None, points: int = 1, batch_size: Optional[int] = None
) -> Mesh:
    """Create the framework mesh over ``devices`` (default: all).

    ``data`` defaults to ``len(devices) // points``, shrunk (if
    ``batch_size`` is given) to the largest value that still divides the
    batch — sharding never dictates the user's batch size.
    """
    import math

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // points
        if batch_size is not None:
            data = math.gcd(data, batch_size)
    if data * points > n:
        raise ValueError(f"mesh {data}x{points} needs more than {n} devices")
    dev_array = np.asarray(devices[: data * points]).reshape(data, points)
    return Mesh(dev_array, (DATA_AXIS, POINTS_AXIS))


def ambient_mesh() -> Optional[Mesh]:
    """The mesh installed by the innermost ``with mesh:`` block, or None.

    Trainers run their jitted steps inside ``with mesh:``; ops use this to
    decide whether to route through shard_map (a Pallas custom call is opaque
    to XLA's SPMD partitioner, so multi-device grids must be sharded
    explicitly — see ops/sdf_mlp_pallas.apply_grid_sharded)."""
    from jax._src import mesh as mesh_lib

    physical = mesh_lib.thread_resources.env.physical_mesh
    return None if physical.empty else physical


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def points_sharding(mesh: Mesh, axis: int = 0, ndim: int = 1) -> NamedSharding:
    """Shard ``axis`` over 'points', replicate the rest."""
    spec = [None] * ndim
    spec[axis] = POINTS_AXIS
    return NamedSharding(mesh, P(*spec))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """[B, P] grid outputs: batch over 'data', point axis over 'points'."""
    return NamedSharding(mesh, P(DATA_AXIS, POINTS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain(x, *axes):
    """Apply a PartitionSpec sharding constraint if a mesh is ambient;
    silently no-op otherwise (single-device tests and eager use)."""
    try:
        return jax.lax.with_sharding_constraint(x, P(*axes))
    except (ValueError, RuntimeError, TypeError):
        return x


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along axis 0."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )
