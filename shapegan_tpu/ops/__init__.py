"""Pure-function kernel layer: coordinates, losses, the fused SDF-MLP,
3D conv wrappers, mesh extraction and sphere tracing."""

from shapegan_tpu.ops.coords import (  # noqa: F401
    voxel_coordinates,
    voxel_coordinate_grid,
    unit_sphere_mask,
    sample_unit_sphere,
)
from shapegan_tpu.ops.losses import (  # noqa: F401
    sdf_reconstruction_loss,
    kld_loss,
    bce_loss,
    voxel_sign_difference,
    gradient_penalty,
)
