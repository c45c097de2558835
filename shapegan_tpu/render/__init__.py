"""Inference/rendering: sphere-traced raymarching on TPU, camera math,
binary voxel meshing, and the host-side GL viewer."""

from shapegan_tpu.render.raymarching import render_image, render_image_for_index  # noqa: F401
