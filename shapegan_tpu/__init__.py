"""shapegan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for generative
models of 3D shapes under SDF voxel and continuous implicit representations.

Re-designed from scratch with the capabilities of marian42/shapegan
(arXiv:2002.00349): SDF voxel (V)AEs, voxel GAN/WGAN, DeepSDF autodecoders,
hybrid implicit-generator GANs, progressive-growing hybrid WGAN-GP, and
point-set SDF GANs — plus mesh extraction, sphere-trace rendering,
data preparation, metrics and figure tooling.

Design principles (TPU-first, not a port):
  * All training steps are pure jitted functions over explicit parameter
    pytrees; no mutable module state.
  * The DeepSDF MLP is evaluated through a fused kernel path that never
    materializes per-point latent code repeats (the reference materializes
    ``latent.repeat(res**3)``; see /root/reference/train_hybrid_gan.py:63-66).
  * Scale-out is a named ``jax.sharding.Mesh`` with axes ``('data','points')``
    — batch sharding for conv stacks, point-axis sharding for dense implicit
    grid evaluation — instead of the reference's ``nn.DataParallel``.
  * Static shapes everywhere: sphere tracing is a masked ``lax.while_loop``,
    mesh extraction uses bounded buffers with validity masks.
"""

__version__ = "0.1.0"

LATENT_CODE_SIZE = 128
SDF_CLIPPING = 0.1
