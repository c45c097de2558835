#!/usr/bin/env python3
"""Bootstrap demo checkpoints from a fresh clone — no dataset required.

The reference ships three pretrained voxel-GAN generators
(/root/reference/examples/gan_generator_voxels_*.to, README.md:75-78) so
``demo_gan.py`` works out of the box. Those artifacts are tens of MB and
ShapeNet-derived; here the equivalent is a bootstrap script: train small
checkpoints on synthetic analytic SDF shapes (spheres/boxes/capsules —
data/synthetic.py) writing the exact checkpoint layouts the demos load (wall-clock is
compile-dominated: ~25 min through a remote-compile TPU tunnel, much less
on a local chip; `quick` trims the step counts, not the compile count):

  models/generator.npz + discriminator.npz     → demo_gan.py
  models/wgan-generator.npz + wgan-critic.npz  → demo_gan.py wgan
  models/sdf_net.npz + sdf_net_latent_codes.npz → demo_sdf_net.py,
                                                  demo_latent_space.py, metrics.py
  models/autoencoder-128.npz                   → demo_autoencoder.py classic
  models/classifier.npz                        → train_classifier.py continue

    python3 make_examples.py [quick]   # quick: ~4x fewer steps
"""

import sys
import time

from shapegan_tpu.core.config import TrainConfig


def main():
    quick = "quick" in sys.argv
    scale = 4 if quick else 1
    t0 = time.time()

    def stage(name, fn):
        start = time.time()
        fn()
        print(f"[make_examples] {name} done in {time.time() - start:.1f}s")

    def gan():
        from shapegan_tpu.train import gan

        gan.train(TrainConfig(synthetic=32, epochs=max(2, 24 // scale), nogui=True))

    def wgan():
        from shapegan_tpu.train import wgan

        wgan.train(TrainConfig(synthetic=32, epochs=max(2, 24 // scale), nogui=True))

    def autodecoder():
        from shapegan_tpu.train import sdf_autodecoder

        sdf_autodecoder.train(
            TrainConfig(
                synthetic=8, epochs=max(10, 120 // scale), nogui=True,
                extras={"pointcloud_size": 20000},
            )
        )

    def autoencoder():
        from shapegan_tpu.train import autoencoder

        autoencoder.train(
            TrainConfig(synthetic=32, classic=True, epochs=max(2, 16 // scale), nogui=True)
        )

    def classifier():
        from shapegan_tpu.train import classifier

        classifier.train(TrainConfig(synthetic=64, epochs=max(2, 12 // scale), nogui=True))

    stage("voxel GAN", gan)
    stage("voxel WGAN", wgan)
    stage("SDF autodecoder", autodecoder)
    stage("autoencoder", autoencoder)
    stage("classifier", classifier)
    stage("bundle examples", bundle_examples)
    print(f"[make_examples] all demo checkpoints ready in {time.time() - t0:.1f}s")


def bundle_examples(model_dir: str = "models"):
    """Repackage the demo-relevant checkpoints as bundled examples.

    Writes fp16, optimizer-stripped, compressed copies into
    ``shapegan_tpu/examples/`` — the fallback ``checkpoints.load`` uses on a
    fresh clone (mirroring the reference's shipped pretrained generators,
    /root/reference/examples/). Optimizer moments and epoch counters are
    training state, not demo state, and double-to-triple the artifact size.
    """
    import os

    import numpy as np

    from shapegan_tpu.checkpoints import EXAMPLES_PATH

    artifacts = [
        "generator", "wgan-generator", "sdf_net", "sdf_net_latent_codes",
        "autoencoder-128",
    ]
    os.makedirs(EXAMPLES_PATH, exist_ok=True)
    for name in artifacts:
        src = os.path.join(model_dir, f"{name}.npz")
        out = {}
        with np.load(src) as data:
            for key in data.files:
                if key.startswith("opt_state/") or key == "epoch":
                    continue
                value = data[key]
                # fp16 halves the bundle size for the big network weights;
                # the latent-code table is ~2 KB and feeds latent-space
                # arithmetic in demos/create_plot, so keep it full precision.
                if value.dtype == np.float32 and name != "sdf_net_latent_codes":
                    value = value.astype(np.float16)
                out[key] = value
        dst = os.path.join(EXAMPLES_PATH, f"{name}.npz")
        np.savez_compressed(dst, **out)
        print(f"[make_examples] bundled {dst} ({os.path.getsize(dst) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
