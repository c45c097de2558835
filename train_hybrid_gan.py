#!/usr/bin/env python3
"""Train the hybrid GAN (DeepSDF generator + voxel discriminator)."""
from shapegan_tpu.train.hybrid_gan import train

if __name__ == "__main__":
    train()
