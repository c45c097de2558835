#!/usr/bin/env python3
"""Train the hybrid WGAN (DeepSDF generator + voxel critic, weight clipping)."""
from shapegan_tpu.train.hybrid_wgan import train

if __name__ == "__main__":
    train()
