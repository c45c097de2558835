#!/usr/bin/env python3
"""Train the voxel WGAN with weight clipping (reference-compatible CLI)."""
from shapegan_tpu.train.wgan import train

if __name__ == "__main__":
    train()
