#!/usr/bin/env python3
"""Train the voxel GAN (reference-compatible CLI: continue/nogui/show_slice/verbose;
extensions: synthetic[=N], epochs=N, batch_size=N)."""
from shapegan_tpu.train.gan import train

if __name__ == "__main__":
    train()
