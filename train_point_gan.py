#!/usr/bin/env python3
"""Train the point-set SDF GAN (reference CLI: --category NAME; extensions:
synthetic[=N], epochs=N caps each curriculum stage)."""
from shapegan_tpu.train.point_gan import train

if __name__ == "__main__":
    train()
