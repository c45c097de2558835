#!/usr/bin/env python3
"""Train the point-GAN refinement stage (surface projection + mixed batches).
Warm-starts from train_point_gan.py checkpoints when present."""
from shapegan_tpu.train.point_gan_ref import train

if __name__ == "__main__":
    train()
