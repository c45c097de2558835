#!/usr/bin/env python3
"""Train the DeepSDF autodecoder (implicit MLP + per-shape latent table).

Reference-compatible CLI; extensions: synthetic=N pointcloud_size=P epochs=N.
"""
from shapegan_tpu.train.sdf_autodecoder import train

if __name__ == "__main__":
    train()
