#!/usr/bin/env python3
"""Train the 32^3 voxel (variational) autoencoder.

Reference-compatible CLI (/root/reference/README.md:98-102):
    python3 train_autoencoder.py [classic] [continue] [nogui] [show_slice] [verbose]
Framework extensions:
    synthetic[=N]   train on N analytic SDF shapes (no dataset required)
    epochs=N        stop after N epochs (reference runs forever)
"""
from shapegan_tpu.train.autoencoder import train

if __name__ == "__main__":
    train()
