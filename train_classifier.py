#!/usr/bin/env python3
"""Train the 3D voxel classifier (a component the reference defines but never
trains — model/classifier.py). Synthetic primitive classes by default."""
from shapegan_tpu.train.classifier import train

if __name__ == "__main__":
    train()
