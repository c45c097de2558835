#!/usr/bin/env python3
"""Train the progressive hybrid WGAN-GP (the paper's flagship model).

Reference-compatible CLI: iteration=N epochs=N continue nogui show_slice verbose
(run once per growth iteration 0..3, like the reference README's recipe).
"""
from shapegan_tpu.train.hybrid_progressive_gan import train

if __name__ == "__main__":
    train()
