#!/usr/bin/env python3
"""Latent-space tour: t-SNE embedding + KMeans-ordered traversal with a
side-by-side scatter plot per frame.

Role parity with /root/reference/demo_latent_space.py: embed the
autodecoder's latent table in 2D with t-SNE, order cluster centers into a
short tour, spline through the corresponding latent codes, and write
composite frames (render left, embedding + cursor right) into
``screenshots/latent_space_tour/``.

    python3 demo_latent_space.py [clusters=N] [frames_per_transition=N] [resolution=N]
"""

import os

import numpy as np
import jax

from shapegan_tpu import checkpoints
from shapegan_tpu.core.config import parse_cli
from shapegan_tpu.models import LATENT_CODES_FILENAME
from shapegan_tpu.models.sdf_net import SDFNet
from shapegan_tpu.render.raymarching import render_image
from shapegan_tpu.util import ensure_directory

from demo_sdf_net import catmull_rom


def main():
    config = parse_cli()
    clusters = int(config.extras.get("clusters", 10))
    frames_per_transition = int(config.extras.get("frames_per_transition", 30))
    resolution = int(config.extras.get("resolution", 400))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.cluster import KMeans
    from sklearn.manifold import TSNE

    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    params = checkpoints.load(params, "sdf_net", base=config.model_dir)
    codes = checkpoints.load_array(LATENT_CODES_FILENAME, base=config.model_dir)

    print("computing t-SNE embedding...")
    perplexity = min(30.0, max(2.0, (len(codes) - 1) / 3))
    embedded = TSNE(
        n_components=2, random_state=config.seed, perplexity=perplexity
    ).fit_transform(codes)
    kmeans = KMeans(n_clusters=min(clusters, len(codes)), random_state=config.seed, n_init=10)
    kmeans.fit(codes)
    # Greedy nearest-neighbor tour through the cluster centers.
    centers = kmeans.cluster_centers_
    order = [0]
    remaining = set(range(1, len(centers)))
    while remaining:
        last = centers[order[-1]]
        nxt = min(remaining, key=lambda i: np.linalg.norm(centers[i] - last))
        order.append(nxt)
        remaining.discard(nxt)
    tour_codes = centers[order]
    path = catmull_rom(tour_codes, frames_per_transition)

    # 2D positions for the cursor: project path codes onto the embedding via
    # nearest latent neighbors.
    def embed_2d(code):
        idx = np.argmin(np.linalg.norm(codes - code, axis=1))
        return embedded[idx]

    out_dir = "screenshots/latent_space_tour"
    ensure_directory(out_dir)
    for i, code in enumerate(path):
        filename = os.path.join(out_dir, f"frame-{i:05d}.png")
        if os.path.exists(filename):
            continue
        image = render_image(net, params, code.astype(np.float32),
                             resolution=resolution, ssaa=1, iterations=400)
        fig, axes = plt.subplots(1, 2, figsize=(10, 5))
        axes[0].imshow(np.asarray(image))
        axes[0].axis("off")
        axes[1].scatter(embedded[:, 0], embedded[:, 1], s=4,
                        c=kmeans.labels_, cmap="tab10", alpha=0.6)
        cursor = embed_2d(code)
        axes[1].scatter([cursor[0]], [cursor[1]], s=120, c="black", marker="x")
        axes[1].set_title("latent space (t-SNE)")
        fig.savefig(filename, dpi=100, bbox_inches="tight")
        plt.close(fig)
        print(f"frame {i + 1}/{len(path)}")


if __name__ == "__main__":
    main()
