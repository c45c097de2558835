#!/usr/bin/env python3
"""Figure factory: thesis/paper-style plots behind argv switches.

Role parity with /root/reference/create_plot.py (933 LoC of ~30 recipes).
Implemented recipe families (same invocation style: ``python3 create_plot.py
<recipe> [args]``); all figures land in ``plots/``:

  training_curves [csv...]   loss curves from the trainers' CSV logs
  latent_distribution        histogram of autodecoder latent codes vs N(0,1)
  tsne                       t-SNE of the latent table, KMeans-colored
  sdf_slices [n]             SDF cross-section heatmaps from sdf_net
  gan_results [n]            voxel-GAN sample grid (marching-cubes renders)
  autoencoder_results [n]    (V)AE reconstruction pairs
  checkpoint_evolution       one shape across epoch snapshots
  raymarch_examples [n]      raymarched renders from the autodecoder
  export_stl [n]             export generated meshes as STL files
"""

import os
import sys

import numpy as np

from shapegan_tpu.util import ensure_directory

ensure_directory("plots")


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _load_sdf_net(config, epoch=None):
    import jax

    from shapegan_tpu import checkpoints
    from shapegan_tpu.models import LATENT_CODES_FILENAME
    from shapegan_tpu.models.sdf_net import SDFNet

    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    params = checkpoints.load(params, "sdf_net", epoch=epoch, base=config.model_dir)
    codes = checkpoints.load_array(LATENT_CODES_FILENAME, epoch=epoch, base=config.model_dir)
    return net, params, codes


def _voxel_image(volume: np.ndarray):
    """Shaded top-down projection of occupied voxels (GL-free mesh preview)."""
    occupancy = (volume < 0).astype(np.float32)
    depth = occupancy.argmax(axis=1) + (1 - occupancy.any(axis=1)) * volume.shape[1]
    img = 1.0 - depth.T / volume.shape[1]
    return img


def training_curves(args, config):
    plt = _mpl()
    csvs = args or [
        os.path.join(config.plot_dir, name)
        for name in os.listdir(config.plot_dir)
        if name.endswith(".csv")
    ]
    fig, ax = plt.subplots(figsize=(8, 5))
    for path in csvs:
        data = np.loadtxt(path, ndmin=2)
        if data.size == 0:
            continue
        label = os.path.splitext(os.path.basename(path))[0]
        ax.plot(data[:, 0], data[:, 2], label=label)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss / score")
    ax.legend()
    fig.savefig("plots/training_curves.png", dpi=120, bbox_inches="tight")
    print("plots/training_curves.png")


def latent_distribution(args, config):
    plt = _mpl()
    from shapegan_tpu import checkpoints
    from shapegan_tpu.models import LATENT_CODES_FILENAME

    codes = checkpoints.load_array(LATENT_CODES_FILENAME, base=config.model_dir).reshape(-1)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(codes, bins=100, density=True, alpha=0.7, label="latent codes")
    x = np.linspace(codes.min(), codes.max(), 200)
    std = codes.std() or 1.0
    ax.plot(x, np.exp(-0.5 * (x / std) ** 2) / (std * np.sqrt(2 * np.pi)),
            label=f"N(0, {std:.3f})")
    ax.legend()
    fig.savefig("plots/latent_distribution.png", dpi=120, bbox_inches="tight")
    print("plots/latent_distribution.png")


def tsne(args, config):
    plt = _mpl()
    from sklearn.cluster import KMeans
    from sklearn.manifold import TSNE

    from shapegan_tpu import checkpoints
    from shapegan_tpu.models import LATENT_CODES_FILENAME

    codes = checkpoints.load_array(LATENT_CODES_FILENAME, base=config.model_dir)
    perplexity = min(30.0, max(2.0, (len(codes) - 1) / 3))
    embedded = TSNE(n_components=2, random_state=0, perplexity=perplexity).fit_transform(codes)
    labels = KMeans(n_clusters=min(10, len(codes)), n_init=10, random_state=0).fit_predict(codes)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(embedded[:, 0], embedded[:, 1], c=labels, cmap="tab10", s=6)
    ax.set_title("autodecoder latent space (t-SNE)")
    fig.savefig("plots/latent_space_tsne.png", dpi=120, bbox_inches="tight")
    print("plots/latent_space_tsne.png")


def sdf_slices(args, config):
    plt = _mpl()
    n = int(args[0]) if args else 6
    net, params, codes = _load_sdf_net(config)
    fig, axes = plt.subplots(1, n, figsize=(3 * n, 3))
    rng = np.random.default_rng(0)
    for ax in np.atleast_1d(axes):
        code = codes[rng.integers(len(codes))]
        volume = net.get_voxels(params, code, voxel_resolution=64)
        ax.imshow(volume[:, :, 32].T, cmap="RdBu", vmin=-0.1, vmax=0.1, origin="lower")
        ax.axis("off")
    fig.savefig("plots/sdf_slices.png", dpi=120, bbox_inches="tight")
    print("plots/sdf_slices.png")


def gan_results(args, config):
    plt = _mpl()
    import jax

    from shapegan_tpu import LATENT_CODE_SIZE, checkpoints
    from shapegan_tpu.train.gan import create_states

    n = int(args[0]) if args else 8
    generator, _, g_state, _ = create_states(jax.random.PRNGKey(0))
    name = "wgan-generator" if "wgan" in args else "generator"
    restored = checkpoints.load(
        {"params": g_state.params, "batch_stats": g_state.batch_stats},
        name, base=config.model_dir,
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (n, LATENT_CODE_SIZE))
    voxels = generator.apply(
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
        z, train=False,
    )
    voxels = np.asarray(voxels)
    fig, axes = plt.subplots(1, n, figsize=(2.2 * n, 2.5))
    for i, ax in enumerate(np.atleast_1d(axes)):
        ax.imshow(_voxel_image(voxels[i]), cmap="gray", origin="lower")
        ax.axis("off")
    fig.savefig("plots/gan_results.png", dpi=120, bbox_inches="tight")
    print("plots/gan_results.png")


def autoencoder_results(args, config):
    plt = _mpl()
    import jax
    import jax.numpy as jnp

    from shapegan_tpu import checkpoints
    from shapegan_tpu.models.autoencoder import Autoencoder
    from shapegan_tpu.train.autoencoder import create_state
    from shapegan_tpu.train.common import resolve_voxel_dataset

    n = int(args[0]) if args else 6
    model = Autoencoder(is_variational="classic" not in args)
    state = create_state(model, jax.random.PRNGKey(0))
    restored = checkpoints.load(
        {"params": state.params, "batch_stats": state.batch_stats},
        model.checkpoint_name, base=config.model_dir,
    )
    variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}
    dataset = resolve_voxel_dataset(config, resolution=32)
    rng = np.random.default_rng(0)
    idx = rng.choice(len(dataset), n, replace=False)
    fig, axes = plt.subplots(2, n, figsize=(2.2 * n, 4.8))
    for col, i in enumerate(idx):
        x = jnp.asarray(dataset[int(i)])
        z = model.apply(variables, x[None], train=False, method=Autoencoder.encode)[0]
        recon = model.apply(variables, z[None], train=False, method=Autoencoder.decode)[0]
        axes[0, col].imshow(_voxel_image(np.asarray(x)), cmap="gray", origin="lower")
        axes[1, col].imshow(_voxel_image(np.asarray(recon)), cmap="gray", origin="lower")
        axes[0, col].axis("off")
        axes[1, col].axis("off")
    axes[0, 0].set_title("input")
    axes[1, 0].set_title("reconstruction")
    fig.savefig("plots/autoencoder_results.png", dpi=120, bbox_inches="tight")
    print("plots/autoencoder_results.png")


def checkpoint_evolution(args, config):
    plt = _mpl()
    import glob

    paths = sorted(glob.glob(os.path.join(config.model_dir, "checkpoints", "sdf_net-epoch-*.npz")))
    epochs = [int(p.split("-epoch-")[1].split(".")[0]) for p in paths]
    if not epochs:
        raise SystemExit("no sdf_net epoch snapshots found")
    fig, axes = plt.subplots(1, len(epochs), figsize=(3 * len(epochs), 3))
    for ax, epoch in zip(np.atleast_1d(axes), epochs):
        net, params, codes = _load_sdf_net(config, epoch=epoch)
        volume = net.get_voxels(params, codes[0], voxel_resolution=48)
        ax.imshow(volume[:, :, 24].T, cmap="RdBu", vmin=-0.1, vmax=0.1, origin="lower")
        ax.set_title(f"epoch {epoch}")
        ax.axis("off")
    fig.savefig("plots/checkpoint_evolution.png", dpi=120, bbox_inches="tight")
    print("plots/checkpoint_evolution.png")


def raymarch_examples(args, config):
    from shapegan_tpu.render.raymarching import render_image_for_index

    n = int(args[0]) if args else 4
    net, params, codes = _load_sdf_net(config)
    for i in range(min(n, len(codes))):
        render_image_for_index(net, params, codes, i, resolution=400)
        print(f"rendered example {i}")


def export_stl(args, config):
    n = int(args[0]) if args else 4
    net, params, codes = _load_sdf_net(config)
    ensure_directory("plots/stl")
    rng = np.random.default_rng(0)
    for i in range(n):
        mesh = net.get_mesh(params, codes[rng.integers(len(codes))], voxel_resolution=64)
        if mesh is not None:
            path = f"plots/stl/shape_{i}.stl"
            mesh.weld().save(path)
            print(path)


RECIPES = {
    "training_curves": training_curves,
    "latent_distribution": latent_distribution,
    "tsne": tsne,
    "sdf_slices": sdf_slices,
    "gan_results": gan_results,
    "autoencoder_results": autoencoder_results,
    "checkpoint_evolution": checkpoint_evolution,
    "raymarch_examples": raymarch_examples,
    "export_stl": export_stl,
}


def main():
    from shapegan_tpu.core.config import parse_cli

    if len(sys.argv) < 2 or sys.argv[1] not in RECIPES:
        print(__doc__)
        print("available recipes:", ", ".join(RECIPES))
        return
    recipe = sys.argv[1]
    args = [a for a in sys.argv[2:] if "=" not in a]
    config = parse_cli(sys.argv[2:])
    RECIPES[recipe](args, config)


if __name__ == "__main__":
    main()
