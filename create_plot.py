#!/usr/bin/env python3
"""Figure factory: thesis/paper-style plots behind argv switches.

Full recipe parity with /root/reference/create_plot.py (933 LoC, ~30
argv-gated recipes). Same invocation style — ``python3 create_plot.py
<recipe> [args] [name=value]`` — with the reference's hyphenated recipe names
accepted as aliases. All figures land in ``plots/``.

Shape images are rendered through the framework's shadow-mapped renderer
(render/viewer.MeshRenderer → native software rasterizer on headless hosts),
and implicit-model images through the on-device raymarcher — so every recipe
works without a display.

Dataset / checkpoint layout follows the trainers: voxels under
``data/<category>/voxels_32``, checkpoints under ``models/`` (npz pytrees),
the autodecoder latent table as ``models/sdf_net_latent_codes.npz``.

Extras (name=value): ``res=N`` raymarch/grid render resolution,
``voxel_res=N`` implicit-eval grid resolution, ``count=N`` sample count,
``steps=N`` interpolation steps.

Recipes (reference create_plot.py line refs in each function):
  training_curves, autoencoder_training, wgan_training, sdf_training
  latent_distribution, autoencoder_hist, autodecoder_hist
  tsne, autoencoder_tsne, autodecoder_tsne, gan_tsne, color_test
  autoencoder_results, autoencoder_classes, autoencoder_examples,
  autoencoder_examples_2, autoencoder_generate,
  autoencoder_interpolation, autoencoder_interpolation_2
  gan_results, gan_examples, gan_interpolation, wgan_results
  sdf_slices, sdf_slice, voxel_occupancy, model_images
  sdf_net_reconstruction, sdf_net_interpolation, sdf_net_sample
  hybrid_gan, hybrid_gan_interpolation, hybrid_gan_upscaling
  checkpoint_evolution, vae_checkpoints, sdf_checkpoints
  shapenet_errors, raymarch_examples, export_stl, deepsdf_interpolation_stl
"""

import os
import sys

import numpy as np

from shapegan_tpu.util import ensure_directory

ensure_directory("plots")

from shapegan_tpu import LATENT_CODE_SIZE


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _extra_int(config, key, default):
    return int(config.extras.get(key, default))


# ---------------------------------------------------------------- loaders


def _load_sdf_net(config, epoch=None, filename=None):
    import jax

    from shapegan_tpu import checkpoints
    from shapegan_tpu.models import LATENT_CODES_FILENAME
    from shapegan_tpu.models.sdf_net import SDFNet

    net = SDFNet()
    params = net.init(jax.random.PRNGKey(0))
    params = checkpoints.load(params, filename or "sdf_net", epoch=epoch, base=config.model_dir)
    codes = None
    if filename is None:
        # Raise the clear missing-file error here rather than letting recipes
        # that index the table fail later with an opaque NoneType error;
        # recipes that sample codes fresh pass an explicit ``filename``.
        codes = checkpoints.load_array(LATENT_CODES_FILENAME, epoch=epoch, base=config.model_dir)
    return net, params, codes


def _load_autoencoder(config, is_variational):
    """(model, inference variables) restored from the trainer's checkpoint
    (reference load_autoencoder, create_plot.py:57-62)."""
    import jax

    from shapegan_tpu import checkpoints
    from shapegan_tpu.models.autoencoder import Autoencoder
    from shapegan_tpu.train.autoencoder import create_state

    model = Autoencoder(is_variational=is_variational)
    state = create_state(model, jax.random.PRNGKey(0))
    restored = checkpoints.load(
        {"params": state.params, "batch_stats": state.batch_stats},
        model.checkpoint_name, base=config.model_dir,
    )
    return model, {"params": restored["params"], "batch_stats": restored["batch_stats"]}


def _ae_encode(model, variables, voxels):
    from shapegan_tpu.models.autoencoder import Autoencoder
    import jax.numpy as jnp

    return np.asarray(
        model.apply(variables, jnp.asarray(voxels), train=False, method=Autoencoder.encode)
    )


def _ae_decode(model, variables, codes):
    from shapegan_tpu.models.autoencoder import Autoencoder
    import jax.numpy as jnp

    return np.asarray(
        model.apply(variables, jnp.asarray(codes), train=False, method=Autoencoder.decode)
    )


def _load_generator_fn(config, wgan: bool, epoch=None):
    """Voxel-GAN generator as z -> [n, 32, 32, 32] numpy (reference
    load_generator, create_plot.py:64-71)."""
    import jax

    from shapegan_tpu import checkpoints
    from shapegan_tpu.train.gan import create_states

    generator, _, g_state, _ = create_states(jax.random.PRNGKey(0))
    name = "wgan-generator" if wgan else "generator"
    restored = checkpoints.load(
        {"params": g_state.params, "batch_stats": g_state.batch_stats},
        name, epoch=epoch, base=config.model_dir,
    )
    variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}

    def generate(z):
        return np.asarray(generator.apply(variables, z, train=False))

    return generate


def _dataset_voxels(config, count, seed=0, resolution=32):
    from shapegan_tpu.train.common import resolve_voxel_dataset

    dataset = resolve_voxel_dataset(config, resolution=resolution)
    rng = np.random.default_rng(seed)
    indices = rng.choice(len(dataset), min(count, len(dataset)), replace=False)
    return np.stack([np.asarray(dataset[int(i)]) for i in indices])


def _labeled_voxels(config, per_class=1, seed=0, resolution=32):
    """(voxels, labels, class names): one or more categories from the data
    directory, or synthetic shape classes when no dataset exists (the
    reference's dataset.load_labels equivalent for this framework's
    per-category layout)."""
    import glob as globlib

    categories = []
    if os.path.isdir(config.data_dir):
        for entry in sorted(os.listdir(config.data_dir)):
            if os.path.isdir(os.path.join(config.data_dir, entry, f"voxels_{resolution}")):
                categories.append(entry)
    if not categories:
        from shapegan_tpu.train.classifier import make_synthetic_class_dataset

        volumes, labels, label_count = make_synthetic_class_dataset(
            max(per_class, 2), resolution=resolution, seed=seed
        )
        names = [f"class {i}" for i in range(label_count)]
        return np.asarray(volumes), np.asarray(labels), names

    rng = np.random.default_rng(seed)
    voxels, labels = [], []
    for label, category in enumerate(categories):
        files = sorted(
            globlib.glob(os.path.join(config.data_dir, category, f"voxels_{resolution}", "*.npy"))
        )
        chosen = rng.choice(len(files), min(per_class, len(files)), replace=False)
        for i in chosen:
            grid = np.load(files[int(i)])
            grid = np.clip(grid, -0.1, 0.1) / 0.1
            voxels.append(grid)
            labels.append(label)
    return np.stack(voxels), np.asarray(labels), categories


def _class_color(label):
    import matplotlib.cm as cm

    return tuple(cm.tab10(int(label) % 10)[:3])


def _interpolate(code_start, code_end, steps):
    """Linear latent interpolation (reference create_plot.py:434-435)."""
    t = np.linspace(0.0, 1.0, steps)[:, None]
    return code_start[None, :] * (1.0 - t) + code_end[None, :] * t


# ------------------------------------------------------------- image grid


class ImageGrid:
    """Matplotlib grid of rendered shapes (reference ImageGrid,
    create_plot.py:18-55), backed by the shadow-mapped software renderer."""

    def __init__(self, width, height=1, cell_width=3, cell_height=None, margin=0.2,
                 create_viewer=True, crop=True, render_size=400):
        plt = _mpl()
        self.width = width
        self.height = height
        cell_height = cell_height if cell_height is not None else cell_width
        self.figure, self.axes = plt.subplots(
            height, width,
            figsize=(width * cell_width, height * cell_height),
            gridspec_kw={"left": 0, "right": 1, "top": 1, "bottom": 0,
                         "wspace": margin, "hspace": margin},
        )
        self.figure.patch.set_visible(False)
        self.crop = crop
        self.viewer = None
        if create_viewer:
            from shapegan_tpu.render.viewer import MeshRenderer

            self.viewer = MeshRenderer(size=render_size, start_thread=False)

    def _cell(self, x, y):
        axes = np.atleast_1d(self.axes).reshape(self.height, self.width)
        return axes[y, x]

    def set_image(self, image, x=0, y=0):
        cell = self._cell(x, y)
        cell.imshow(image, cmap="gray" if np.asarray(image).ndim == 2 else None)
        cell.axis("off")
        cell.patch.set_visible(False)

    def set_voxels(self, voxels, x=0, y=0, color=None):
        if color is not None:
            self.viewer.model_color = tuple(color)
        self.viewer.set_voxels(np.asarray(voxels))
        self.set_image(self.viewer.get_image(crop=self.crop), x, y)

    def set_mesh(self, mesh, x=0, y=0, color=None):
        if color is not None:
            self.viewer.model_color = tuple(color)
        self.viewer.set_mesh(mesh)
        self.set_image(self.viewer.get_image(crop=self.crop), x, y)

    def save(self, filename):
        import matplotlib.pyplot as plt

        self.figure.savefig(filename, dpi=200, bbox_inches="tight")
        plt.close(self.figure)
        print(filename)


def _voxel_image(volume: np.ndarray):
    """Shaded top-down projection of occupied voxels (fast GL-free preview,
    kept for terminal-grade figures)."""
    occupancy = (volume < 0).astype(np.float32)
    depth = occupancy.argmax(axis=1) + (1 - occupancy.any(axis=1)) * volume.shape[1]
    img = 1.0 - depth.T / volume.shape[1]
    return img


def create_tsne_plot(codes, images=None, labels=None, filename="plots/tsne.png"):
    """t-SNE scatter with optional per-point shape thumbnails (reference
    create_tsne_plot, create_plot.py:88-142)."""
    plt = _mpl()
    from sklearn.manifold import TSNE
    from matplotlib.offsetbox import AnnotationBbox, OffsetImage

    perplexity = min(30.0, max(2.0, (len(codes) - 1) / 3))
    embedded = TSNE(n_components=2, random_state=0, perplexity=perplexity).fit_transform(
        np.asarray(codes)
    )
    x = np.interp(embedded[:, 0], (embedded[:, 0].min(), embedded[:, 0].max()), (0, 1))
    y = np.interp(embedded[:, 1], (embedded[:, 1].min(), embedded[:, 1].max()), (0, 1))

    fig, ax = plt.subplots(figsize=(12, 12))
    plt.axis("off")
    ax.scatter(x, y, c=labels if labels is not None else "tab:blue", s=40, cmap="Set1")
    if images is not None:
        for i, image in enumerate(images):
            box = AnnotationBbox(OffsetImage(image, zoom=0.5), (x[i], y[i]), frameon=True)
            ax.add_artist(box)
    fig.savefig(filename, dpi=150, bbox_inches="tight")
    print(filename)


# =============================================================== curves


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


def wgan_training(args, config):
    """Critic output curves from the WGAN log (reference :540-550)."""
    plt = _mpl()
    data = np.loadtxt(os.path.join(config.plot_dir, "wgan_training.csv"), ndmin=2)
    fig, ax = plt.subplots()
    ax.plot(data[:, 3], label="Assessment of real objects")
    ax.plot(data[:, 2], label="Assessment of fake objects")
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Critic output")
    ax.legend()
    fig.savefig("plots/wgan-training-critic.png", dpi=120, bbox_inches="tight")
    print("plots/wgan-training-critic.png")


def sdf_training(args, config):
    """Autodecoder loss curve (reference :552-561)."""
    plt = _mpl()
    data = np.loadtxt(os.path.join(config.plot_dir, "sdf_net_training.csv"), ndmin=2)
    fig, ax = plt.subplots()
    epochs = np.arange(1, data.shape[0] + 1)
    ax.plot(epochs, data[:, 2], linestyle="-", linewidth=0.5, color="grey")
    ax.plot(epochs, data[:, 2], "x")
    ax.set_ylabel("Loss")
    ax.set_xlabel("Epoch")
    fig.savefig("plots/deepsdf-training-loss.png", dpi=120, bbox_inches="tight")
    print("plots/deepsdf-training-loss.png")


def autoencoder_training(args, config):
    """(V)AE training curves: normalized recon + voxel error per variant, or
    the latex two-figure variant (reference :564-610)."""
    plt = _mpl()
    if "latex" in args:
        data = np.loadtxt(
            os.path.join(config.plot_dir, "variational_autoencoder_training.csv"), ndmin=2
        )
        fig, ax = plt.subplots()
        ax.plot(data[:, 2], label="Reconstruction loss")
        ax.plot(data[:, 3], label="KLD loss")
        ax.set_xlabel("Epoch")
        ax.set_ylabel("Loss")
        ax.legend()
        fig.savefig("plots/vae-training-loss.png", dpi=120, bbox_inches="tight")
        print("plots/vae-training-loss.png")
        fig, ax = plt.subplots()
        ax.plot(data[:, 4])
        ax.set_xlabel("Epoch")
        ax.set_ylabel("Voxel error")
        fig.savefig("plots/vae-training-error.png", dpi=120, bbox_inches="tight")
        print("plots/vae-training-error.png")
        return
    for csv_name, title, out in (
        ("autoencoder_training.csv", "Autoencoder Training", "plots/autoencoder-training.png"),
        ("variational_autoencoder_training.csv", "Variational Autoencoder Training",
         "plots/variational-autoencoder-training.png"),
    ):
        path = os.path.join(config.plot_dir, csv_name)
        if not os.path.isfile(path):
            continue
        data = np.loadtxt(path, ndmin=2)
        fig, ax = plt.subplots()
        max_recon = np.max(data[:, 2]) or 1.0
        ax.plot(data[:, 2] / max_recon,
                label=f"Reconstruction loss ({data[-1, 2]:.3f})")
        ax.plot(data[:, 4] / (np.max(data[:, 4]) or 1.0),
                label=f"Voxel error ({data[-1, 4]:.3f})")
        ax.set_xlabel("Epoch")
        ax.set_yticks([])
        ax.set_title(title)
        ax.legend(loc="center right")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        print(out)


# ============================================================ histograms


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


def _hist_pair(codes, x_range, prefix, overlay_normal):
    """Per-dimension step histograms + combined histogram (reference
    autoencoder_hist/autodecoder_hist, create_plot.py:251-301)."""
    plt = _mpl()
    fig, ax = plt.subplots()
    ax.hist(codes[:, ::4], bins=100, range=(-x_range, x_range), histtype="step",
            density=True, color=["#1f77b4"] * len(range(0, codes.shape[1], 4)))
    ax.set_xlabel(r"$\mathbf{z}^{(i)}$")
    ax.set_ylabel("relative abundance")
    fig.savefig(f"plots/{prefix}-histogram.png", dpi=120, bbox_inches="tight")
    print(f"plots/{prefix}-histogram.png")

    fig, ax = plt.subplots()
    flat = codes.reshape(-1)
    if overlay_normal:
        x = np.linspace(-x_range, x_range, 500)
        ax.plot(x, np.exp(-0.5 * x**2) / np.sqrt(2 * np.pi), color="green")
    ax.hist(flat, bins=100, range=(-x_range, x_range), density=True)
    ax.set_xlabel(r"$\mathbf{z}$")
    ax.set_ylabel("relative abundance")
    fig.savefig(f"plots/{prefix}-histogram-combined.png", dpi=120, bbox_inches="tight")
    print(f"plots/{prefix}-histogram-combined.png")


def autoencoder_hist(args, config):
    is_variational = "classic" not in args
    model, variables = _load_autoencoder(config, is_variational)
    voxels = _dataset_voxels(config, _extra_int(config, "count", 512))
    codes = _ae_encode(model, variables, voxels)
    prefix = "variational-autoencoder" if is_variational else "autoencoder"
    _hist_pair(codes, x_range=4.0 if is_variational else 1.0, prefix=prefix,
               overlay_normal=is_variational)


def autodecoder_hist(args, config):
    from shapegan_tpu import checkpoints
    from shapegan_tpu.models import LATENT_CODES_FILENAME

    codes = checkpoints.load_array(LATENT_CODES_FILENAME, base=config.model_dir)
    _hist_pair(codes, x_range=0.42, prefix="autodecoder", overlay_normal=False)


def voxel_occupancy(args, config):
    """Histogram of occupied-voxel counts over the dataset (reference
    :650-658)."""
    plt = _mpl()
    voxels = _dataset_voxels(config, _extra_int(config, "count", 1000))
    occupied = (voxels < 0).reshape(len(voxels), -1).sum(axis=1)
    fig, ax = plt.subplots()
    ax.hist(occupied, bins=100)
    fig.savefig("plots/voxel-occupancy-histogram.png", dpi=120, bbox_inches="tight")
    print("plots/voxel-occupancy-histogram.png")


# ================================================================= t-SNE


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


def autoencoder_tsne(args, config):
    """Class-colored t-SNE of (V)AE codes with shape thumbnails (reference
    'autoencoder', create_plot.py:224-235)."""
    is_variational = "classic" not in args
    model, variables = _load_autoencoder(config, is_variational)
    voxels, labels, _ = _labeled_voxels(config, per_class=_extra_int(config, "count", 24))
    codes = _ae_encode(model, variables, voxels)

    from shapegan_tpu.render.viewer import MeshRenderer

    viewer = MeshRenderer(size=128, start_thread=False)
    images = []
    for i in range(len(voxels)):
        viewer.model_color = _class_color(labels[i])
        viewer.set_voxels(voxels[i])
        images.append(viewer.get_image(crop=True, output_size=96))
    prefix = "" if "classic" in args else "variational-"
    create_tsne_plot(codes, images, labels, f"plots/{prefix}autoencoder-tsne.png")


def autodecoder_tsne(args, config):
    """Class-colored t-SNE of the autodecoder latent table (reference
    'autodecoder_tsne', create_plot.py:237-248)."""
    from shapegan_tpu import checkpoints
    from shapegan_tpu.models import LATENT_CODES_FILENAME

    codes = checkpoints.load_array(LATENT_CODES_FILENAME, base=config.model_dir)
    count = min(_extra_int(config, "count", 1000), len(codes))
    indices = np.random.default_rng(0).choice(len(codes), count, replace=False)
    create_tsne_plot(codes[indices], None, None, "plots/deepsdf-tsne.png")


def gan_tsne(args, config):
    """t-SNE of GAN latent samples with generated-shape thumbnails (reference
    'gan_tsne', create_plot.py:483-493)."""
    import jax

    wgan = "wgan" in args
    generate = _load_generator_fn(config, wgan)
    count = _extra_int(config, "count", 100)
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (count, LATENT_CODE_SIZE)))
    voxels = generate(z)

    from shapegan_tpu.render.viewer import MeshRenderer

    viewer = MeshRenderer(size=128, start_thread=False)
    images = []
    for i in range(count):
        viewer.set_voxels(voxels[i])
        images.append(viewer.get_image(crop=True, output_size=96))
    filename = "plots/wgan-images.png" if wgan else "plots/gan-images.png"
    create_tsne_plot(z, images, None, filename)


def color_test(args, config):
    """One rendered shape per class in its class color (reference
    'color-test', create_plot.py:144-160)."""
    voxels, labels, names = _labeled_voxels(config, per_class=1)
    plot = ImageGrid(len(names))
    for label in range(len(names)):
        index = int(np.nonzero(labels == label)[0][0])
        plot.set_voxels(voxels[index], label, 0, color=_class_color(label))
    plot.save("plots/color-test.png")


# ======================================================== AE/VAE figures


def autoencoder_results(args, config):
    plt = _mpl()
    model, variables = _load_autoencoder(config, is_variational="classic" not in args)
    n = int(args[0]) if args and args[0].isdigit() else 6
    voxels = _dataset_voxels(config, n)
    codes = _ae_encode(model, variables, voxels)
    recon = _ae_decode(model, variables, codes)
    fig, axes = plt.subplots(2, len(voxels), figsize=(2.2 * len(voxels), 4.8))
    for col in range(len(voxels)):
        axes[0, col].imshow(_voxel_image(voxels[col]), cmap="gray", origin="lower")
        axes[1, col].imshow(_voxel_image(recon[col]), cmap="gray", origin="lower")
        axes[0, col].axis("off")
        axes[1, col].axis("off")
    axes[0, 0].set_title("input")
    axes[1, 0].set_title("reconstruction")
    fig.savefig("plots/autoencoder_results.png", dpi=120, bbox_inches="tight")
    print("plots/autoencoder_results.png")


def autoencoder_classes(args, config):
    """One VAE reconstruction per class, class-colored inputs (reference
    'autoencoder-classes', create_plot.py:162-187)."""
    model, variables = _load_autoencoder(config, is_variational=True)
    voxels, labels, names = _labeled_voxels(config, per_class=1)
    picks = [int(np.nonzero(labels == label)[0][0]) for label in range(len(names))]
    inputs = voxels[picks]
    recon = _ae_decode(model, variables, _ae_encode(model, variables, inputs))
    plot = ImageGrid(len(picks), 2)
    for i in range(len(picks)):
        plot.set_voxels(inputs[i], i, 0, color=_class_color(i))
        plot.set_voxels(recon[i], i, 1)
    plot.save("plots/vae-reconstruction-classes.png")


def autoencoder_examples(args, config):
    """Rows of input render | latent bar chart | reconstruction render
    (reference 'autoencoder_examples', create_plot.py:303-334)."""
    plt = _mpl()
    model, variables = _load_autoencoder(config, is_variational="classic" not in args)
    n = _extra_int(config, "count", 8)
    voxels = _dataset_voxels(config, n)
    codes = _ae_encode(model, variables, voxels)
    recon = _ae_decode(model, variables, codes)

    from shapegan_tpu.render.viewer import MeshRenderer

    viewer = MeshRenderer(size=256, start_thread=False)
    fig, axs = plt.subplots(len(voxels), 3, figsize=(10, 3.2 * len(voxels)))
    axs = np.atleast_2d(axs)
    for i in range(len(voxels)):
        viewer.set_voxels(voxels[i])
        axs[i, 0].imshow(viewer.get_image(crop=True))
        axs[i, 0].axis("off")
        axs[i, 1].bar(range(codes.shape[1]), codes[i])
        axs[i, 1].set_ylim((-3, 3))
        viewer.set_voxels(recon[i])
        axs[i, 2].imshow(viewer.get_image(crop=True))
        axs[i, 2].axis("off")
    fig.savefig("plots/autoencoder-examples.png", dpi=120, bbox_inches="tight")
    print("plots/autoencoder-examples.png")


def autoencoder_examples_2(args, config):
    """Input | AE reconstruction | VAE reconstruction grid (reference
    'autoencoder_examples_2', create_plot.py:336-359)."""
    ae_model, ae_vars = _load_autoencoder(config, is_variational=False)
    vae_model, vae_vars = _load_autoencoder(config, is_variational=True)
    n = _extra_int(config, "count", 5)
    voxels = _dataset_voxels(config, n)
    recon_ae = _ae_decode(ae_model, ae_vars, _ae_encode(ae_model, ae_vars, voxels))
    recon_vae = _ae_decode(vae_model, vae_vars, _ae_encode(vae_model, vae_vars, voxels))
    plot = ImageGrid(len(voxels), 3)
    for i in range(len(voxels)):
        plot.set_voxels(voxels[i], i, 0)
        plot.set_voxels(recon_ae[i], i, 1)
        plot.set_voxels(recon_vae[i], i, 2)
    plot.save("plots/ae-vae-examples.png")


def autoencoder_generate(args, config):
    """AE/VAE random samples next to their cosine-nearest dataset codes
    (reference 'autoencoder_generate', create_plot.py:361-413)."""
    from sklearn.metrics import pairwise_distances

    samples = _extra_int(config, "count", 5)
    ae_model, ae_vars = _load_autoencoder(config, is_variational=False)
    vae_model, vae_vars = _load_autoencoder(config, is_variational=True)
    voxels = _dataset_voxels(config, _extra_int(config, "pool", 128))
    rng = np.random.default_rng(0)

    plot = ImageGrid(samples, 4)
    for row, (model, variables) in enumerate(((ae_model, ae_vars), (vae_model, vae_vars))):
        codes = _ae_encode(model, variables, voxels)
        flat = codes.reshape(-1)
        drawn = rng.normal(flat.mean(), flat.std(), (samples, LATENT_CODE_SIZE)).astype(np.float32)
        generated = _ae_decode(model, variables, drawn)
        nearest = np.argmin(pairwise_distances(codes, drawn, metric="cosine"), axis=0)
        references = _ae_decode(model, variables, codes[nearest])
        for i in range(samples):
            plot.set_voxels(generated[i], i, row * 2)
            plot.set_voxels(references[i], i, row * 2 + 1)
    plot.save("plots/ae-vae-samples.png")


def autoencoder_interpolation(args, config):
    """AE + VAE latent interpolation between two dataset shapes (reference
    'autoencoder_interpolation', create_plot.py:415-452)."""
    steps = _extra_int(config, "steps", 6)
    ae_model, ae_vars = _load_autoencoder(config, is_variational=False)
    vae_model, vae_vars = _load_autoencoder(config, is_variational=True)
    voxels = _dataset_voxels(config, 2)
    plot = ImageGrid(steps, 2)
    for row, (model, variables) in enumerate(((ae_model, ae_vars), (vae_model, vae_vars))):
        codes = _ae_encode(model, variables, voxels)
        recon = _ae_decode(model, variables, _interpolate(codes[0], codes[1], steps))
        for i in range(steps):
            plot.set_voxels(recon[i], i, row)
    plot.save("plots/ae-vae-interpolation.png")


def autoencoder_interpolation_2(args, config):
    """VAE-only interpolation row (reference 'autoencoder_interpolation_2',
    create_plot.py:454-481)."""
    steps = _extra_int(config, "steps", 6)
    model, variables = _load_autoencoder(config, is_variational=True)
    voxels = _dataset_voxels(config, 2)
    codes = _ae_encode(model, variables, voxels)
    recon = _ae_decode(model, variables, _interpolate(codes[0], codes[1], steps))
    plot = ImageGrid(steps)
    for i in range(steps):
        plot.set_voxels(recon[i], i)
    plot.save("plots/vae-interpolation.png")


# ============================================================ GAN figures


def gan_results(args, config):
    plt = _mpl()
    import jax

    n = int(args[0]) if args and args[0].isdigit() else 8
    generate = _load_generator_fn(config, wgan="wgan" in args)
    z = jax.random.normal(jax.random.PRNGKey(1), (n, LATENT_CODE_SIZE))
    voxels = generate(z)
    fig, axes = plt.subplots(1, n, figsize=(2.2 * n, 2.5))
    for i, ax in enumerate(np.atleast_1d(axes)):
        ax.imshow(_voxel_image(voxels[i]), cmap="gray", origin="lower")
        ax.axis("off")
    fig.savefig("plots/gan_results.png", dpi=120, bbox_inches="tight")
    print("plots/gan_results.png")


def gan_examples(args, config):
    """Rendered sample grid (reference 'gan_examples', create_plot.py:495-507)."""
    import jax

    wgan = "wgan" in args
    count = _extra_int(config, "count", 5)
    generate = _load_generator_fn(config, wgan)
    z = jax.random.normal(jax.random.PRNGKey(0), (count, LATENT_CODE_SIZE))
    voxels = generate(z)
    plot = ImageGrid(count)
    for i in range(count):
        plot.set_voxels(voxels[i], i)
    plot.save("plots/wgan-examples.png" if wgan else "plots/gan-examples.png")


def gan_interpolation(args, config):
    """Latent interpolation through the voxel GAN (reference
    'gan_interpolation', create_plot.py:509-531)."""
    import jax

    wgan = "wgan" in args
    steps = _extra_int(config, "steps", 6)
    generate = _load_generator_fn(config, wgan)
    ends = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, LATENT_CODE_SIZE)))
    voxels = generate(_interpolate(ends[0], ends[1], steps).astype(np.float32))
    plot = ImageGrid(steps)
    for i in range(steps):
        plot.set_voxels(voxels[i], i)
    plot.save("plots/wgan-interpolation.png" if wgan else "plots/gan-interpolation.png")


def wgan_results(args, config):
    """Grid of saved WGAN screenshots (reference 'wgan-results',
    create_plot.py:684-695)."""
    from PIL import Image

    from shapegan_tpu.util import crop_image

    count = _extra_int(config, "count", 5)
    plot = ImageGrid(count, create_viewer=False)
    for i in range(count):
        image = np.asarray(Image.open(f"screenshots/wgan/{i}.png"))
        plot.set_image(crop_image(image, background=255), i)
    plot.save("plots/wgan-results.png")


# ===================================================== implicit-SDF figures


def sdf_slices(args, config):
    plt = _mpl()
    n = int(args[0]) if args and args[0].isdigit() else 6
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


def sdf_slice(args, config):
    """Red/green signed-distance cross-section of a mesh, computed with the
    framework's own mesh→SDF oracle (reference 'sdf_slice',
    create_plot.py:612-648, which delegates to the mesh_to_sdf package)."""
    from PIL import Image

    from shapegan_tpu.data.mesh_io import load_mesh
    from shapegan_tpu.data.mesh_to_sdf import MeshSDF

    if args:
        mesh = load_mesh(args[0])
    else:
        from shapegan_tpu.examples import example_chair_path

        mesh = load_mesh(example_chair_path())
    mesh = mesh.scaled_to_unit_sphere()

    resolution = _extra_int(config, "res", 640)
    clip = 0.1
    ys = np.linspace(1, -1, resolution)
    zs = np.linspace(-1, 1, resolution)
    grid_y, grid_z = np.meshgrid(ys, zs, indexing="ij")
    points = np.stack(
        [np.zeros_like(grid_y).reshape(-1), grid_y.reshape(-1), grid_z.reshape(-1)], axis=1
    ).astype(np.float32)
    sdf = MeshSDF(mesh).query(points).reshape(resolution, resolution)
    sdf = np.clip(sdf, -clip, clip) / clip

    image = np.ones((resolution, resolution, 3))
    positive, negative = sdf > 0, sdf < 0
    image[:, :, :2][positive] = (1.0 - sdf[positive])[:, np.newaxis]
    image[:, :, 1:][negative] = (1.0 + sdf[negative])[:, np.newaxis]
    image[np.abs(sdf) < 0.03] = 0
    Image.fromarray(np.uint8(image * 255)).save("plots/sdf_example.png")
    print("plots/sdf_example.png")


def model_images(args, config):
    """Render dataset meshes into screenshots/sdf_meshes/<i>.png (reference
    'model_images', create_plot.py:660-682). Args: mesh files or directories
    to scan for .obj/.stl; defaults to <data_dir>/meshes, else the example
    chair."""
    import glob as globlib

    from PIL import Image

    from shapegan_tpu.data.mesh_io import load_mesh
    from shapegan_tpu.render.viewer import MeshRenderer

    files = []
    sources = args or [os.path.join(config.data_dir, "meshes")]
    for source in sources:
        if os.path.isdir(source):
            for ext in ("obj", "stl"):
                files.extend(sorted(globlib.glob(os.path.join(source, f"**/*.{ext}"),
                                                 recursive=True)))
        elif os.path.isfile(source):
            files.append(source)
    if not files:
        from shapegan_tpu.examples import example_chair_path

        files = [example_chair_path()]

    ensure_directory("screenshots/sdf_meshes")
    viewer = MeshRenderer(size=_extra_int(config, "res", 400), start_thread=False)
    for index, filename in enumerate(files):
        out = f"screenshots/sdf_meshes/{index}.png"
        if os.path.isfile(out):
            continue
        viewer.set_mesh(load_mesh(filename), center_and_scale=True)
        Image.fromarray(viewer.get_image()).save(out)
        print(out)


def sdf_net_reconstruction(args, config):
    """Dataset mesh render | autodecoder raymarch reconstruction pairs
    (reference 'sdf_net_reconstruction', create_plot.py:697-720; the mesh
    images come from the 'model_images' recipe when present)."""
    from shapegan_tpu.render.raymarching import render_image_for_index
    from shapegan_tpu.util import crop_image

    net, params, codes = _load_sdf_net(config)
    count = min(_extra_int(config, "count", 5), len(codes))
    res = _extra_int(config, "res", 400)
    indices = np.random.default_rng(0).choice(len(codes), count, replace=False)

    have_mesh_images = all(
        os.path.isfile(f"screenshots/sdf_meshes/{i}.png") for i in indices
    )
    plot = ImageGrid(count, 2 if have_mesh_images else 1, create_viewer=False)
    for column, index in enumerate(indices):
        row = 0
        if have_mesh_images:
            from PIL import Image

            mesh_img = crop_image(np.asarray(Image.open(f"screenshots/sdf_meshes/{index}.png")),
                                  background=255)
            plot.set_image(mesh_img, column, 0)
            row = 1
        image = render_image_for_index(net, params, codes, int(index), crop=True,
                                       resolution=res)
        plot.set_image(np.asarray(image), column, row)
    plot.save("plots/deepsdf-reconstruction.png")


def sdf_net_interpolation(args, config):
    """Raymarched interpolation between two latent-table codes (reference
    'sdf_net_interpolation', create_plot.py:722-744)."""

    net, params, codes = _load_sdf_net(config)
    steps = _extra_int(config, "steps", 6)
    res = _extra_int(config, "res", 400)
    indices = np.random.default_rng(0).choice(len(codes), 2, replace=False)
    interpolated = _interpolate(codes[indices[0]], codes[indices[1]], steps)
    plot = ImageGrid(steps, create_viewer=False)
    for i, image in enumerate(_render_codes(net, params, interpolated,
                                            resolution=res, crop=True,
                                            **_render_opts(config))):
        plot.set_image(image, i)
    plot.save("plots/deepsdf-interpolation.png")


def sdf_net_sample(args, config):
    """Raymarched samples drawn from the latent table's fitted Normal
    (reference 'sdf_net_sample', create_plot.py:746-764)."""

    net, params, codes = _load_sdf_net(config)
    count = _extra_int(config, "count", 5)
    res = _extra_int(config, "res", 400)
    flat = codes.reshape(-1)
    mean, std = float(flat.mean()), float(flat.var() ** 0.5)
    print("mean:", mean, "std:", std)
    drawn = np.random.default_rng(0).normal(mean, std, (count, LATENT_CODE_SIZE)).astype(np.float32)
    plot = ImageGrid(count, create_viewer=False)
    for i, image in enumerate(_render_codes(net, params, drawn, resolution=res,
                                            crop=True, **_render_opts(config))):
        plot.set_image(image, i)
    plot.save("plots/deepsdf-samples.png")


# ========================================================= hybrid figures

# The reference renders hybrid-GAN outputs with an enlarged trace sphere and
# a small SDF offset (its G is trained on raw, un-rescaled SDF volumes):
# radius=1.6, sdf_offset=-0.045, vertical_cutoff=1 (create_plot.py:778,793).
_HYBRID_RENDER = dict(radius=1.6, sdf_offset=-0.045, vertical_cutoff=1, crop=True)


def _render_opts(config):
    """Raymarch quality knobs from extras (reference defaults)."""
    return dict(
        iterations=_extra_int(config, "iterations", 1000),
        ssaa=_extra_int(config, "ssaa", 2),
    )


def _render_codes(net, params, codes, **render_kw):
    """Raymarch a list of codes into uint8 arrays, frame-parallel across
    devices when more than one is available (render_image_sequence)."""
    from shapegan_tpu.render.raymarching import render_image_sequence

    return [np.asarray(img)
            for img in render_image_sequence(net, params, list(codes), **render_kw)]


def hybrid_gan(args, config):
    """Raymarched samples from the hybrid GAN's implicit generator (reference
    'hybrid_gan', create_plot.py:766-780)."""

    net, params, _ = _load_sdf_net(config, filename="hybrid_gan_generator")
    count = _extra_int(config, "count", 5)
    res = _extra_int(config, "res", 400)
    codes = np.random.default_rng(0).normal(size=(count, LATENT_CODE_SIZE)).astype(np.float32)
    plot = ImageGrid(count, create_viewer=False)
    for i, image in enumerate(_render_codes(net, params, codes, resolution=res,
                                            **_HYBRID_RENDER,
                                            **_render_opts(config))):
        plot.set_image(image, i)
    plot.save("plots/hybrid-gan-samples.png")


def hybrid_gan_interpolation(args, config):
    """Render candidate shapes, then interpolate between two chosen ones
    (reference 'hybrid_gan_interpolation', create_plot.py:783-811; start/end
    indices come from args instead of interactive input)."""

    net, params, _ = _load_sdf_net(config, filename="hybrid_gan_generator")
    options = _extra_int(config, "options", 10)
    steps = _extra_int(config, "steps", 6)
    res = _extra_int(config, "res", 400)
    codes = np.random.default_rng(0).normal(size=(options, LATENT_CODE_SIZE)).astype(np.float32)

    numeric = [a for a in args if a.isdigit()]
    if len(numeric) >= 2:
        start, end = int(numeric[0]), int(numeric[1])
    else:
        from PIL import Image

        options_images = _render_codes(net, params, codes,
                                       resolution=min(res, 200),
                                       **_HYBRID_RENDER, **_render_opts(config))
        for i, image in enumerate(options_images):
            Image.fromarray(image, "RGB").save(f"plots/option-{i}.png")
            print(f"plots/option-{i}.png")
        start, end = 0, 1
        print(f"no start/end indices given — using {start} and {end} "
              f"(pass e.g. `hybrid_gan_interpolation 3 7`)")

    interpolated = _interpolate(codes[start], codes[end], steps)
    plot = ImageGrid(steps, create_viewer=False)
    for i, image in enumerate(_render_codes(net, params, interpolated,
                                            resolution=res, **_HYBRID_RENDER,
                                            **_render_opts(config))):
        plot.set_image(image, i)
    plot.save("plots/hybrid-gan-interpolation.png")


def hybrid_gan_upscaling(args, config):
    """The paper's resolution-independence figure: one latent rendered as a
    32³ grid, that grid naively zoomed ×4, a real 128³ evaluation, and the
    raymarch (reference 'hybrid_gan_upscaling', create_plot.py:813-836)."""
    import scipy.ndimage

    from shapegan_tpu.render.raymarching import render_image

    net, params, _ = _load_sdf_net(config, filename="hybrid_gan_generator")
    res = _extra_int(config, "res", 400)
    high_res = _extra_int(config, "voxel_res", 128)
    code = np.random.default_rng(0).normal(size=(LATENT_CODE_SIZE,)).astype(np.float32)

    plot = ImageGrid(4)
    voxels_32 = np.asarray(net.get_voxels(params, code, voxel_resolution=32, sphere_only=False))
    plot.set_voxels(voxels_32, 0)
    trimmed = voxels_32[1:-2, 1:-2, 1:-2]
    upscaled = scipy.ndimage.zoom(trimmed, 4)
    upscaled = np.pad(upscaled, 1, mode="constant", constant_values=1)
    plot.set_voxels(upscaled, 1)
    voxels_high = np.asarray(
        net.get_voxels(params, code, voxel_resolution=high_res, sphere_only=False)
    )
    plot.set_voxels(voxels_high, 2)
    plot.set_image(np.asarray(render_image(net, params, code, resolution=res,
                                           **_HYBRID_RENDER,
                                           **_render_opts(config))), 3)
    plot.save("plots/hybrid-gan-upscaling.png")


# ===================================================== checkpoint evolution


def checkpoint_evolution(args, config):
    plt = _mpl()
    import glob as globlib

    paths = sorted(globlib.glob(os.path.join(config.model_dir, "checkpoints", "sdf_net-epoch-*.npz")))
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


def _spread_epochs(epochs, count):
    if len(epochs) <= count:
        return epochs
    if count == 1:
        return [epochs[-1]]
    return [epochs[i * (len(epochs) - 1) // (count - 1)] for i in range(count)]


def vae_checkpoints(args, config):
    """One dataset shape reconstructed by successive VAE epoch snapshots
    (reference 'vae_checkpoints', create_plot.py:853-880)."""
    import glob as globlib
    import jax

    from shapegan_tpu import checkpoints
    from shapegan_tpu.models.autoencoder import Autoencoder
    from shapegan_tpu.train.autoencoder import create_state

    model = Autoencoder(is_variational=True)
    name = model.checkpoint_name
    paths = sorted(globlib.glob(
        os.path.join(config.model_dir, "checkpoints", f"{name}-epoch-*.npz")))
    epochs = [int(p.split("-epoch-")[1].split(".")[0]) for p in paths]
    if not epochs:
        raise SystemExit(f"no {name} epoch snapshots found")
    epochs = _spread_epochs(epochs, _extra_int(config, "count", 5))

    voxels = _dataset_voxels(config, 1)
    state = create_state(model, jax.random.PRNGKey(0))
    plot = ImageGrid(len(epochs))
    for i, epoch in enumerate(epochs):
        restored = checkpoints.load(
            {"params": state.params, "batch_stats": state.batch_stats},
            name, epoch=epoch, base=config.model_dir,
        )
        variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}
        recon = _ae_decode(model, variables, _ae_encode(model, variables, voxels))
        plot.set_voxels(recon[0], i)
    plot.save("plots/vae-checkpoints.png")


def sdf_checkpoints(args, config):
    """One latent code raymarched through successive autodecoder snapshots
    (reference 'sdf_checkpoints', create_plot.py:882-910)."""
    import glob as globlib

    from shapegan_tpu.render.raymarching import render_image

    paths = sorted(globlib.glob(
        os.path.join(config.model_dir, "checkpoints", "sdf_net-epoch-*.npz")))
    epochs = [int(p.split("-epoch-")[1].split(".")[0]) for p in paths]
    if not epochs:
        raise SystemExit("no sdf_net epoch snapshots found")
    epochs = _spread_epochs(epochs, _extra_int(config, "count", 5))
    res = _extra_int(config, "res", 400)
    index = _extra_int(config, "index", 0)

    plot = ImageGrid(len(epochs), create_viewer=False)
    for i, epoch in enumerate(epochs):
        net, params, codes = _load_sdf_net(config, epoch=epoch)
        plot.set_image(np.asarray(render_image(net, params, codes[index],
                                               resolution=res, crop=True,
                                               **_render_opts(config))), i)
    plot.save("plots/deepsdf-checkpoints.png")


# ================================================== screenshots & exports


def shapenet_errors(args, config):
    """Grid of data-preparation failure screenshots (reference
    'shapenet-errors', create_plot.py:838-849)."""
    from PIL import Image

    from shapegan_tpu.util import crop_image

    count = _extra_int(config, "count", 6)
    plot = ImageGrid(count, create_viewer=False)
    for i in range(count):
        image = np.asarray(Image.open(f"screenshots/errors/error-{i + 1}.png"))
        plot.set_image(crop_image(image, background=255), i)
    plot.save("plots/errors.png")


def raymarch_examples(args, config):
    from shapegan_tpu.render.raymarching import render_image_for_index

    n = int(args[0]) if args and args[0].isdigit() else 4
    net, params, codes = _load_sdf_net(config)
    for i in range(min(n, len(codes))):
        render_image_for_index(net, params, codes, i, resolution=_extra_int(config, "res", 400))
        print(f"rendered example {i}")


def export_stl(args, config):
    n = int(args[0]) if args and args[0].isdigit() else 4
    net, params, codes = _load_sdf_net(config)
    ensure_directory("plots/stl")
    rng = np.random.default_rng(0)
    for i in range(n):
        mesh = net.get_mesh(params, codes[rng.integers(len(codes))], voxel_resolution=64)
        if mesh is not None:
            path = f"plots/stl/shape_{i}.stl"
            mesh.weld().save(path)
            print(path)


def deepsdf_interpolation_stl(args, config):
    """High-resolution meshes along a latent interpolation, exported as STL
    (reference 'deepsdf-interpolation-stl', create_plot.py:914-933)."""
    net, params, codes = _load_sdf_net(config)
    steps = _extra_int(config, "steps", 5)
    voxel_res = _extra_int(config, "voxel_res", 256)
    indices = np.random.default_rng(0).choice(len(codes), 2, replace=False)
    interpolated = _interpolate(codes[indices[0]], codes[indices[1]], steps)
    for i in range(steps):
        mesh = net.get_mesh(params, interpolated[i], voxel_resolution=voxel_res,
                            sphere_only=False)
        if mesh is not None:
            path = f"plots/mesh-{i}.stl"
            mesh.weld().save(path)
            print(path)


RECIPES = {
    "training_curves": training_curves,
    "autoencoder_training": autoencoder_training,
    "wgan_training": wgan_training,
    "sdf_training": sdf_training,
    "latent_distribution": latent_distribution,
    "autoencoder_hist": autoencoder_hist,
    "autodecoder_hist": autodecoder_hist,
    "tsne": tsne,
    "autoencoder_tsne": autoencoder_tsne,
    "autodecoder_tsne": autodecoder_tsne,
    "gan_tsne": gan_tsne,
    "color_test": color_test,
    "autoencoder_results": autoencoder_results,
    "autoencoder_classes": autoencoder_classes,
    "autoencoder_examples": autoencoder_examples,
    "autoencoder_examples_2": autoencoder_examples_2,
    "autoencoder_generate": autoencoder_generate,
    "autoencoder_interpolation": autoencoder_interpolation,
    "autoencoder_interpolation_2": autoencoder_interpolation_2,
    "gan_results": gan_results,
    "gan_examples": gan_examples,
    "gan_interpolation": gan_interpolation,
    "wgan_results": wgan_results,
    "sdf_slices": sdf_slices,
    "sdf_slice": sdf_slice,
    "voxel_occupancy": voxel_occupancy,
    "model_images": model_images,
    "sdf_net_reconstruction": sdf_net_reconstruction,
    "sdf_net_interpolation": sdf_net_interpolation,
    "sdf_net_sample": sdf_net_sample,
    "hybrid_gan": hybrid_gan,
    "hybrid_gan_interpolation": hybrid_gan_interpolation,
    "hybrid_gan_upscaling": hybrid_gan_upscaling,
    "checkpoint_evolution": checkpoint_evolution,
    "vae_checkpoints": vae_checkpoints,
    "sdf_checkpoints": sdf_checkpoints,
    "shapenet_errors": shapenet_errors,
    "raymarch_examples": raymarch_examples,
    "export_stl": export_stl,
    "deepsdf_interpolation_stl": deepsdf_interpolation_stl,
}

# The reference's hyphenated argv names (create_plot.py:144,162,189,684,838,914).
ALIASES = {
    "color-test": "color_test",
    "autoencoder-classes": "autoencoder_classes",
    "autodecoder-classes": "autoencoder_classes",
    "autoencoder": "autoencoder_tsne",
    "wgan-results": "wgan_results",
    "shapenet-errors": "shapenet_errors",
    "deepsdf-interpolation-stl": "deepsdf_interpolation_stl",
}


def main():
    from shapegan_tpu.core.config import parse_cli

    recipe = sys.argv[1] if len(sys.argv) > 1 else None
    recipe = ALIASES.get(recipe, recipe)
    if recipe not in RECIPES:
        print(__doc__)
        print("available recipes:", ", ".join(RECIPES))
        return
    args = [a for a in sys.argv[2:] if "=" not in a]
    config = parse_cli(sys.argv[2:])
    RECIPES[recipe](args, config)


if __name__ == "__main__":
    main()
