"""Figure-factory recipe smoke tests (VERDICT.md round-1 item 5).

Every recipe from the reference's ~30-recipe create_plot.py
(/root/reference/create_plot.py:144-933) runs end-to-end on fabricated
checkpoints/logs/screenshots and produces its file under plots/ — headless,
tiny render settings.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import create_plot  # noqa: E402

TINY = {"res": "16", "iterations": "4", "ssaa": "1", "count": "2", "steps": "2",
        "voxel_res": "24", "pool": "6", "options": "2"}


@pytest.fixture(scope="module")
def plot_env(tmp_path_factory):
    """One directory with every artifact the recipes consume."""
    import jax

    from shapegan_tpu import checkpoints
    from shapegan_tpu.models import LATENT_CODES_FILENAME
    from shapegan_tpu.models.autoencoder import Autoencoder
    from shapegan_tpu.models.sdf_net import SDFNet
    from shapegan_tpu.train.autoencoder import create_state
    from shapegan_tpu.train.gan import create_states

    root = tmp_path_factory.mktemp("plot_env")
    cwd = os.getcwd()
    os.chdir(root)
    try:
        os.makedirs("plots", exist_ok=True)
        os.makedirs("screenshots/wgan", exist_ok=True)
        os.makedirs("screenshots/errors", exist_ok=True)

        # --- autoencoder / VAE checkpoints (+ VAE epoch snapshots)
        for variational in (False, True):
            model = Autoencoder(is_variational=variational)
            state = create_state(model, jax.random.PRNGKey(0))
            payload = {"params": state.params, "batch_stats": state.batch_stats}
            checkpoints.save(payload, model.checkpoint_name, base="models")
            if variational:
                for epoch in (0, 1):
                    checkpoints.save(payload, model.checkpoint_name, epoch=epoch, base="models")

        # --- GAN / WGAN generators
        _, _, g_state, _ = create_states(jax.random.PRNGKey(1))
        gan_payload = {"params": g_state.params, "batch_stats": g_state.batch_stats}
        checkpoints.save(gan_payload, "generator", base="models")
        checkpoints.save(gan_payload, "wgan-generator", base="models")

        # --- autodecoder + hybrid generator (+ epoch snapshots)
        net = SDFNet()
        params = dict(net.init(jax.random.PRNGKey(2)))
        # Shift the output bias so the random net's SDF crosses zero inside
        # the unit sphere (gives the mesh/STL recipes a non-empty surface).
        params["b8"] = params["b8"] - 0.066
        checkpoints.save(params, "sdf_net", base="models")
        checkpoints.save(params, "hybrid_gan_generator", base="models")
        codes = np.random.default_rng(0).normal(0, 0.02, (6, 128)).astype(np.float32)
        checkpoints.save_array(codes, LATENT_CODES_FILENAME, base="models")
        for epoch in (0, 1):
            checkpoints.save(params, "sdf_net", epoch=epoch, base="models")
            checkpoints.save_array(codes, LATENT_CODES_FILENAME, epoch=epoch, base="models")

        # --- CSV logs in each trainer's schema
        with open("plots/wgan_training.csv", "w") as f:
            for epoch in range(5):
                f.write(f"{epoch} 1.0 {-epoch:.3f} {epoch:.3f}\n")
        with open("plots/sdf_net_training.csv", "w") as f:
            for epoch in range(5):
                f.write(f"{epoch} 1.0 {1.0 / (epoch + 1):.4f} 0.02\n")
        for name in ("autoencoder_training.csv", "variational_autoencoder_training.csv"):
            with open(f"plots/{name}", "w") as f:
                for epoch in range(5):
                    f.write(f"{epoch} 1.0 {2.0 / (epoch + 1):.4f} 0.1 {0.5 / (epoch + 1):.4f}\n")

        # --- screenshot fixtures
        from PIL import Image

        rng = np.random.default_rng(3)
        for i in range(2):
            img = np.full((32, 32, 3), 255, np.uint8)
            img[8:24, 8:24] = rng.integers(0, 200, (16, 16, 3), dtype=np.uint8)
            Image.fromarray(img).save(f"screenshots/wgan/{i}.png")
            Image.fromarray(img).save(f"screenshots/errors/error-{i + 1}.png")

        yield root
    finally:
        os.chdir(cwd)


def _config(**extras):
    from shapegan_tpu.core.config import TrainConfig

    merged = dict(TINY)
    merged.update({k: str(v) for k, v in extras.items()})
    return TrainConfig(synthetic=6, model_dir="models", plot_dir="plots", extras=merged)


@pytest.fixture(autouse=True)
def _in_env(plot_env):
    os.chdir(plot_env)
    yield


# --------------------------------------------------------------- curves


def test_curve_recipes():
    config = _config()
    create_plot.wgan_training([], config)
    assert os.path.exists("plots/wgan-training-critic.png")
    create_plot.sdf_training([], config)
    assert os.path.exists("plots/deepsdf-training-loss.png")
    create_plot.autoencoder_training([], config)
    assert os.path.exists("plots/autoencoder-training.png")
    assert os.path.exists("plots/variational-autoencoder-training.png")
    create_plot.autoencoder_training(["latex"], config)
    assert os.path.exists("plots/vae-training-loss.png")
    assert os.path.exists("plots/vae-training-error.png")


# ------------------------------------------------------------ histograms


def test_histogram_recipes():
    config = _config(count=6)
    create_plot.autoencoder_hist([], config)
    assert os.path.exists("plots/variational-autoencoder-histogram.png")
    assert os.path.exists("plots/variational-autoencoder-histogram-combined.png")
    create_plot.autoencoder_hist(["classic"], config)
    assert os.path.exists("plots/autoencoder-histogram.png")
    create_plot.autodecoder_hist([], config)
    assert os.path.exists("plots/autodecoder-histogram.png")
    create_plot.voxel_occupancy([], config)
    assert os.path.exists("plots/voxel-occupancy-histogram.png")


# ----------------------------------------------------------------- t-SNE


@pytest.mark.slow
def test_tsne_recipes():
    config = _config(count=3)
    create_plot.autoencoder_tsne(["classic"], config)
    assert os.path.exists("plots/autoencoder-tsne.png")
    create_plot.autodecoder_tsne([], config)
    assert os.path.exists("plots/deepsdf-tsne.png")
    create_plot.gan_tsne([], config)
    assert os.path.exists("plots/gan-images.png")


def test_color_test_recipe():
    create_plot.color_test([], _config())
    assert os.path.exists("plots/color-test.png")


# --------------------------------------------------------------- AE/VAE


@pytest.mark.slow
def test_autoencoder_grid_recipes():
    config = _config(count=2)
    create_plot.autoencoder_classes([], config)
    assert os.path.exists("plots/vae-reconstruction-classes.png")
    create_plot.autoencoder_examples([], config)
    assert os.path.exists("plots/autoencoder-examples.png")
    create_plot.autoencoder_examples_2([], config)
    assert os.path.exists("plots/ae-vae-examples.png")
    create_plot.autoencoder_generate([], config)
    assert os.path.exists("plots/ae-vae-samples.png")
    create_plot.autoencoder_interpolation([], config)
    assert os.path.exists("plots/ae-vae-interpolation.png")
    create_plot.autoencoder_interpolation_2([], config)
    assert os.path.exists("plots/vae-interpolation.png")


# ------------------------------------------------------------------- GAN


@pytest.mark.slow
def test_gan_grid_recipes():
    config = _config(count=2)
    create_plot.gan_examples([], config)
    assert os.path.exists("plots/gan-examples.png")
    create_plot.gan_interpolation(["wgan"], config)
    assert os.path.exists("plots/wgan-interpolation.png")
    create_plot.wgan_results([], config)
    assert os.path.exists("plots/wgan-results.png")


# ---------------------------------------------------------- implicit SDF


def test_sdf_slice_recipe(tmp_path):
    from shapegan_tpu.data.mesh_io import save_obj
    from shapegan_tpu.data.synthetic import box_sdf
    from shapegan_tpu.ops.coords import voxel_coordinate_grid
    from shapegan_tpu.ops.mesh_extract import extract_mesh
    from shapegan_tpu.data.mesh_io import TriangleMesh

    sdf = box_sdf(voxel_coordinate_grid(16)).astype(np.float32)
    vertices, faces = extract_mesh(sdf, spacing=2.0 / 15, origin=(-1, -1, -1))
    mesh_path = str(tmp_path / "box.obj")
    save_obj(TriangleMesh(vertices, faces), mesh_path)

    create_plot.sdf_slice([mesh_path], _config(res=64))
    assert os.path.exists("plots/sdf_example.png")


def test_model_images_and_reconstruction(tmp_path):
    from shapegan_tpu.data.mesh_io import TriangleMesh, save_obj
    from shapegan_tpu.data.synthetic import box_sdf
    from shapegan_tpu.ops.coords import voxel_coordinate_grid
    from shapegan_tpu.ops.mesh_extract import extract_mesh

    sdf = box_sdf(voxel_coordinate_grid(12)).astype(np.float32)
    vertices, faces = extract_mesh(sdf, spacing=2.0 / 11, origin=(-1, -1, -1))
    mesh_path = str(tmp_path / "shape.obj")
    save_obj(TriangleMesh(vertices, faces), mesh_path)

    create_plot.model_images([mesh_path], _config(res=64))
    assert os.path.exists("screenshots/sdf_meshes/0.png")

    create_plot.sdf_net_reconstruction([], _config(count=2))
    assert os.path.exists("plots/deepsdf-reconstruction.png")


def test_sdf_net_render_recipes():
    config = _config(count=2, steps=2)
    create_plot.sdf_net_interpolation([], config)
    assert os.path.exists("plots/deepsdf-interpolation.png")
    create_plot.sdf_net_sample([], config)
    assert os.path.exists("plots/deepsdf-samples.png")


# ----------------------------------------------------------------- hybrid


def test_hybrid_gan_recipes():
    config = _config(count=2, steps=2, options=2, voxel_res=24)
    create_plot.hybrid_gan([], config)
    assert os.path.exists("plots/hybrid-gan-samples.png")
    create_plot.hybrid_gan_interpolation(["0", "1"], config)
    assert os.path.exists("plots/hybrid-gan-interpolation.png")
    create_plot.hybrid_gan_upscaling([], config)
    assert os.path.exists("plots/hybrid-gan-upscaling.png")


# ------------------------------------------------------------ checkpoints


def test_checkpoint_recipes():
    config = _config(count=2)
    create_plot.vae_checkpoints([], config)
    assert os.path.exists("plots/vae-checkpoints.png")
    create_plot.sdf_checkpoints([], config)
    assert os.path.exists("plots/deepsdf-checkpoints.png")


# ------------------------------------------------------------- misc grids


def test_screenshot_and_stl_recipes():
    config = _config(count=2, steps=2, voxel_res=16)
    create_plot.shapenet_errors([], config)
    assert os.path.exists("plots/errors.png")
    create_plot.deepsdf_interpolation_stl([], config)
    assert os.path.exists("plots/mesh-0.stl")


def test_recipe_aliases_cover_reference_names():
    for alias, target in create_plot.ALIASES.items():
        assert target in create_plot.RECIPES, alias
    # every documented reference recipe family is present
    for name in (
        "color_test", "autoencoder_classes", "autoencoder_tsne", "autodecoder_tsne",
        "autoencoder_hist", "autodecoder_hist", "autoencoder_examples",
        "autoencoder_examples_2", "autoencoder_generate", "autoencoder_interpolation",
        "autoencoder_interpolation_2", "gan_tsne", "gan_examples", "gan_interpolation",
        "wgan_training", "sdf_training", "autoencoder_training", "sdf_slice",
        "voxel_occupancy", "model_images", "wgan_results", "sdf_net_reconstruction",
        "sdf_net_interpolation", "sdf_net_sample", "hybrid_gan",
        "hybrid_gan_interpolation", "hybrid_gan_upscaling", "shapenet_errors",
        "vae_checkpoints", "sdf_checkpoints", "deepsdf_interpolation_stl",
    ):
        assert name in create_plot.RECIPES, name
