"""Model zoo: shapes, parameter structure, and behavioral invariants."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np


from shapegan_tpu.models.autoencoder import Autoencoder
from shapegan_tpu.models.gan import Generator, Discriminator, clip_parameters
from shapegan_tpu.models.progressive_gan import (
    ProgressiveDiscriminator,
    RESOLUTIONS,
    FEATURE_COUNTS,
    from_sdf,
)
from shapegan_tpu.models.classifier import Classifier
from shapegan_tpu.models.point_sdf_net import PointNet, SDFGenerator


@pytest.mark.slow
def test_autoencoder_classic_shapes():
    model = Autoencoder(is_variational=False)
    x = jnp.zeros((2, 32, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 32, 32, 32)


@pytest.mark.slow
def test_autoencoder_vae_shapes_and_reparam():
    model = Autoencoder(is_variational=True)
    x = jnp.zeros((2, 32, 32, 32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x, train=True
    )
    (out, mean, logvar), _ = model.apply(
        variables, x, train=True, rngs={"reparam": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out.shape == (2, 32, 32, 32)
    assert mean.shape == (2, 128) and logvar.shape == (2, 128)
    # eval mode: encode returns the mean deterministically
    z1 = model.apply(variables, x, train=False, method=Autoencoder.encode)
    z2 = model.apply(variables, x, train=False, method=Autoencoder.encode)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_autoencoder_batchnorm_updates_stats():
    model = Autoencoder(is_variational=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 32))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    changed = any(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed


@pytest.mark.slow
def test_generator_output():
    gen = Generator()
    z = jax.random.normal(jax.random.PRNGKey(0), (3, 128))
    variables = gen.init(jax.random.PRNGKey(1), z, train=False)
    out = gen.apply(variables, z, train=False)
    assert out.shape == (3, 32, 32, 32)
    assert float(jnp.abs(out).max()) <= 1.0  # tanh output


def test_discriminator_sigmoid_and_critic():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 32, 32))
    d = Discriminator(use_sigmoid=True)
    variables = d.init(jax.random.PRNGKey(1), x)
    out = d.apply(variables, x)
    assert out.shape == (3,)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()

    critic = Discriminator(use_sigmoid=False)
    out2 = critic.apply(variables, x)
    assert out2.shape == (3,)


def test_clip_parameters():
    params = {"a": jnp.array([-5.0, 0.005, 5.0])}
    clipped = clip_parameters(params, 0.01)
    np.testing.assert_allclose(np.asarray(clipped["a"]), [-0.01, 0.005, 0.01])


@pytest.mark.slow
def test_progressive_discriminator_all_iterations():
    d = ProgressiveDiscriminator()
    # Init at the deepest iteration creates every optional layer's params;
    # the same pytree then serves all growth iterations (warm starts are a
    # no-op structurally — unlike the reference's strict=False reload).
    variables = d.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 64)), iteration=len(RESOLUTIONS) - 1
    )
    for iteration, res in enumerate(RESOLUTIONS):
        x = jax.random.normal(jax.random.PRNGKey(iteration), (2, res, res, res))
        out = d.apply(variables, x, iteration=iteration, fade_in_progress=0.5)
        assert out.shape == (2,)
        assert np.isfinite(np.asarray(out)).all()


def test_progressive_entry_slice_matches_padded_conv():
    """The sliced-kernel entry conv must equal the reference's zero-pad +
    full conv bitwise-up-to-fp32-noise at every iteration and fade level
    (grads too — the GP differentiates through the entry conv)."""
    d_fast = ProgressiveDiscriminator()
    d_ref = ProgressiveDiscriminator(entry_slice=False)
    variables = d_ref.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 64)), iteration=len(RESOLUTIONS) - 1
    )
    for iteration, res in enumerate(RESOLUTIONS):
        x = jax.random.normal(jax.random.PRNGKey(iteration), (2, res, res, res))
        for fade in (1.0, 0.3):
            a = d_ref.apply(variables, x, iteration=iteration, fade_in_progress=fade)
            b = d_fast.apply(variables, x, iteration=iteration, fade_in_progress=fade)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        ga = jax.grad(lambda v: jnp.sum(d_ref.apply(v, x, iteration=iteration)))(variables)
        gb = jax.grad(lambda v: jnp.sum(d_fast.apply(v, x, iteration=iteration)))(variables)
        for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5)


def test_progressive_fade_in_blends():
    d = ProgressiveDiscriminator()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 16))
    variables = d.init(jax.random.PRNGKey(1), x, iteration=1)
    full = d.apply(variables, x, iteration=1, fade_in_progress=1.0)
    faded = d.apply(variables, x, iteration=1, fade_in_progress=0.0)
    assert not np.allclose(np.asarray(full), np.asarray(faded))


def test_from_sdf_channel_padding():
    x = jnp.ones((2, 8, 8, 8))
    out = from_sdf(x, 0)
    assert out.shape == (2, 8, 8, 8, FEATURE_COUNTS[0])
    np.testing.assert_array_equal(np.asarray(out[..., 1:]), 0.0)
    np.testing.assert_array_equal(np.asarray(out[..., 0]), 1.0)


def test_classifier_shapes_and_softmax():
    model = Classifier(label_count=5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 32))
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(out.sum(axis=1)), 1.0, rtol=1e-5)


def test_pointnet_pooling_invariance():
    model = PointNet(out_channels=1)
    pos = jax.random.normal(jax.random.PRNGKey(0), (2, 100, 3))
    dist = jax.random.normal(jax.random.PRNGKey(1), (2, 100, 1))
    variables = model.init(jax.random.PRNGKey(2), pos, dist)
    out = model.apply(variables, pos, dist)
    assert out.shape == (2, 1)
    # max-pool means permutation invariance over points
    perm = jax.random.permutation(jax.random.PRNGKey(3), 100)
    out_perm = model.apply(variables, pos[:, perm], dist[:, perm])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_perm), atol=1e-5)


def test_pointnet_segment_batch():
    model = PointNet(out_channels=1)
    pos = jax.random.normal(jax.random.PRNGKey(0), (200, 3))
    dist = jax.random.normal(jax.random.PRNGKey(1), (200, 1))
    batch = jnp.repeat(jnp.arange(2), 100)
    variables = model.init(jax.random.PRNGKey(2), pos, dist, batch=batch, num_segments=2)
    out = model.apply(variables, pos, dist, batch=batch, num_segments=2)
    assert out.shape == (2, 1)
    # must equal the dense batched version
    dense = model.apply(variables, pos.reshape(2, 100, 3), dist.reshape(2, 100, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)


def test_sdf_generator_shapes():
    model = SDFGenerator(latent_channels=128, hidden_channels=256, num_layers=8)
    pos = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 128))
    variables = model.init(jax.random.PRNGKey(2), pos, z)
    out = model.apply(variables, pos, z)
    assert out.shape == (2, 64, 1)
    # latent actually matters
    out2 = model.apply(variables, pos, z + 1.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
