"""The fused SDF-MLP: equivalence of all apply paths and parity of the
architecture with the reference SDFNet."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from shapegan_tpu.ops import sdf_mlp


def naive_concat_apply(params, points, latents):
    """The reference formulation (/root/reference/model/sdf_net.py:56-61):
    explicit concat of (points, latents), weights reassembled from the split
    storage. Used as the golden implementation."""
    w1 = jnp.concatenate([params["w1p"], params["w1z"]], axis=0)
    w5 = jnp.concatenate([params["w5h"], params["w5p"], params["w5z"]], axis=0)
    inp = jnp.concatenate([points, latents], axis=1)
    x = jax.nn.relu(inp @ w1 + params["b1"])
    x = jax.nn.relu(x @ params["w2"] + params["b2"])
    x = jax.nn.relu(x @ params["w3"] + params["b3"])
    x = jax.nn.relu(x @ params["w4"] + params["b4"])
    x = jnp.concatenate([x, inp], axis=1)
    x = jax.nn.relu(x @ w5 + params["b5"])
    x = jax.nn.relu(x @ params["w6"] + params["b6"])
    x = jax.nn.relu(x @ params["w7"] + params["b7"])
    return jnp.tanh(x @ params["w8"] + params["b8"])[:, 0]


@pytest.mark.slow
def test_apply_matches_concat_formulation():
    key = jax.random.PRNGKey(0)
    params = sdf_mlp.init(key, latent_size=16, breadth=32)
    points = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    latents = jax.random.normal(jax.random.PRNGKey(2), (64, 16))
    ours = sdf_mlp.apply(params, points, latents)
    golden = naive_concat_apply(params, points, latents)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-5)


def test_apply_grid_matches_per_point():
    params = sdf_mlp.init(jax.random.PRNGKey(0), latent_size=16, breadth=32)
    grid = jax.random.normal(jax.random.PRNGKey(1), (50, 3))
    latents = jax.random.normal(jax.random.PRNGKey(2), (4, 16))
    grid_out = sdf_mlp.apply_grid(params, grid, latents)  # [4, 50]
    assert grid_out.shape == (4, 50)
    for b in range(4):
        per_point = sdf_mlp.apply(params, grid, jnp.tile(latents[b], (50, 1)))
        np.testing.assert_allclose(np.asarray(grid_out[b]), np.asarray(per_point), atol=1e-5)


def test_apply_indexed_matches_gathered():
    params = sdf_mlp.init(jax.random.PRNGKey(0), latent_size=16, breadth=32)
    table = jax.random.normal(jax.random.PRNGKey(1), (5, 16))
    points = jax.random.normal(jax.random.PRNGKey(2), (40, 3))
    idx = jax.random.randint(jax.random.PRNGKey(3), (40,), 0, 5)
    ours = sdf_mlp.apply_indexed(params, points, table, idx)
    golden = sdf_mlp.apply(params, points, table[idx])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-5)


def test_parameter_count_matches_reference_architecture():
    # Reference SDFNet: Linear(131,256) + 3x Linear(256,256)
    #                 + Linear(387,256) + 2x Linear(256,256) + Linear(256,1)
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    expected = (
        (3 + 128) * 256 + 256
        + 3 * (256 * 256 + 256)
        + (256 + 3 + 128) * 256 + 256
        + 2 * (256 * 256 + 256)
        + 256 * 1 + 1
    )
    assert sdf_mlp.parameter_count(params) == expected


def test_output_range_is_tanh_bounded():
    params = sdf_mlp.init(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (10, 3)) * 10
    z = jax.random.normal(jax.random.PRNGKey(2), (10, 128)) * 10
    out = np.asarray(sdf_mlp.apply(params, pts, z))
    assert (np.abs(out) <= 1.0).all()


def test_grad_flows_to_all_parameters():
    params = sdf_mlp.init(jax.random.PRNGKey(0), latent_size=8, breadth=16)
    pts = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    z = jax.random.normal(jax.random.PRNGKey(2), (32, 8))

    def loss(p):
        return jnp.mean(sdf_mlp.apply(p, pts, z) ** 2)

    grads = jax.grad(loss)(params)
    for k, g in grads.items():
        assert float(jnp.abs(g).sum()) > 0.0, f"no grad for {k}"


def test_fold_latent_matches_full_network():
    """fold_latent specializes to one code: identical fp32 outputs through
    both the per-point and grid paths, with L=0 parameter shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shapegan_tpu.ops import sdf_mlp

    params = sdf_mlp.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (128,))
    pts = jax.random.uniform(jax.random.PRNGKey(2), (257, 3), minval=-1, maxval=1)

    folded = sdf_mlp.fold_latent(params, z)
    assert folded["w1z"].shape == (0, 256) and folded["w5z"].shape == (0, 256)

    full = sdf_mlp.apply_grid(params, pts, z[None, :])
    lean = sdf_mlp.apply_grid(folded, pts, z[:0][None, :])
    np.testing.assert_allclose(np.asarray(full), np.asarray(lean), atol=1e-6)

    full_pp = sdf_mlp.apply(params, pts, jnp.broadcast_to(z, (257, 128)))
    lean_pp = sdf_mlp.apply(folded, pts, jnp.zeros((257, 0)))
    np.testing.assert_allclose(np.asarray(full_pp), np.asarray(lean_pp), atol=1e-6)
