"""Autodecoder: sign-balanced batching, convergence on an analytic shape,
full loop + artifacts."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from shapegan_tpu import checkpoints
from shapegan_tpu.core.config import TrainConfig
from shapegan_tpu.models import LATENT_CODES_FILENAME
from shapegan_tpu.models.sdf_net import SDFNet
from shapegan_tpu.train import sdf_autodecoder as ad


def test_create_batches_sign_balanced():
    rng = np.random.default_rng(0)
    signs = rng.random(10000) < 0.7  # 70% positive
    batches = list(ad.create_batches(signs, 1000, rng))
    all_idx = np.concatenate(batches)
    # every batch is exactly batch_size
    assert all(len(b) == 1000 for b in batches)
    # roughly half positive, half negative overall
    frac_pos = signs[all_idx].mean()
    assert 0.45 < frac_pos < 0.55


def test_autodecoder_converges_on_sphere():
    # One shape: unit-ball points labeled with an analytic sphere SDF. After
    # a few hundred steps the (tiny) net's loss must drop substantially.
    net = SDFNet(latent_code_size=8, breadth=32)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
    sdf = (np.linalg.norm(pts, axis=1) - 0.5).astype(np.float32)
    sdf = np.clip(sdf, -0.1, 0.1)

    params = net.init(jax.random.PRNGKey(0))
    codes = jax.random.normal(jax.random.PRNGKey(1), (1, 8)) * 1e-4
    net_tx = optax.adam(1e-3)
    code_tx = optax.adam(1e-3)
    net_opt = net_tx.init(params)
    code_opt = code_tx.init(codes)
    step, epoch_fn = ad.make_train_step(net, net_tx, code_tx, pointcloud_size=4000)

    points_j, sdf_j = jnp.asarray(pts), jnp.asarray(sdf)
    losses = []
    for i in range(60):
        idx = jnp.asarray(rng.integers(0, 4000, 2000), dtype=jnp.int32)
        params, codes, net_opt, code_opt, loss = step(
            params, codes, net_opt, code_opt, points_j, sdf_j, idx
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
    assert np.isfinite(losses[-1])

    # the scanned-epoch fast path must keep training from where we are
    batches = jnp.asarray(rng.integers(0, 4000, (10, 2000)), dtype=jnp.int32)
    params, codes, net_opt, code_opt, epoch_losses = epoch_fn(
        params, codes, net_opt, code_opt, points_j, sdf_j, batches
    )
    assert epoch_losses.shape == (10,)
    assert float(epoch_losses[-1]) <= losses[-1] * 1.1


def test_bf16_step_grads_track_fp32_truth():
    """The trainer's production bf16 compute (fp32 master weights + fp32
    accumulation) must produce gradients aligned with the fp32-truth
    gradients — each lossy path is compared against fp32 truth, never two
    lossy paths against each other."""
    net = SDFNet()
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-1, 1, (2048, 3)).astype(np.float32))
    sdf = jnp.asarray(
        np.clip(rng.normal(0, 0.05, 2048), -0.1, 0.1).astype(np.float32)
    )
    params = net.init(jax.random.PRNGKey(0))
    codes = jax.random.normal(jax.random.PRNGKey(1), (4, 128)) * 1e-2
    shape_idx = jnp.asarray(rng.integers(0, 4, 2048), jnp.int32)

    def make_loss(dtype):
        def loss_fn(p, c):
            bc = c[shape_idx]
            out = net.apply(p, pts, bc, dtype=dtype)
            return jnp.mean(jnp.abs(out - sdf)) + ad.SIGMA * jnp.mean(bc**2)

        return loss_fn

    g_true = jax.grad(make_loss(jnp.float32), argnums=(0, 1))(params, codes)
    g_bf16 = jax.grad(make_loss(ad.COMPUTE_DTYPE), argnums=(0, 1))(params, codes)

    def cosine(a, b):
        a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))

    for key in g_true[0]:
        assert cosine(g_true[0][key], g_bf16[0][key]) > 0.98, key
    assert cosine(g_true[1], g_bf16[1]) > 0.98


def test_full_loop_saves_net_and_latents(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = TrainConfig(
        synthetic=3, batch_size=512, epochs=1, nogui=True,
        model_dir=str(tmp_path / "models"), plot_dir=str(tmp_path / "plots"),
        extras={"pointcloud_size": 1024},
    )
    params, codes = ad.train(config)
    assert checkpoints.exists(ad.NET_NAME, base=config.model_dir)
    assert checkpoints.exists(LATENT_CODES_FILENAME, base=config.model_dir)
    # per-epoch snapshots (reference saves one per epoch)
    assert checkpoints.exists(ad.NET_NAME, epoch=0, base=config.model_dir)
    assert codes.shape == (3, 128)
    log = (tmp_path / "plots" / "sdf_net_training.csv").read_text().strip().splitlines()
    assert len(log) == 1
    assert len(log[0].split()) == 4  # epoch time loss latent_std


def test_scale_lr_big_batch_mode(tmp_path, monkeypatch, capsys):
    """The opt-in big-batch deviation (batch_size=N scale_lr) scales both
    Adams' lr linearly with batch size and still trains: loss decreases
    across epochs at the scaled rate. Without scale_lr the reference lr is
    used unchanged (the printed notice only appears when opted in)."""
    monkeypatch.chdir(tmp_path)
    base = dict(
        synthetic=2, epochs=3, nogui=True, seed=7,
        model_dir=str(tmp_path / "models"), plot_dir=str(tmp_path / "plots"),
    )
    config = TrainConfig(
        batch_size=2048, extras={"pointcloud_size": 1024, "scale_lr": True}, **base
    )
    ad.train(config)
    out = capsys.readouterr().out
    # lr = 1e-5 * 2048/20000 = 1.024e-06 (the deviation is batch-proportional)
    assert "scale_lr: batch 2048 -> lr 1.024e-06" in out
    log = np.loadtxt(tmp_path / "plots" / "sdf_net_training.csv", ndmin=2)
    assert np.all(np.isfinite(log))
    # At the linearly-scaled lr (1e-6 for this tiny batch ratio) three
    # epochs move the loss by ~1e-4 at most: assert stability, not
    # convergence (convergence is covered at real rates above).
    assert log[-1, 2] < log[0, 2] * 1.05

    # Opting out: same batch, no notice, same reference lr.
    config2 = TrainConfig(
        batch_size=2048, plot_dir=str(tmp_path / "plots2"),
        model_dir=str(tmp_path / "models2"),
        extras={"pointcloud_size": 1024}, **{k: v for k, v in base.items()
                                             if k not in ("plot_dir", "model_dir")},
    )
    ad.train(config2)
    assert "scale_lr" not in capsys.readouterr().out
