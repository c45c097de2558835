#!/usr/bin/env python3
"""GAN-family quality gate: train, sample, score, and picture the GANs.

The reference ships visual proof that its GANs work — a sample sheet
(/root/reference/examples/gan_shapes.png) and three pretrained voxel
generators (README.md:75-78) — but computes its quality metrics out-of-repo.
This gate produces BOTH kinds of evidence in-framework, for the two GAN
families that bracket the model zoo:

  A. **Voxel GAN** (train/gan.py): train on synthetic analytic SDF shapes,
     sample generators, extract meshes, and score MMD-CD + COV-CD of the
     samples against ground-truth surface clouds of the training family
     (shapegan_tpu.metrics — the paper's own metric pair).
  B. **Hybrid progressive WGAN-GP** (the paper's flagship): execute the
     FULL 4-iteration growth chain 0→1→2→3 (8³→16³→32³→64³) exactly as
     the reference README prescribes (/root/reference/README.md:58-63),
     each iteration warm-starting from the previous one's checkpoints
     across all three resolution boundaries, then sample the final 64³
     implicit generator and score MMD-CD + COV-CD.
  C. **Sample sheet**: `plots/gan_shapes.png` analog — one row of dataset
     shapes, one row of voxel-GAN samples, one row of progressive samples,
     rendered through the same pipeline as the GL viewer (native software
     rasterizer; no display needed).
  D. **Machine-readable GATE record**: results + thresholds + pass/fail are
     written to `<workdir>/gate_gan.json` and printed as one `GATE {...}`
     line, so a quality regression is as recordable per round as a perf one
     (the record beside BENCH_r*.json).

The gate FAILS (exit 1) if either family's MMD-CD exceeds or COV-CD falls
below its threshold. Thresholds are regression guards calibrated from the
round-5 v5e run recorded in BASELINE.md (defaults below, ~2x headroom over
the measured values); the reduced budgets make this a "does adversarial
training still produce shapes of the right family" check, not a SOTA bar.

Usage:
    python run_gan_gate.py [workdir] [cpu] [shapes=64] [samples=16]
        [gan_epochs=2000] [prog_epochs=250] [point_count=2048] [gt_count=24]
        [prog_g_every=1] [prog_lr=1e-3] [prog_d_lr=..] [nosheet]
        [voxel_mmd_max=..] [voxel_cov_min=..]
        [prog_mmd_max=..] [prog_cov_min=..]

Progressive-stage rebalance (prog_g_every / prog_lr / prog_d_lr): at the
gate's synthetic budget (64 shapes -> 4 batches/epoch) the reference cadence
(G every 5th batch, RMSprop 1e-4) gives the generator ~200 updates per
250-epoch iteration — ~60x fewer than the reference's real-data runs — and
the generator mean-collapses to the data's constant mean field (every sample
empty; measured in the round-5 scan, scripts/prog_gate_scan.py). The gate
therefore trains the chain with G updated every batch at a higher learning
rate by default; the TRAINER defaults remain reference-parity
(train/hybrid_progressive_gan.py).
"""

import json
import os
import sys
import time

import numpy as np

# Calibration procedure: run this script at the default budgets (shapes=64,
# samples=16, gan_epochs=2000, prog_epochs=250) on one v5e chip, record the
# measured MMD/COV in BASELINE.md, and set bounds with ~2x headroom on MMD
# and one coarse COV grid step (1/samples) of slack on COV — loose enough
# for run-to-run GAN noise, tight enough that a collapsed or untrained
# generator trips them. The defaults below come from the round-5
# calibration run recorded in BASELINE.md ("GAN quality gate" section).
DEFAULT_GATES = {
    "voxel_mmd_max": 0.010,
    "voxel_cov_min": 0.30,
    "prog_mmd_max": 0.010,
    "prog_cov_min": 0.30,
}


def main():
    argv = [a for a in sys.argv[1:] if "=" not in a]
    opts = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    if "cpu" in argv:
        from shapegan_tpu.core.config import _force_cpu_backend

        _force_cpu_backend()
        argv.remove("cpu")
    else:
        # Same fail-fast guard as bench.py: a dead remote-TPU tunnel hangs
        # the first compile/execute RPC forever; probe with a real
        # computation and refuse to start instead of hanging the run.
        from shapegan_tpu.util import probe_jax_backend

        count, detail = probe_jax_backend(180.0)
        if count < 0:
            raise SystemExit(
                f"run_gan_gate: JAX backend unreachable ({detail}); "
                "refusing to hang — is the TPU tunnel up? (pass 'cpu' to "
                "run on the host instead)"
            )
    sheet = True
    if "nosheet" in argv:
        sheet = False
        argv.remove("nosheet")
    resume = "continue" in argv
    if resume:
        argv.remove("continue")
    workdir = argv[0] if argv else "gan_gate_run"
    run(
        workdir,
        shapes=int(opts.get("shapes", 64)),
        samples=int(opts.get("samples", 16)),
        gan_epochs=int(opts.get("gan_epochs", 2000)),
        prog_epochs=int(opts.get("prog_epochs", 250)),
        point_count=int(opts.get("point_count", 2048)),
        gt_count=int(opts.get("gt_count", 24)),
        sheet=sheet,
        gates={k: float(opts[k]) for k in DEFAULT_GATES if k in opts},
        resume=resume,
        save_every=int(opts.get("save_every", 25)),
        prog_g_every=int(opts.get("prog_g_every", 1)),
        prog_lr=float(opts.get("prog_lr", 1e-3)),
        prog_d_lr=float(opts["prog_d_lr"]) if "prog_d_lr" in opts else None,
    )


def run(workdir, shapes=64, samples=16, gan_epochs=2000, prog_epochs=250,
        point_count=2048, gt_count=24, mesh_resolution=64, sheet=True,
        gates=None, seed=0, resume=False, save_every=25,
        prog_g_every=1, prog_lr=1e-3, prog_d_lr=None):
    """``resume=True`` ('continue' on the CLI) makes the run retryable: each
    training stage resumes from its own CSV/checkpoints if it has started
    (fresh warm-start semantics otherwise), so an interrupted run — e.g. a
    dropped remote-TPU link — picks up where it stopped instead of
    retraining. ``save_every`` thins the latest-slot checkpoint cadence (25
    here vs the trainers' reference-parity every-epoch default) because each
    save pulls params off-device; a retry may therefore lose up to
    save_every-1 epochs per interruption — immaterial against the budgets'
    and thresholds' headroom."""
    from shapegan_tpu.core.config import TrainConfig

    os.makedirs(os.path.join(workdir, "plots"), exist_ok=True)
    model_dir = os.path.join(workdir, "models")
    plot_dir = os.path.join(workdir, "plots")
    timings = {}

    def stage_resume(csv_name):
        # Resume a stage only if it actually started: a never-started
        # progressive iteration must take the warm-start branch
        # (resume=True would skip loading the previous iteration).
        return resume and os.path.exists(os.path.join(plot_dir, csv_name))

    # Ground truth: surface clouds of the first gt_count training shapes,
    # extracted at 64^3 (finer than the 32^3 training grids; the half-unit
    # sphere rescale in metrics makes the comparison resolution-agnostic).
    from shapegan_tpu.data.synthetic import make_voxel_dataset
    from shapegan_tpu.metrics import coverage, minimum_matching_distance, sample_from_voxels

    t0 = time.time()
    gt_count = min(gt_count, shapes)
    gt_voxels = make_voxel_dataset(gt_count, 64, rescale=False, seed=seed)
    gt_clouds = sample_from_voxels(gt_voxels, point_count=point_count, seed=seed)
    timings["ground_truth"] = time.time() - t0

    # --- A. voxel GAN --------------------------------------------------
    from shapegan_tpu.train import gan

    t0 = time.time()
    gan_cfg = TrainConfig(
        nogui=True, synthetic=shapes, epochs=gan_epochs, seed=seed,
        batch_size=32, model_dir=model_dir, plot_dir=plot_dir,
        resume=stage_resume("gan_training.csv"),
        extras={"save_every": save_every},
    )
    g_state, _ = gan.train(gan_cfg)
    timings["train_voxel_gan"] = time.time() - t0

    t0 = time.time()
    import jax

    from shapegan_tpu.models.gan import Generator

    gen_voxels, _ = gan.generate(
        Generator(), g_state, jax.random.PRNGKey(seed + 7), samples, train=False
    )
    gen_voxels = np.asarray(gen_voxels)
    voxel_clouds = sample_from_voxels(gen_voxels, point_count=point_count, seed=seed + 7)
    voxel_empty = int(np.sum(~voxel_clouds.any(axis=(1, 2))))
    voxel_clouds = _punish_empty(voxel_clouds, point_count)
    voxel_gan = {
        "mmd_cd": minimum_matching_distance(voxel_clouds, gt_clouds),
        "cov_cd": coverage(voxel_clouds, gt_clouds),
        "empty_samples": voxel_empty,
    }
    timings["score_voxel_gan"] = time.time() - t0
    print(f"voxel GAN: mmd_cd={voxel_gan['mmd_cd']:.5f} cov_cd={voxel_gan['cov_cd']:.3f} "
          f"({voxel_empty} empty)")

    # --- B. progressive chain 0→1→2→3 ---------------------------------
    from shapegan_tpu import checkpoints
    from shapegan_tpu.train import hybrid_progressive_gan as prog

    t0 = time.time()
    g_params = d_params = None
    for iteration in range(4):
        if iteration > 0:
            # The warm start the reference README step relies on: the
            # previous iteration's latest slots must exist.
            assert checkpoints.exists(prog.G_NAME.format(iteration - 1), base=model_dir), (
                f"iteration {iteration}: missing warm-start generator checkpoint"
            )
            assert checkpoints.exists(prog.D_NAME.format(iteration - 1), base=model_dir), (
                f"iteration {iteration}: missing warm-start discriminator checkpoint"
            )
        prog_extras = {"save_every": save_every, "g_every": prog_g_every,
                       "learn_rate": prog_lr}
        if prog_d_lr is not None:
            prog_extras["d_learn_rate"] = prog_d_lr
        prog_cfg = TrainConfig(
            nogui=True, synthetic=shapes, epochs=prog_epochs, iteration=iteration,
            seed=seed, batch_size=16, model_dir=model_dir, plot_dir=plot_dir,
            resume=stage_resume(f"hybrid_gan_training_{iteration}.csv"),
            extras=prog_extras,
        )
        g_params, d_params = prog.train(prog_cfg)
        _assert_finite_csv(
            os.path.join(plot_dir, f"hybrid_gan_training_{iteration}.csv"), iteration
        )
    timings["train_progressive_chain"] = time.time() - t0

    t0 = time.time()
    from shapegan_tpu.metrics import sample_point_clouds
    from shapegan_tpu.models.sdf_net import SDFNet

    net = SDFNet()
    codes = np.asarray(jax.random.normal(jax.random.PRNGKey(seed + 11), (samples, 128)))
    prog_clouds = sample_point_clouds(
        net, g_params, codes, point_count=point_count,
        voxel_resolution=mesh_resolution, seed=seed + 11,
    )
    prog_empty = int(np.sum(~prog_clouds.any(axis=(1, 2))))
    prog_clouds = _punish_empty(prog_clouds, point_count)
    progressive = {
        "mmd_cd": minimum_matching_distance(prog_clouds, gt_clouds),
        "cov_cd": coverage(prog_clouds, gt_clouds),
        "empty_samples": prog_empty,
    }
    timings["score_progressive"] = time.time() - t0
    print(f"progressive 64^3: mmd_cd={progressive['mmd_cd']:.5f} "
          f"cov_cd={progressive['cov_cd']:.3f} ({prog_empty} empty)")

    # --- C. sample sheet ------------------------------------------------
    sheet_path = None
    if sheet:
        t0 = time.time()
        sheet_path = os.path.join(plot_dir, "gan_shapes.png")
        render_sample_sheet(
            data_voxels=gt_voxels[: min(8, len(gt_voxels))],
            gan_voxels=gen_voxels[: min(8, len(gen_voxels))],
            net=net, g_params=g_params,
            codes=codes[: min(8, len(codes))],
            mesh_resolution=mesh_resolution,
            path=sheet_path,
        )
        timings["sample_sheet"] = time.time() - t0
        print(f"sample sheet: {sheet_path}")

    # --- D. gate + record -------------------------------------------------
    thresholds = dict(DEFAULT_GATES)
    thresholds.update(gates or {})
    checks = (
        ("voxel_gan.mmd_cd", voxel_gan["mmd_cd"], "<=", thresholds["voxel_mmd_max"]),
        ("voxel_gan.cov_cd", voxel_gan["cov_cd"], ">=", thresholds["voxel_cov_min"]),
        ("progressive.mmd_cd", progressive["mmd_cd"], "<=", thresholds["prog_mmd_max"]),
        ("progressive.cov_cd", progressive["cov_cd"], ">=", thresholds["prog_cov_min"]),
    )
    failures = []
    print("\n=== GAN quality gate ===")
    for name, value, op, bound in checks:
        ok = value <= bound if op == "<=" else value >= bound
        print(f"{name}: {value:.5f} ({op} {bound:g}) {'PASS' if ok else 'FAIL'}")
        if not ok:
            failures.append(name)
    for k, v in timings.items():
        print(f"{k}: {v:.1f}s")

    record = {
        "gate": "gan",
        "voxel_gan": voxel_gan,
        "progressive": progressive,
        "thresholds": thresholds,
        "config": {"shapes": shapes, "samples": samples, "gan_epochs": gan_epochs,
                   "prog_epochs": prog_epochs, "point_count": point_count,
                   "gt_count": gt_count, "seed": seed,
                   "prog_g_every": prog_g_every, "prog_lr": prog_lr,
                   "prog_d_lr": prog_d_lr},
        "sample_sheet": sheet_path,
        "pass": not failures,
        "failures": failures,
    }
    record_path = os.path.join(workdir, "gate_gan.json")
    with open(record_path, "w") as f:
        json.dump(record, f, indent=1)
    print("GATE " + json.dumps(record))
    if failures:
        raise SystemExit(f"GAN QUALITY GATE FAILED: {', '.join(failures)}")
    print("GAN quality gate: PASS")
    return record


def _punish_empty(clouds: np.ndarray, point_count: int) -> np.ndarray:
    """Replace all-zero (empty-mesh) clouds with a far-away dummy so MMD/COV
    punish them instead of treating the origin blob as a shape."""
    clouds = clouds.copy()
    empty = ~clouds.any(axis=(1, 2))
    clouds[empty] = np.full((point_count, 3), 10.0, np.float32)
    return clouds


def _assert_finite_csv(path: str, iteration: int) -> None:
    """Every logged epoch line of the chain must be finite (CSV schema:
    epoch time pred_fake pred_real gradient_penalty)."""
    values = np.loadtxt(path, ndmin=2)
    assert values.shape[0] > 0, f"iteration {iteration}: empty training log {path}"
    assert np.all(np.isfinite(values)), (
        f"iteration {iteration}: non-finite training telemetry in {path}"
    )


def render_sample_sheet(data_voxels, gan_voxels, net, g_params, codes,
                        mesh_resolution, path, tile: int = 128):
    """Three-row grid PNG (dataset / voxel GAN / progressive), rendered via
    the viewer's headless path (GL when available, native software
    rasterizer otherwise — identical pipeline)."""
    from shapegan_tpu.render.viewer import MeshRenderer

    viewer = MeshRenderer(size=2 * tile, start_thread=False)
    try:
        # Real GL pipeline without a display (surfaceless EGL); get_image
        # falls back to the identical-output software rasterizer when no
        # EGL/Mesa stack exists.
        viewer.use_headless_gl()
    except Exception as e:
        print(f"sample sheet: headless GL unavailable ({e}); software twin")
    rows = []

    def tile_image():
        return viewer.get_image(crop=True, output_size=tile)

    row = []
    viewer.model_color = (0.25, 0.45, 0.8)
    for volume in data_voxels:
        viewer.set_voxels(np.asarray(volume))
        row.append(tile_image())
    rows.append(row)

    row = []
    viewer.model_color = (0.8, 0.1, 0.1)
    for volume in gan_voxels:
        viewer.set_voxels(np.asarray(volume))
        row.append(tile_image())
    rows.append(row)

    row = []
    viewer.model_color = (0.85, 0.55, 0.1)
    for code in codes:
        mesh = net.get_mesh(g_params, np.asarray(code), voxel_resolution=mesh_resolution)
        if mesh is None:
            row.append(np.full((tile, tile, 3), 255, np.uint8))
            continue
        viewer.set_mesh(mesh)
        row.append(tile_image())
    rows.append(row)

    pad = 4
    width = max(len(r) for r in rows)
    grid = np.full(
        (len(rows) * (tile + pad) + pad, width * (tile + pad) + pad, 3), 255, np.uint8
    )
    for y, row in enumerate(rows):
        for x, image in enumerate(row):
            oy, ox = pad + y * (tile + pad), pad + x * (tile + pad)
            grid[oy:oy + tile, ox:ox + tile] = image

    from PIL import Image

    Image.fromarray(grid).save(path)


if __name__ == "__main__":
    main()
