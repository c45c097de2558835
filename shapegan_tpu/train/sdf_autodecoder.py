"""DeepSDF autodecoder trainer: co-optimize the implicit MLP and a per-shape
latent table.

Reference semantics (/root/reference/train_sdf_autodecoder.py): the whole
point dataset lives on-device (points [S*200k, 3], sdf clamped to ±0.1);
latent table initialized N(0, 1e-4); two Adam optimizers (network + codes) at
lr 1e-5; batches of 20k indices drawn **sign-balanced** (equal positive /
negative SDF counts per epoch, reference :55-69); point→shape mapping is
``index // POINTCLOUD_SIZE``; loss = L1 on clamped SDF + 0.01·mean(z²);
save net + latent table every epoch, plus per-epoch snapshots; CSV schema
``epoch time loss latent_std``; epoch resume from the CSV line count.

TPU-native: the gather (points/sdf/latent rows), the fused MLP (latent rows
gathered per point then concatenated into the matmul input — see
ops/sdf_mlp.apply_indexed; the once-per-step projected-table variant was
measured at 0.79x and rejected, BASELINE.md), both losses, both Adam
updates, and the latent-row scatter-add of code gradients are ONE jitted
step. Unlike the
reference, every batch has the same static size (the epoch's remainder batch
is padded with repeated indices instead of being oversized) so one compiled
program serves the whole run.
"""

from __future__ import annotations

import functools
from itertools import count
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from shapegan_tpu import LATENT_CODE_SIZE, checkpoints
from shapegan_tpu.core.config import TrainConfig, parse_cli
from shapegan_tpu.models import LATENT_CODES_FILENAME
from shapegan_tpu.models.sdf_net import SDFNet
from shapegan_tpu.train.common import (
    CSVLogger,
    EpochTimer,
    StepProfiler,
    effective_batch_size,
    make_viewer,
)

POINTCLOUD_SIZE = 200000
BATCH_SIZE = 20000
SDF_CUTOFF = 0.1
SIGMA = 0.01
LEARNING_RATE = 1e-5
VIEWER_UPDATE_BATCHES = 400
# Production precision policy: bf16 matmul INPUTS on the MXU with fp32
# accumulation and fp32 master weights/optimizer moments/loss (the reference
# trains this step in fp32 cuBLAS; measured 1.27x faster per step at the
# reference batch, convergence-tested in tests/test_train_autodecoder.py).
COMPUTE_DTYPE = jnp.bfloat16

NET_NAME = "sdf_net"
OPT_NAME = "sdf_net_optimizer"


def load_pointcloud(config: TrainConfig):
    """Load (points, sdf) — real monolithic artifacts or synthetic shapes."""
    import os

    if config.synthetic:
        from shapegan_tpu.data.synthetic import make_sdf_pointcloud

        pointcloud_size = int(config.extras.get("pointcloud_size", 20000))
        points, sdf = make_sdf_pointcloud(config.synthetic, pointcloud_size, seed=config.seed)
        return points, sdf, pointcloud_size
    points = np.load(os.path.join(config.data_dir, "sdf_points.npy"))
    sdf = np.load(os.path.join(config.data_dir, "sdf_values.npy"))
    # Per-shape cloud size follows the prep config (reference
    # SDF_POINT_CLOUD_SIZE, prepare_shapenet_dataset.py:29) — overridable for
    # corpora prepared with smaller clouds.
    pointcloud_size = int(config.extras.get("pointcloud_size", POINTCLOUD_SIZE))
    return points.astype(np.float32), sdf.astype(np.float32), pointcloud_size


def create_batches(signs: np.ndarray, batch_size: int, rng: np.random.Generator):
    """Sign-balanced shuffled index batches (reference :55-69): subsample the
    majority sign to the minority's count, shuffle, cut into fixed-size
    batches; the final partial batch is padded with random repeats (static
    shape for jit) rather than merged into an oversized one."""
    positive = np.nonzero(signs)[0]
    negative = np.nonzero(~signs)[0]
    if positive.shape[0] == 0 or negative.shape[0] == 0:
        # Degenerate data (e.g. clouds from an open mesh with no interior
        # samples): balancing would truncate to zero and the epoch would
        # silently train nothing / crash on np.stack of an empty list.
        raise ValueError(
            "SDF dataset has samples of only one sign "
            f"({positive.shape[0]} positive / {negative.shape[0]} negative); "
            "sign-balanced batching needs both — check the data preparation."
        )
    if negative.shape[0] > positive.shape[0]:
        rng.shuffle(negative)
        negative = negative[: positive.shape[0]]
    else:
        rng.shuffle(positive)
        positive = positive[: negative.shape[0]]
    indices = np.concatenate((negative, positive))
    rng.shuffle(indices)
    for i in range(0, max(len(indices), 1), batch_size):
        chunk = indices[i : i + batch_size]
        if len(chunk) == 0:
            return
        if len(chunk) < batch_size:
            pad = rng.choice(indices, batch_size - len(chunk))
            chunk = np.concatenate([chunk, pad])
        yield chunk


def create_sharded_batches(
    signs: np.ndarray, batch_size: int, shards: int, rng: np.random.Generator
):
    """Per-shard sign-balanced local index batches for the sharded epoch.

    ``signs`` is the global sign array laid out shard-major (shard s owns the
    contiguous slice ``[s*L, (s+1)*L)``); each shard draws balanced batches of
    ``batch_size // shards`` LOCAL indices from its own slice. Returns
    [num_batches, shards, batch_size // shards] (num_batches = the smallest
    shard's epoch, so every scan step has all shards participating)."""
    local_n = signs.shape[0] // shards
    local_batch = batch_size // shards
    per_shard = [
        list(create_batches(signs[s * local_n : (s + 1) * local_n], local_batch, rng))
        for s in range(shards)
    ]
    num_batches = min(len(b) for b in per_shard)
    if num_batches == 0:
        return np.zeros((0, shards, local_batch), np.int64)
    return np.stack(
        [np.stack([per_shard[s][i] for s in range(shards)]) for i in range(num_batches)]
    )


def make_sharded_epoch(net: SDFNet, net_tx, code_tx, pointcloud_size: int, mesh,
                       code_opt_example, compute_dtype=COMPUTE_DTYPE):
    """Multi-chip epoch: the resident point dataset, SDF values, latent table,
    and latent-optimizer moments are sharded BY SHAPE over the mesh's 'data'
    axis — the TPU answer to the reference's whole-dataset-on-one-GPU
    residency (/root/reference/train_sdf_autodecoder.py:22-23), which cannot
    hold the 71 GB full dataset in one chip's HBM.

    Each device draws sign-balanced batches from its OWN shard (indices are
    shard-local), so a global step sees the same total point count as the
    single-device path, stratified by shard. Network gradients are the only
    collective (pmean over 'data'); latent-code gradients touch only local
    rows and need no communication at all.
    """
    from jax.sharding import PartitionSpec as P

    from shapegan_tpu.parallel.mesh import DATA_AXIS

    def local_epoch(params, latent_codes, net_opt_state, code_opt_state, points, sdf,
                    all_indices):
        def step(carry, indices):
            params, latent_codes, net_opt_state, code_opt_state = carry
            indices = indices[0]  # strip the size-1 shard block dim
            shape_indices = indices // pointcloud_size
            batch_points = points[indices]
            batch_sdf = sdf[indices]

            def loss_fn(p, codes):
                batch_codes = codes[shape_indices]
                output = net.apply(p, batch_points, batch_codes, dtype=compute_dtype)
                return jnp.mean(jnp.abs(output - batch_sdf)) + SIGMA * jnp.mean(
                    batch_codes**2
                )

            loss, (net_grads, code_grads) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                params, latent_codes
            )
            loss = jax.lax.pmean(loss, DATA_AXIS)
            # The global objective is the mean over the GLOBAL batch = the
            # average of the shard-local means. Differentiating wrt the
            # REPLICATED params inside shard_map already psums the
            # cotangents over 'data' (shard_map's transpose rule), so the
            # net grads arrive as the SUM of shard means — rescale to the
            # mean. Code rows are shard-local (varying), so their local
            # gradient just needs the same 1/D weight; no collective.
            shard_count = jax.lax.psum(1, DATA_AXIS)
            net_grads = jax.tree.map(lambda g: g / shard_count, net_grads)
            code_grads = jax.tree.map(lambda g: g / shard_count, code_grads)
            net_updates, net_opt_state = net_tx.update(net_grads, net_opt_state, params)
            params = optax.apply_updates(params, net_updates)
            code_updates, code_opt_state = code_tx.update(
                code_grads, code_opt_state, latent_codes
            )
            latent_codes = optax.apply_updates(latent_codes, code_updates)
            return (params, latent_codes, net_opt_state, code_opt_state), loss

        (params, latent_codes, net_opt_state, code_opt_state), losses = jax.lax.scan(
            step, (params, latent_codes, net_opt_state, code_opt_state), all_indices
        )
        return params, latent_codes, net_opt_state, code_opt_state, losses

    def code_spec(leaf):
        # Adam moments for the latent table shard with it; step counters stay
        # replicated scalars.
        return P(DATA_AXIS) if getattr(leaf, "ndim", 0) >= 1 else P()

    code_opt_specs = jax.tree.map(code_spec, code_opt_example)

    sharded = jax.shard_map(
        local_epoch,
        mesh=mesh,
        in_specs=(
            P(),                      # params (replicated)
            P(DATA_AXIS),             # latent table rows
            P(),                      # net optimizer state
            code_opt_specs,           # code optimizer moments
            P(DATA_AXIS),             # points
            P(DATA_AXIS),             # sdf values
            P(None, DATA_AXIS, None), # [num_batches, shards, local_batch]
        ),
        out_specs=(P(), P(DATA_AXIS), P(), code_opt_specs, P()),
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2, 3))


def make_train_step(net: SDFNet, net_tx, code_tx, pointcloud_size: int,
                    compute_dtype=COMPUTE_DTYPE):
    def step_body(params, latent_codes, net_opt_state, code_opt_state, points, sdf, indices):
        shape_indices = indices // pointcloud_size
        batch_points = points[indices]
        batch_sdf = sdf[indices]

        def loss_fn(params, codes):
            # One gather serves both the MLP and the regularizer (reference
            # :78-87 semantics; apply_indexed would re-gather internally).
            batch_codes = codes[shape_indices]
            output = net.apply(params, batch_points, batch_codes, dtype=compute_dtype)
            return jnp.mean(jnp.abs(output - batch_sdf)) + SIGMA * jnp.mean(batch_codes**2)

        loss, (net_grads, code_grads) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params, latent_codes
        )
        net_updates, net_opt_state = net_tx.update(net_grads, net_opt_state, params)
        params = optax.apply_updates(params, net_updates)
        code_updates, code_opt_state = code_tx.update(code_grads, code_opt_state, latent_codes)
        latent_codes = optax.apply_updates(latent_codes, code_updates)
        return params, latent_codes, net_opt_state, code_opt_state, loss

    train_step = jax.jit(step_body, donate_argnums=(0, 1, 2, 3))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def train_epoch(params, latent_codes, net_opt_state, code_opt_state, points, sdf, all_indices):
        """One dispatch for a whole epoch: lax.scan over [num_batches, batch]
        index arrays. A 2.8 ms step would otherwise pay a host dispatch round
        trip per batch (SURVEY.md §3.3's hot loop is pure MLP — the epoch is
        compute, not control flow)."""

        def body(carry, indices):
            params, latent_codes, net_opt_state, code_opt_state = carry
            params, latent_codes, net_opt_state, code_opt_state, loss = step_body(
                params, latent_codes, net_opt_state, code_opt_state, points, sdf, indices
            )
            return (params, latent_codes, net_opt_state, code_opt_state), loss

        (params, latent_codes, net_opt_state, code_opt_state), losses = jax.lax.scan(
            body, (params, latent_codes, net_opt_state, code_opt_state), all_indices
        )
        return params, latent_codes, net_opt_state, code_opt_state, losses

    return train_step, train_epoch


def train(config: Optional[TrainConfig] = None):
    config = config or parse_cli()
    net = SDFNet()

    points_np, sdf_np, pointcloud_size = load_pointcloud(config)
    model_count = points_np.shape[0] // pointcloud_size
    sdf_np = np.clip(sdf_np, -SDF_CUTOFF, SDF_CUTOFF)
    signs = sdf_np > 0

    batch_size = effective_batch_size(config.batch_size or BATCH_SIZE, points_np.shape[0])
    points = jnp.asarray(points_np)
    sdf = jnp.asarray(sdf_np)

    rng = jax.random.PRNGKey(config.seed)
    params = net.init(rng)
    latent_codes = (
        jax.random.normal(jax.random.PRNGKey(config.seed + 1), (model_count, LATENT_CODE_SIZE))
        * 1e-4
    )

    # Opt-in big-batch mode (a documented DEVIATION from reference
    # semantics): the 20k-point reference step is HBM-latency-bound, not
    # compute-bound (BASELINE.md's rowwise-kernel rejection decomposition) —
    # larger batches amortize that floor. ``batch_size=65536 scale_lr``
    # scales both Adams' lr linearly with batch size (Goyal et al.'s linear
    # scaling rule) so per-epoch optimization progress tracks the reference
    # schedule; without ``scale_lr`` a non-default batch trains at the
    # reference lr unchanged.
    lr = LEARNING_RATE
    if config.extras.get("scale_lr") and batch_size != BATCH_SIZE:
        lr = LEARNING_RATE * (batch_size / BATCH_SIZE)
        print(f"scale_lr: batch {batch_size} -> lr {lr:.3e} "
              f"(linear scaling vs reference batch {BATCH_SIZE})")
    net_tx = optax.adam(lr)
    code_tx = optax.adam(lr)

    if config.resume and checkpoints.exists(NET_NAME, base=config.model_dir):
        params = checkpoints.load(params, NET_NAME, base=config.model_dir)
        # The latent table must be gated on ITS OWN existence: if only the
        # network file survived, load_array would silently fall back to the
        # bundled example codes with the wrong model_count and JAX's clamped
        # gathers would corrupt training instead of failing.
        if not checkpoints.exists(LATENT_CODES_FILENAME, base=config.model_dir):
            raise FileNotFoundError(
                f"resume: {checkpoints.get_filename(NET_NAME, base=config.model_dir)} exists "
                f"but {checkpoints.get_filename(LATENT_CODES_FILENAME, base=config.model_dir)} "
                "is missing — the checkpoint pair is inconsistent; restore the latent table "
                "or remove the network file to start fresh"
            )
        loaded_codes = checkpoints.load_array(LATENT_CODES_FILENAME, base=config.model_dir)
        if loaded_codes.shape[0] != model_count:
            raise ValueError(
                f"resume: latent table has {loaded_codes.shape[0]} rows but the dataset "
                f"has {model_count} shapes — checkpoint belongs to a different dataset"
            )
        latent_codes = jnp.asarray(loaded_codes)

    net_opt_state = net_tx.init(params)
    code_opt_state = code_tx.init(latent_codes)
    if config.resume and checkpoints.exists(OPT_NAME, base=config.model_dir):
        # Both Adams' moments from the sidecar (the reference resets them).
        restored = checkpoints.load(
            {"net": net_opt_state, "codes": code_opt_state}, OPT_NAME, base=config.model_dir
        )
        net_opt_state, code_opt_state = restored["net"], restored["codes"]
    step_fn, epoch_fn = make_train_step(net, net_tx, code_tx, pointcloud_size)

    # Multi-chip headless path: shard the resident dataset + latent table by
    # shape over the 'data' axis (see make_sharded_epoch). The shard count is
    # the largest device count that divides both the model count and the
    # batch (sharding never changes the user's semantics knobs).
    import math

    from shapegan_tpu.parallel.mesh import DATA_AXIS, data_sharding, get_mesh, replicated

    shards = math.gcd(math.gcd(len(jax.devices()), model_count), batch_size)
    sharded_epoch = None
    mesh = None
    if shards > 1 and config.nogui:
        # Probe shard-local sign balance once up front: create_batches raises
        # per-shard when a shard's slice carries only one SDF sign (e.g. one
        # shape with no interior samples). The single-device path balances
        # globally and would still train, so fall back rather than hard-fail.
        try:
            create_sharded_batches(signs, batch_size, shards, np.random.default_rng(0))
        except ValueError as exc:
            print(f"sharded epoch disabled ({exc}); using single-device epoch")
            shards = 1
        else:
            mesh = get_mesh(data=shards, points=1)
            sharded_epoch = make_sharded_epoch(
                net, net_tx, code_tx, pointcloud_size, mesh, code_opt_state
            )
            from jax.sharding import NamedSharding, PartitionSpec as P

            code_sh = lambda leaf: NamedSharding(
                mesh, P(DATA_AXIS) if getattr(leaf, "ndim", 0) >= 1 else P()
            )
            params = jax.device_put(params, replicated(mesh))
            net_opt_state = jax.device_put(net_opt_state, replicated(mesh))
            latent_codes = jax.device_put(latent_codes, data_sharding(mesh, 2))
            code_opt_state = jax.tree.map(
                lambda leaf: jax.device_put(leaf, code_sh(leaf)), code_opt_state
            )
            points = jax.device_put(points, data_sharding(mesh, 2))
            sdf = jax.device_put(sdf, data_sharding(mesh, 1))

    logger = CSVLogger(f"{config.plot_dir}/sdf_net_training.csv", resume=config.resume)
    first_epoch = logger.first_epoch  # reference resume convention (:49-51)
    viewer = make_viewer(config.nogui)
    profiler = StepProfiler()

    epochs = (
        range(first_epoch, config.epochs) if config.epochs else count(first_epoch)
        # epochs=N is the TOTAL epoch count (train until epoch N), matching the
        # reference's progressive-trainer semantics and every other trainer here;
        # a completed run resumed with the same N trains zero further epochs.
    )
    try:
        for epoch in epochs:
            # Epoch-deterministic batch sampling for reproducible resume.
            np_rng = np.random.default_rng((config.seed, epoch))
            loss_values = []
            with EpochTimer() as timer:
                if viewer is None and sharded_epoch is not None:
                    # Multi-chip fast path: shard-local sign-balanced batches,
                    # whole epoch as one sharded dispatch.
                    batches = create_sharded_batches(signs, batch_size, shards, np_rng)
                    with profiler:
                        params, latent_codes, net_opt_state, code_opt_state, losses = (
                            sharded_epoch(
                                params, latent_codes, net_opt_state, code_opt_state,
                                points, sdf, jnp.asarray(batches, dtype=jnp.int32),
                            )
                        )
                    loss_values = list(np.asarray(losses))
                elif viewer is None:
                    # Headless fast path: the whole epoch is ONE device
                    # dispatch (scan over the epoch's index batches).
                    batches = np.stack(list(create_batches(signs, batch_size, np_rng)))
                    with profiler:
                        params, latent_codes, net_opt_state, code_opt_state, losses = epoch_fn(
                            params, latent_codes, net_opt_state, code_opt_state,
                            points, sdf, jnp.asarray(batches, dtype=jnp.int32),
                        )
                    loss_values = list(np.asarray(losses))
                else:
                    for batch_index, batch in enumerate(
                        create_batches(signs, batch_size, np_rng)
                    ):
                        indices = jnp.asarray(batch, dtype=jnp.int32)
                        with profiler:
                            params, latent_codes, net_opt_state, code_opt_state, loss = step_fn(
                                params, latent_codes, net_opt_state, code_opt_state,
                                points, sdf, indices,
                            )
                        loss_values.append(float(loss))
                        if batch_index % VIEWER_UPDATE_BATCHES == 0:
                            code = latent_codes[np_rng.integers(model_count)]
                            mesh_obj = net.get_mesh(params, code, voxel_resolution=64)
                            if mesh_obj is not None:
                                viewer.set_mesh(mesh_obj)

            latent_std = float(np.std(np.asarray(latent_codes).reshape(-1)))
            print(
                f"Epoch {epoch}, {timer.duration:.1f}s "
                f"({profiler.mean_step_time * 1000:.1f} ms/step). "
                f"Loss: {np.mean(loss_values):.8f}"
            )

            checkpoints.save(params, NET_NAME, base=config.model_dir)
            checkpoints.save_array(latent_codes, LATENT_CODES_FILENAME, base=config.model_dir)
            checkpoints.save(
                {"net": net_opt_state, "codes": code_opt_state}, OPT_NAME, base=config.model_dir
            )
            checkpoints.save(params, NET_NAME, epoch=epoch, base=config.model_dir)
            checkpoints.save_array(
                latent_codes, LATENT_CODES_FILENAME, epoch=epoch, base=config.model_dir
            )
            logger.write(epoch, timer.duration, float(np.mean(loss_values)), latent_std)
    except KeyboardInterrupt:
        pass
    if viewer is not None:
        viewer.stop()
    return params, latent_codes


if __name__ == "__main__":
    train()
