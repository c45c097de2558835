"""Checkpointing with the reference's save/load semantics.

The reference's ``SavableModule`` protocol (/root/reference/model/__init__.py:20-43):
  * a mutable "latest" slot ``models/<name>.to`` written every epoch,
  * immutable snapshots ``models/checkpoints/<name>-epoch-%05d.to``,
  * tolerant ``strict=False`` restore (progressive growth loads partial
    states), and
  * the DeepSDF latent table saved as a separate artifact.

We keep those semantics for arbitrary JAX pytrees, stored as ``.npz`` files
keyed by flattened tree paths. Unlike the reference, optimizer state CAN be
checkpointed too (the reference silently resets Adam/RMSprop moments on
resume — SURVEY.md §5); trainers save it alongside params.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np

MODEL_PATH = "models"
# Bundled demo checkpoints (fp16, optimizer state stripped) so the demos run
# on a fresh clone — the reference ships pretrained generators the same way
# (/root/reference/examples/gan_generator_voxels_*.to, README.md:75-78).
# Only ``load``/``load_array`` fall back here (never ``exists``), so trainer
# resume logic is unaffected: trainers probe ``exists`` first and start
# fresh when the user has no checkpoint of their own.
EXAMPLES_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples")


def _example_fallback(name: str, epoch: Optional[int], base: Optional[str]) -> Optional[str]:
    """Bundled-example path to use instead, or None."""
    if epoch is not None or (base or MODEL_PATH) != MODEL_PATH:
        return None  # explicit snapshot/base requests never silently switch
    candidate = os.path.join(EXAMPLES_PATH, f"{name}.npz")
    if os.path.exists(candidate):
        print(f"checkpoint models/{name}.npz not found; using bundled example "
              f"{candidate} (run make_examples.py or a trainer to replace it)")
        return candidate
    return None


def checkpoint_dir(base: Optional[str] = None) -> str:
    return os.path.join(base or MODEL_PATH, "checkpoints")


def get_filename(name: str, epoch: Optional[int] = None, base: Optional[str] = None) -> str:
    """models/<name>.npz or models/checkpoints/<name>-epoch-00042.npz."""
    base = base or MODEL_PATH
    if epoch is None:
        return os.path.join(base, f"{name}.npz")
    return os.path.join(checkpoint_dir(base), f"{name}-epoch-{epoch:05d}.npz")


def _flatten(tree: Any) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(entry) -> str:
    if isinstance(entry, jax.tree_util.DictKey):
        return str(entry.key)
    if isinstance(entry, jax.tree_util.SequenceKey):
        return str(entry.idx)
    if isinstance(entry, jax.tree_util.GetAttrKey):
        return str(entry.name)
    return re.sub(r"[^\w.-]", "", str(entry))


def save(tree: Any, name: str, epoch: Optional[int] = None, base: Optional[str] = None) -> str:
    """Save a pytree to the latest slot (epoch=None) or an epoch snapshot."""
    path = get_filename(name, epoch, base)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **_flatten(tree))
    os.replace(tmp, path)
    return path


def load(template: Any, name: str, epoch: Optional[int] = None, base: Optional[str] = None, strict: bool = False) -> Any:
    """Restore a pytree shaped like ``template`` from a checkpoint.

    With ``strict=False`` (the reference default, model/__init__.py:38)
    missing keys keep the template's value and extra keys are ignored —
    this is what makes progressive-growth warm starts work.
    """
    path = get_filename(name, epoch, base)
    if not os.path.exists(path):
        path = _example_fallback(name, epoch, base) or path
    with np.load(path) as data:
        stored = {k: data[k] for k in data.files}

    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    used = set()
    for path_entries, leaf in leaves_with_path:
        key = "/".join(_path_str(p) for p in path_entries)
        if key in stored:
            value = stored[key]
            if strict and tuple(value.shape) != tuple(np.shape(leaf)):
                raise ValueError(f"shape mismatch for {key}: {value.shape} vs {np.shape(leaf)}")
            new_leaves.append(value.astype(np.asarray(leaf).dtype))
            used.add(key)
        else:
            if strict:
                raise KeyError(f"checkpoint {path} is missing key {key}")
            new_leaves.append(leaf)
    if strict and used != set(stored):
        raise KeyError(f"checkpoint {path} has unused keys: {sorted(set(stored) - used)}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def exists(name: str, epoch: Optional[int] = None, base: Optional[str] = None) -> bool:
    return os.path.exists(get_filename(name, epoch, base))


def save_array(array, name: str, epoch: Optional[int] = None, base: Optional[str] = None) -> str:
    """Standalone array artifact (the latent-code table convention:
    /root/reference/train_sdf_autodecoder.py:108-111)."""
    return save({"array": np.asarray(array)}, name, epoch, base)


def load_array(name: str, epoch: Optional[int] = None, base: Optional[str] = None) -> np.ndarray:
    path = get_filename(name, epoch, base)
    from_example = False
    if not os.path.exists(path):
        fallback = _example_fallback(name, epoch, base)
        if fallback is not None:
            path, from_example = fallback, True
    with np.load(path) as data:
        array = data["array"]
    if from_example and array.dtype == np.float16:
        # Bundled examples may be fp16-compressed; ``load`` casts back to the
        # template dtype but arrays have no template, so restore fp32 here.
        array = array.astype(np.float32)
    return array
