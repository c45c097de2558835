"""Structured configuration with the reference CLI vocabulary preserved.

The reference mixes three flag styles (SURVEY.md §5 "Config / flag system"):
bare ``sys.argv`` membership tokens (``continue``, ``nogui``, ``show_slice``,
``verbose``, ``classic``), hand-rolled ``name=value`` pairs
(``iteration=N``, ``epochs=N`` in the progressive trainer), and argparse
(``--category`` in the point-GAN scripts). :func:`parse_cli` accepts all
three styles at once so every reference command line keeps working, and feeds
one dataclass that the trainers consume.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Any, Dict, List, Optional


@dataclasses.dataclass
class TrainConfig:
    # reference boolean vocabulary
    resume: bool = False          # 'continue'
    nogui: bool = True            # viewer off by default on headless TPU hosts
    show_slice: bool = False
    verbose: bool = False
    classic: bool = False         # AE vs VAE
    # reference name=value vocabulary
    iteration: int = 0            # progressive growth iteration
    epochs: Optional[int] = None
    # argparse vocabulary
    category: str = "chairs"
    # framework extensions
    cpu: bool = False             # force the CPU backend (see parse_cli)
    synthetic: int = 0            # train on N synthetic analytic shapes (no dataset needed)
    batch_size: Optional[int] = None
    data_dir: str = "data"
    model_dir: str = "models"
    plot_dir: str = "plots"
    device_mesh: Optional[str] = None  # e.g. "4x2" -> data=4, points=2
    seed: int = 0
    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)


_BOOL_TOKENS = {
    "continue": "resume",
    "nogui": "nogui",
    "gui": ("nogui", False),
    "show_slice": "show_slice",
    "verbose": "verbose",
    "classic": "classic",
    "cpu": "cpu",
    "synthetic": ("synthetic", 50),
}

_INT_KEYS = {"iteration", "epochs", "synthetic", "batch_size", "seed"}


def parse_cli(argv: Optional[List[str]] = None, **defaults) -> TrainConfig:
    """Parse reference-style CLI tokens into a TrainConfig.

    Accepted forms: bare tokens (``continue``, ``nogui`` …), ``name=value``
    pairs (``iteration=2``), and ``--name value`` / ``--name=value`` flags.
    """
    if argv is None:
        argv = sys.argv[1:]
    cfg = TrainConfig(**defaults)

    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg.startswith("--"):
            body = arg[2:]
            if "=" in body:
                key, value = body.split("=", 1)
            elif i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                key, value = body, argv[i + 1]
                i += 1
            else:
                key, value = body, "true"
            _assign(cfg, key.replace("-", "_"), value)
        elif "=" in arg:
            key, value = arg.split("=", 1)
            _assign(cfg, key.replace("-", "_"), value)
        elif arg in _BOOL_TOKENS:
            target = _BOOL_TOKENS[arg]
            if isinstance(target, tuple):
                setattr(cfg, target[0], target[1])
            else:
                setattr(cfg, target, True)
        else:
            cfg.extras[arg] = True
        i += 1
    if cfg.cpu:
        _force_cpu_backend()
    return cfg


def _force_cpu_backend() -> None:
    """Pin jax to the CPU backend, as a parse_cli side effect of the ``cpu``
    token. Must run before the first backend touch: on hosts whose
    sitecustomize force-selects an accelerator platform (e.g. the remote-TPU
    tunnel), the JAX_PLATFORMS env var alone is overridden, and a dead
    tunnel hangs the first jax.devices() call forever — ``cpu`` is the
    escape hatch that keeps every trainer CLI runnable anywhere. A no-op
    (with a warning) if a backend is already initialized."""
    import jax

    try:
        from jax._src import xla_bridge

        initialized = bool(xla_bridge._backends)
    except Exception:
        initialized = False
    if initialized and jax.default_backend() != "cpu":
        print("config: 'cpu' requested but a JAX backend is already "
              "initialized; flag ignored", file=sys.stderr)
        return
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _assign(cfg: TrainConfig, key: str, value: str) -> None:
    if key == "continue":
        key = "resume"
    if not hasattr(cfg, key):
        cfg.extras[key] = _coerce(key, value)
        return
    if key in _INT_KEYS:
        setattr(cfg, key, int(value))
    elif isinstance(getattr(cfg, key), bool):
        setattr(cfg, key, value.lower() in ("1", "true", "yes"))
    else:
        setattr(cfg, key, value)


def _coerce(key: str, value: str):
    try:
        return int(value)
    except ValueError:
        try:
            return float(value)
        except ValueError:
            return value
