"""Framework core: configuration + reference-compatible CLI."""

from shapegan_tpu.core.config import TrainConfig, parse_cli  # noqa: F401
