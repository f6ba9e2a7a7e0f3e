"""Utilities: checkpointing, config/CLI, metrics, profiling."""

from dxvae_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    import_torch_state_dict,
)
from dxvae_tpu.utils.config import TrainConfig
from dxvae_tpu.utils.metrics import MetricsLogger

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "import_torch_state_dict",
    "TrainConfig",
    "MetricsLogger",
]
