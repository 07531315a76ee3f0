from hybrid_ode_tpu.utils.config import load_config, default_config, merge_cli_overrides
from hybrid_ode_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from hybrid_ode_tpu.utils.logging import MetricsLogger

__all__ = [
    "load_config",
    "default_config",
    "merge_cli_overrides",
    "save_checkpoint",
    "load_checkpoint",
    "MetricsLogger",
]
