from hybrid_ode_tpu.utils.config import load_config, default_config, merge_cli_overrides
from hybrid_ode_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from hybrid_ode_tpu.utils.logging import MetricsLogger
from hybrid_ode_tpu.utils.profiling import Throughput, debug_mode, trace

__all__ = [
    "load_config",
    "default_config",
    "merge_cli_overrides",
    "save_checkpoint",
    "load_checkpoint",
    "MetricsLogger",
    "Throughput",
    "debug_mode",
    "trace",
]
