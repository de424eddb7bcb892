from superdiff_tpu.utils.env import (
    is_cluster, set_global_seeds, resolve_paths, RunPaths,
    host_init)
from superdiff_tpu.utils.logger import init_logger
from superdiff_tpu.utils.metrics import MetricsLogger

__all__ = ["is_cluster", "set_global_seeds", "resolve_paths", "RunPaths",
           "init_logger", "MetricsLogger", "host_init"]
