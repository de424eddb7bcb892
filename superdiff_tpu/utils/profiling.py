"""Profiling + debug toggles (SURVEY.md §5.1-5.2: absent in the reference).

- :func:`trace` — ``jax.profiler`` trace context writing a Perfetto-
  compatible dump into the run dir (TensorBoard's profile plugin reads it).
- :func:`timed` — ``block_until_ready`` wall-clock timing helper, the
  honest way to time async dispatch.
- :func:`enable_debug_checks` — NaN debugging (``jax_debug_nans``) and
  disabled-rematerialization determinism toggles, exposed through the CLI
  as ``--set``-able config the way the reference never had.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Profile everything inside the context into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, warmup: int = 1, iters: int = 3,
          **kwargs) -> Tuple[float, object]:
    """Run ``fn`` with proper device synchronization; returns
    ``(seconds_per_call, last_result)``."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    tic = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return (time.perf_counter() - tic) / iters, result


def enable_debug_checks(nans: bool = True, infs: bool = False) -> None:
    """Turn on jit-compatible NaN/Inf detection (reruns the offending op
    un-jitted to locate it). Expensive; for debugging runs only."""
    if nans:
        jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)


def set_deterministic(enabled: bool = True) -> None:
    """Bit-determinism: disable autotuning-dependent reductions.

    XLA:TPU is deterministic by default for this workload; this pins the
    flags that could introduce run-to-run variance (notably scatter/reduce
    determinism on some backends).
    """
    import os

    if enabled:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_gpu_deterministic_ops" not in flags:  # harmless on TPU/CPU
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_gpu_deterministic_ops=true").strip()
