"""Tracing / profiling utilities.

Rebuild of the reference's ``utils.benchmark`` decorator (utils.py:61-86):
wall-clock timing with nested indentation and a global toggle, with
``jax.block_until_ready`` taking the place of ``torch.cuda.synchronize``.
Also exposes a context manager around ``jax.profiler`` for device traces.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable

import jax


def benchmark(f: Callable) -> Callable:
    """Print the wall time of each call (nested-indent aware).

    Toggle globally with ``benchmark.enabled = True/False`` — wired to the
    ``benchmark`` config key like the reference (run_mapping.py:219).
    Synchronizes the device around the call so times are honest.
    """

    @functools.wraps(f)
    def wrapper(*args, **kwargs):
        if not benchmark.enabled:
            return f(*args, **kwargs)
        benchmark.indent += 1
        try:
            (jax.device_put(0.0) + 0).block_until_ready()  # drain queue
            t1 = time.time()
            result = f(*args, **kwargs)
            jax.block_until_ready(result) if _is_blockable(result) else None
            t2 = time.time()
        finally:
            benchmark.indent -= 1
        print(f"{'  ' * benchmark.indent}{f.__name__} finished in {t2 - t1:.4f}")
        return result

    return wrapper


def _is_blockable(x) -> bool:
    try:
        jax.tree_util.tree_leaves(x)
        return True
    except Exception:
        return False


benchmark.enabled = False
benchmark.indent = 0


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace around a code block
    (TPU equivalent of torch.cuda profiling; view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputTracker:
    """Optimization-time accounting (reference run_mapping.py:1225-1251):
    accumulates per-frame optimization seconds, excluding logging, and
    derives fps/spf estimates."""

    def __init__(self) -> None:
        self.total_seconds = 0.0
        self.frames = 0

    def add_frame(self, seconds: float) -> None:
        self.total_seconds += seconds
        self.frames += 1

    @property
    def fps_estimate(self) -> float:
        return self.frames / self.total_seconds if self.total_seconds else 0.0

    @property
    def spf_estimate(self) -> float:
        return self.total_seconds / self.frames if self.frames else 0.0
