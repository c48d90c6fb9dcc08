"""Tracing / profiling subsystem (SURVEY.md §5: the reference has only
thop FLOPs + cuda.synchronize timing; the TPU-native replacements are
jax.profiler traces and XLA cost analysis)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/vmg_trace"):
    """Capture a TensorBoard-viewable device trace for the enclosed block."""
    with jax.profiler.trace(logdir):
        yield logdir


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


def timed(fn: Callable, *args, iters: int = 3, warmup: int = 2):
    """Wall-clock a jitted function with a true completion fence (a host
    scalar fetch -- block_until_ready can report early on tunneled
    runtimes).  Returns seconds per call."""

    def fence(o):
        leaf = jax.tree.leaves(o)[0]
        return float(leaf.ravel()[0])

    for _ in range(warmup):
        fence(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / iters


def compiled_stats(fn: Callable, *example_args) -> dict:
    """FLOPs / memory traffic / peak memory from XLA's compiled analysis."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    out = {k: costs[k] for k in ("flops", "bytes accessed") if k in costs}
    try:
        mem = compiled.memory_analysis()
        out["peak_memory_bytes"] = getattr(mem, "temp_size_in_bytes", None)
    except Exception:
        pass
    return out
