"""Profiling hooks (SURVEY.md §5.1): jax.profiler traces + step timing."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/megalania_trace"):
    """Capture a jax.profiler trace around the annealing hot loop."""
    with jax.profiler.trace(log_dir):
        yield log_dir


@contextlib.contextmanager
def step_timer(name: str, sink=None):
    """Wall-time a device computation (blocks on ready)."""
    t0 = time.time()
    holder = {}
    try:
        yield holder
    finally:
        if "result" in holder:
            jax.block_until_ready(holder["result"])
        dt = time.time() - t0
        record = {"name": name, "seconds": round(dt, 4)}
        if sink is not None:
            sink.log(**record)
        holder["seconds"] = dt


def annotate(name: str):
    """Named region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
