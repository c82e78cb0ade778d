"""Profiling / tracing utilities.

TPU-native replacements for the reference's manual
torch.cuda.synchronize()+time.time() brackets and
torch.utils.benchmark.Timer (SURVEY.md section 5): jax.profiler traces,
compiled-cost FLOP queries, and a completion-barrier timer that works on
asynchronous (including tunneled) device plugins.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["trace", "compiled_cost", "time_fn", "DeviceTimer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a TensorBoard-viewable device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """XLA cost analysis (flops / bytes accessed) of fn(*args).

    The analytic models/flops.py numbers are the *architecture's* cost; this
    is what the compiled program actually does (post-fusion).
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        analysis = compiled.cost_analysis()
    except Exception:
        return {}
    if isinstance(analysis, list):  # one entry per device program
        analysis = analysis[0] if analysis else {}
    return dict(analysis or {})


def _barrier(x):
    """Force completion in a way that survives lazy device plugins:
    fetch a scalar that depends on the output."""
    leaves = jax.tree_util.tree_leaves(x)
    if not leaves:
        return
    s = sum(jnp.sum(l) for l in leaves if hasattr(l, "dtype"))
    float(s)


def time_fn(fn: Callable, *args, reps: int = 5, warmup: int = 2,
            **kwargs) -> float:
    """Median wall-clock seconds per call with real completion barriers."""
    for _ in range(warmup):
        _barrier(fn(*args, **kwargs))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _barrier(fn(*args, **kwargs))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


class DeviceTimer:
    """Accumulating section timer with completion barriers.

    with timer.section("forward"): ...
    timer.summary() -> {"forward": (total_s, calls)}
    """

    def __init__(self):
        self._acc: Dict[str, list] = {}

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                _barrier(result)
            self._acc.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, tuple]:
        return {k: (sum(v), len(v)) for k, v in self._acc.items()}
