"""Scan-differencing throughput measurement for the tunneled TPU plugin.

Measured device quirks this methodology exists for (docs/PERF.md):
  * `block_until_ready` does not reliably synchronize through the tunnel;
    the only trustworthy completion barrier is fetching a scalar that
    data-depends on every output element;
  * a host<->device round trip costs ~30 ms — 3x a 10 ms frame — so
    per-rep fetches would swamp the signal. Instead, n frames render
    inside ONE jitted lax.scan whose per-frame inputs differ (a per-frame
    eps offset, so no result caching / CSE can elide work), reduced to a
    single scalar; the fixed round-trip cost cancels by differencing two
    scan lengths;
  * clock boost windows and tunnel hiccups contaminate individual
    estimates (BENCH_r04: one of three bf16 estimates landed ~20% off
    while int8's sat at 2.7%) — so k independent estimates are drawn,
    the extremes trimmed, and the spread of the surviving core reported;
    if the core is still noisy, more estimates are drawn adaptively.

Both the repo-root bench.py and the CLI --benchmark mode
(reference main.py:1124-1133) share this one implementation.
"""
from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["scan_frame_time", "scan_thunk_time"]


def scan_thunk_time(
    fn: Callable,
    params,
    *,
    n_lo: int = 1,
    n_hi: int = 6,
    reps: int = 4,
    k: int = 5,
    keep: int = 3,
    target_spread_pct: float = 5.0,
    max_extra_rounds: int = 2,
    log=None,
) -> Tuple[float, float]:
    """Seconds per fn(params, eps) call, with a trimmed-core spread bar.

    fn must be a pure jit-traceable (params, eps scalar) -> array whose
    work depends on eps (so per-iteration results cannot be cached/CSE'd).
    This is the one scan-differencing implementation; scan_frame_time and
    the kernel-tuning scripts are thin closures over it.
    """

    def make_scan(n):
        @jax.jit
        def run(params, epss):
            def body(acc, eps):
                return acc + jnp.sum(fn(params, eps)), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), epss)
            return acc

        return run

    run_lo, run_hi = make_scan(n_lo), make_scan(n_hi)
    eps_lo = jnp.linspace(0.0, 1e-6, n_lo)
    eps_hi = jnp.linspace(0.0, 1e-6, n_hi)
    float(run_lo(params, eps_lo))  # compile
    float(run_hi(params, eps_hi))

    def timed(run, eps):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params, eps))  # scalar fetch = completion barrier
            ts.append(time.perf_counter() - t0)
        # min: the contention-free floor (differencing medians was noisy)
        return min(ts)

    def one_estimate():
        return (timed(run_hi, eps_hi) - timed(run_lo, eps_lo)) / (n_hi - n_lo)

    def core_of(ds, keep_n):
        ds = sorted(ds)
        lo = (len(ds) - keep_n) // 2
        core = ds[lo:lo + keep_n]
        med = core[len(core) // 2]
        spread = 100.0 * (core[-1] - core[0]) / med
        return med, spread

    ds = [one_estimate() for _ in range(k)]
    med, spread = core_of(ds, keep)
    extra = 0
    while spread > target_spread_pct and extra < max_extra_rounds:
        # noisy core: widen the sample, keep proportionally more of the
        # middle — outliers (boost windows, tunnel stalls) fall off the ends
        extra += 1
        if log:
            log(f"[bench] core spread {spread:.1f}% > "
                f"{target_spread_pct}%: drawing {k} more estimates")
        ds.extend(one_estimate() for _ in range(k))
        med, spread = core_of(ds, keep + extra * (k - keep))
    return med, spread


def scan_frame_time(render: Callable, params, rays_o, rays_d,
                    **kw) -> Tuple[float, float]:
    """Seconds per render(params, rays_o, rays_d) call, with a spread bar.

    render must be a pure jit-traceable function of (params, rays_o,
    rays_d) -> array; inputs are varied per scan iteration by an eps
    offset on rays_o. Returns (seconds_per_frame, spread_pct) — see
    scan_thunk_time for the methodology."""
    return scan_thunk_time(
        lambda p, eps: render(p, rays_o + eps, rays_d), params, **kw)
