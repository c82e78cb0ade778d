"""Standalone det inverse-CDF sampler timing at frame scale on the chip.

Compares the rotate-based and masked-reduce interval loops
(ops/pallas/sample_pdf.py use_roll) at the flagship shapes
(160k rays, 63 bins -> 128 levels), scan-differencing methodology.

Usage: python scripts/bench_sample_pdf.py [tile_n ...]
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from efficient_nerf_tpu.ops.pallas.sample_pdf import sample_pdf_det_fused

N, C, SF = 160_000, 63, 128
rng = np.random.default_rng(0)
bins = jnp.asarray(np.sort(rng.uniform(2.0, 6.0, size=(N, C)).astype(np.float32), -1))
w = jnp.asarray(rng.uniform(size=(N, C - 1)).astype(np.float32))


def timed(use_roll, tile_n, n_lo=1, n_hi=5, reps=4):
    def make(n):
        @jax.jit
        def run(bins, w, epss):
            def body(acc, eps):
                z = sample_pdf_det_fused(bins, w + eps, SF, tile_n=tile_n,
                                         use_roll=use_roll)
                return acc + jnp.sum(z), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), epss)
            return acc
        return run

    r_lo, r_hi = make(n_lo), make(n_hi)
    e_lo = jnp.linspace(0.0, 1e-6, n_lo)
    e_hi = jnp.linspace(0.0, 1e-6, n_hi)
    float(r_lo(bins, w, e_lo))
    float(r_hi(bins, w, e_hi))

    def t(run, eps):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(bins, w, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(r_hi, e_hi) - t(r_lo, e_lo)) / (n_hi - n_lo)


if __name__ == "__main__":
    tiles = [int(a) for a in sys.argv[1:]] or [1024]
    for tile_n in tiles:
        for use_roll in (True, False):
            try:
                dt = timed(use_roll, tile_n)
                print(f"tile{tile_n} roll={int(use_roll)} "
                      f"{dt * 1e3:8.2f} ms / 160k rays", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"tile{tile_n} roll={int(use_roll)} FAIL "
                      f"{type(e).__name__}: {str(e).splitlines()[0][:80]}",
                      flush=True)
