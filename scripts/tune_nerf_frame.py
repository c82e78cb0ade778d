"""Whole-frame fused teacher kernel sweep on the real chip.

Times nerf_render_rays_fused over a 400x400-frame-worth of rays (160k) for
tile_r / eval_chunks combinations and stage-skip diagnostics
(scan-differencing methodology, see bench.py).

Usage: python scripts/tune_nerf_frame.py [label ...]
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

from efficient_nerf_tpu.models import NeRFMLP
from efficient_nerf_tpu.ops.pallas.nerf_frame import nerf_render_rays_fused

N, SC, SF = 160000, 64, 128

model = NeRFMLP(dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 90)))["params"]
rng = np.random.default_rng(0)
o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
d = jnp.asarray((rng.normal(size=(N, 3)) * 0.2
                 + np.array([0, 0, -1.0])).astype(np.float32))
vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

VARIANTS = {
    "t32_c1": dict(tile_r=32, eval_chunks=1),
    "t64_c1": dict(tile_r=64, eval_chunks=1),
    "t64_c2": dict(tile_r=64, eval_chunks=2),
    "t96_c3": dict(tile_r=96, eval_chunks=3),
    "t128_c2": dict(tile_r=128, eval_chunks=2),
    "t128_c4": dict(tile_r=128, eval_chunks=4),
    "t256_c4": dict(tile_r=256, eval_chunks=4),
    "t64_c2_nofine": dict(tile_r=64, eval_chunks=2, diag="nofine"),
    "t64_c2_nopdf": dict(tile_r=64, eval_chunks=2, diag="nopdf"),
    "t64_c2_nointerp": dict(tile_r=64, eval_chunks=2, diag="nointerp"),
    "t64_c2_nomerge": dict(tile_r=64, eval_chunks=2, diag="nomerge"),
    "t64_c2_noscan": dict(tile_r=64, eval_chunks=2, diag="noscan"),
    "t64_c2_nim": dict(tile_r=64, eval_chunks=2, diag="nointerp nomerge"),
    "t32_c1_nofine": dict(tile_r=32, eval_chunks=1, diag="nofine"),
    # compile bisect: which stage explodes the register allocator
    "t32_nofine_nointerp_nomerge": dict(
        tile_r=32, diag="nofine nointerp nomerge"),
    "t32_noscan": dict(tile_r=32, diag="noscan"),
    "t32_nomerge": dict(tile_r=32, diag="nomerge"),
    "t32_nointerp_nomerge": dict(tile_r=32, diag="nointerp nomerge"),
}


def timed(kw, n_lo=1, n_hi=3, reps=4):
    def make(n):
        @jax.jit
        def run(params, o, d, vd, epss):
            def body(acc, eps):
                r = nerf_render_rays_fused(params, None, o + eps, d, vd,
                                           2., 6., SC, SF, 10, 4,
                                           white_bkgd=True, **kw)
                r0 = r if isinstance(r, jnp.ndarray) else r[0]
                return acc + jnp.sum(r0), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), epss)
            return acc
        return run

    r_lo, r_hi = make(n_lo), make(n_hi)
    e_lo = jnp.linspace(0.0, 1e-6, n_lo)
    e_hi = jnp.linspace(0.0, 1e-6, n_hi)
    float(r_lo(params, o, d, vd, e_lo))
    float(r_hi(params, o, d, vd, e_hi))

    def t(run, eps):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params, o, d, vd, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(r_hi, e_hi) - t(r_lo, e_lo)) / (n_hi - n_lo)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        try:
            dt = timed(VARIANTS[name])
            print(f"{name:16s} {dt * 1e3:8.1f} ms / 160k rays", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s} FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]}", flush=True)
