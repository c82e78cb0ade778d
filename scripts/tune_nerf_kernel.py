"""Teacher field-eval kernel tuning sweep on the real chip.

Times nerf_forward_fused over 2M sample points for combinations of
tile_p / interleave / diagnostic ablations (scan-differencing methodology,
see bench.py). The diag variants produce WRONG results by construction —
they isolate where the gap to the MXU bound lives:
  nosincos    — skip the embed trig select (VPU transcendentals)
  noviews     — skip the whole view branch (feature/views/rgb matmuls)
  notranspose — skip the [T,4]->[4,T] output relayout

Usage: python scripts/tune_nerf_kernel.py [label ...]
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
from efficient_nerf_tpu.ops.pallas.nerf_forward import nerf_forward_fused

N_RAYS, S = 16384, 128   # 2M points
P = N_RAYS * S
MFLOP_PER_POINT = 1.15

model = NeRFMLP(dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 90)))["params"]
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.normal(size=(N_RAYS, S, 3)).astype(np.float32))
dirs = jnp.asarray(rng.normal(size=(N_RAYS, 3)).astype(np.float32))

VARIANTS = {
    "base_t2048": dict(tile_p=2048),
    "base_t3072": dict(tile_p=3072),
    "base_t4096": dict(tile_p=4096),
    "base_t8192": dict(tile_p=8192),
    "base_t16384": dict(tile_p=16384),
    "il1_t4096": dict(tile_p=4096, interleave=1),
    "il1_t4096_tout": dict(tile_p=4096, interleave=1, t_out=True),
    "il2_t3072_tout": dict(tile_p=3072, interleave=2, t_out=True),
    "il1_t4096_nosincos": dict(tile_p=4096, interleave=1, diag="nosincos"),
    "il1_t4096_noviews": dict(tile_p=4096, interleave=1, diag="noviews"),
    "il1_t4096_notranspose": dict(tile_p=4096, interleave=1,
                                  diag="notranspose"),
    "il1_t6144": dict(tile_p=6144, interleave=1),
    "il1_t2048": dict(tile_p=2048, interleave=1),
    "il4_t8192": dict(tile_p=8192, interleave=4),
    "il2_t4096": dict(tile_p=4096, interleave=2),
    "nosincos_t4096": dict(tile_p=4096, diag="nosincos"),
    "noviews_t4096": dict(tile_p=4096, diag="noviews"),
    "notranspose_t4096": dict(tile_p=4096, diag="notranspose"),
}


def timed(kw, n_lo=1, n_hi=3, reps=4):
    def make(n):
        @jax.jit
        def run(params, epss):
            def body(acc, eps):
                raw = nerf_forward_fused(params, pts + eps, dirs, **kw)
                return acc + jnp.sum(raw), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), epss)
            return acc
        return run
    run_lo, run_hi = make(n_lo), make(n_hi)
    float(run_lo(params, jnp.linspace(0.0, 1e-6, n_lo)))
    float(run_hi(params, jnp.linspace(0.0, 1e-6, n_hi)))

    def t(run, n):
        eps = jnp.linspace(0.0, 1e-6, n)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(run_hi, n_hi) - t(run_lo, n_lo)) / (n_hi - n_lo)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        dt = timed(VARIANTS[name])
        tf = P * MFLOP_PER_POINT * 1e6 / dt / 1e12
        print(f"{name:20s} {dt * 1e3:8.2f} ms/2M pts   {tf:6.1f} TFLOP/s",
              flush=True)
