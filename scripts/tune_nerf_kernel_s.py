"""Field-eval kernel sweep at the PRODUCTION sample counts (r5).

The standalone sweep (tune_nerf_kernel.py) probes S=128; the frame runs
S=64 (coarse) and S=192 (fine, 64+128 merged). jax 0.9 moved the optimum
from interleave=1 (r2 default, 153 TF/s then, 120 now) to interleave=2
(151.6 TF/s) at S=128 — this validates the same holds at the real shapes
before changing the production default.

Usage: python scripts/tune_nerf_kernel_s.py [S:tile_p:interleave ...]
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

MFLOP_PER_POINT = 1.15

model = NeRFMLP(dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 90)))["params"]
rng = np.random.default_rng(0)


def timed(S, tile_p, interleave, n_pts=2_000_000):
    """Shared scan-differencing harness (utils/benchmark.scan_thunk_time) —
    one implementation, with a trimmed-core spread bar instead of the
    single-estimate form that mislead the first r5 sweep (PERF.md)."""
    from efficient_nerf_tpu.utils.benchmark import scan_thunk_time

    n_rays = n_pts // S
    P = n_rays * S
    # production interface: channel-major [3, N, S] points
    pts = jnp.asarray(rng.normal(size=(3, n_rays, S)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(n_rays, 3)).astype(np.float32))

    def fn(params, eps):
        return nerf_forward_fused(params, pts + eps, dirs, cm=True,
                                  tile_p=tile_p, interleave=interleave)

    dt, spread = scan_thunk_time(fn, params, n_lo=1, n_hi=3, k=3,
                                 max_extra_rounds=0)
    return dt, spread, P


if __name__ == "__main__":
    specs = sys.argv[1:] or [
        "64:4096:1", "64:4096:2", "64:2048:2", "64:8192:2",
        "192:4096:1", "192:4096:2", "192:3072:2", "192:6144:2",
    ]
    for spec in specs:
        S, tp, il = (int(v) for v in spec.split(":"))
        dt, spread, P = timed(S, tp, il)
        tf = P * MFLOP_PER_POINT * 1e6 / dt / 1e12
        print(f"S={S:3d} tile_p={tp:5d} il={il}  {dt * 1e3:7.2f} ms/2M pts"
              f"   {tf:6.1f} TFLOP/s  (core spread {spread:.1f}%)",
              flush=True)
