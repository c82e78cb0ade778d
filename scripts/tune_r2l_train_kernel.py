"""In-kernel train-step attack (r5): tile_b sweep + fwd/bwd split timing.

The r4 attribution left the 25.45-vs-20.5 ms step gap INSIDE the fused
fwd+bwd kernels (docs/PERF.md). This sweep times the fused apply's forward
and forward+backward separately at the reference batch for several ray-tile
sizes under jax 0.9's Mosaic, isolating where the in-kernel time goes:

  fwd only        — forward kernel incl. the 44 bf16 residual stores
  fwd+bwd         — grad through the custom VJP (both kernels)

Scan-differencing methodology from bench.py (the state is threaded so the
steps serialize; the fixed tunnel round trip cancels).

Usage: python scripts/tune_r2l_train_kernel.py [tile_b ...]
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

from efficient_nerf_tpu.models import R2LNet
from efficient_nerf_tpu.ops.pallas.r2l_train import r2l_train_apply

n_sample, L = 16, 10
K = n_sample * 3                      # 48 raw coords; kernel embeds (fast)
input_dim = K * (2 * L + 1)
B = 20 * 4096 + 16384                 # reference batch + appended hard rays

model = R2LNet(input_dim=input_dim, depth=88, width=256, dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, input_dim)))["params"]

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))


def timed(fn, n_lo=1, n_hi=3):
    """Shared scan-differencing harness (utils/benchmark.scan_thunk_time)."""
    from efficient_nerf_tpu.utils.benchmark import scan_thunk_time

    dt, _spread = scan_thunk_time(lambda p, eps: fn(p, x + eps), params,
                                  n_lo=n_lo, n_hi=n_hi, k=3,
                                  max_extra_rounds=0)
    return dt


def fwd_fn(tile_b, tile_b_bwd):
    def fn(params, xi):
        out = r2l_train_apply(params, xi, tile_b=tile_b,
                              tile_b_bwd=tile_b_bwd, embed_L=L,
                              need_dx=False)
        return jnp.sum(out)
    return fn


def fwdbwd_fn(tile_b, tile_b_bwd):
    def fn(params, xi):
        def loss(p):
            out = r2l_train_apply(p, xi, tile_b=tile_b,
                                  tile_b_bwd=tile_b_bwd, embed_L=L,
                                  need_dx=False)
            return jnp.sum(out ** 2)
        g = jax.grad(loss)(params)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
    return fn


if __name__ == "__main__":
    # spec: "512" (uniform) or "512:1024" (fwd:bwd split)
    specs = sys.argv[1:] or ["256", "512", "1024", "2048"]
    for spec in specs:
        parts = [int(v) for v in spec.split(":")]
        tb, tbb = parts[0], parts[-1]
        f = timed(fwd_fn(tb, tbb)) * 1e3
        fb = timed(fwdbwd_fn(tb, tbb)) * 1e3
        print(f"tile_b={tb:5d}/bwd={tbb:5d}  fwd {f:7.2f} ms   "
              f"fwd+bwd {fb:7.2f} ms   bwd~{fb - f:7.2f} ms", flush=True)
