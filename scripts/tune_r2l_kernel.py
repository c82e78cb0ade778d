"""Megakernel variant sweep on the real chip (scan-differencing timing).

Usage: python scripts/tune_r2l_kernel.py [variant ...]
Variants: default bf16ep bf16ep_il2 bf16ep_t256 bf16ep_t1024 il2
Prints one JSON line per variant: ms/frame, rays/s, max|diff| vs default.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
_CACHE = os.path.join(_ROOT, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from efficient_nerf_tpu.models import R2LNet
from efficient_nerf_tpu.ops.pallas.r2l_forward import r2l_forward_fused

n_sample, L = 16, 10
input_dim = n_sample * 3 * (2 * L + 1)
model = R2LNet(input_dim=input_dim, depth=88, width=256, dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, input_dim)))["params"]

B = 160_000
rng = np.random.default_rng(0)
rays_o = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
rays_d = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))

VARIANTS = {
    "default": dict(tile_b=512, fast_embed=False),
    "bf16ep": dict(tile_b=512, fast_embed=False, bf16_epilogue=True),
    "bf16ep_il2": dict(tile_b=512, bf16_epilogue=True, interleave=2),
    "bf16ep_t256": dict(tile_b=256, bf16_epilogue=True),
    "bf16ep_t1024": dict(tile_b=1024, bf16_epilogue=True),
    "il2": dict(tile_b=512, fast_embed=False, interleave=2),
    "fast": dict(tile_b=512, fast_embed=True),
    "fast_il2": dict(tile_b=512, fast_embed=True, interleave=2),
    "fast_t256": dict(tile_b=256, fast_embed=True),
    "fast_t1024": dict(tile_b=1024, fast_embed=True),
    # diagnostics (wrong numerics; timing only)
    "noepi": dict(tile_b=512, diag="noepi"),
    "nosincos": dict(tile_b=512, diag="nosincos"),
    "noepi_nosincos": dict(tile_b=512, diag="noepi,nosincos"),
}

names = sys.argv[1:] or list(VARIANTS)


def make_scan(n, kw):
    @jax.jit
    def run(params, rays_o, rays_d, epss):
        def body(acc, eps):
            rgb = r2l_forward_fused(params, rays_o + eps, rays_d, 2.0, 6.0,
                                    n_sample, L, **kw)
            return acc + jnp.sum(rgb), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), epss)
        return acc
    return run


def timed(run, eps, reps=6):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(params, rays_o, rays_d, eps))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# reference output for numerical deviation (small batch, default variant)
small_o, small_d = rays_o[:4096], rays_d[:4096]
ref_small = np.asarray(r2l_forward_fused(params, small_o, small_d, 2.0, 6.0,
                                         n_sample, L, tile_b=512,
                                         fast_embed=False))

for name in names:
    kw = VARIANTS[name]
    try:
        got_small = np.asarray(r2l_forward_fused(params, small_o, small_d,
                                                 2.0, 6.0, n_sample, L, **kw))
        maxdiff = float(np.abs(got_small - ref_small).max())
        n_lo, n_hi = 1, 4
        run_lo, run_hi = make_scan(n_lo, kw), make_scan(n_hi, kw)
        eps_lo = jnp.linspace(0.0, 1e-6, n_lo)
        eps_hi = jnp.linspace(0.0, 1e-6, n_hi)
        float(run_lo(params, rays_o, rays_d, eps_lo))
        float(run_hi(params, rays_o, rays_d, eps_hi))
        dt = (timed(run_hi, eps_hi) - timed(run_lo, eps_lo)) / (n_hi - n_lo)
        print(json.dumps({"variant": name, "ms_per_frame": round(dt * 1e3, 2),
                          "rays_per_s": round(B / dt / 1e6, 2),
                          "maxdiff_vs_default": round(maxdiff, 6)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name,
                          "error": f"{type(e).__name__}: {str(e)[:200]}"}),
              flush=True)
