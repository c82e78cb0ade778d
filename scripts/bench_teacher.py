"""Teacher 400x400 frame render timing on the real chip.

Variants: xla (fused_teacher off), fused (Pallas kernel), each with the
bitonic z-merge now in render_rays. Scan-differencing methodology from
bench.py (cancels the ~30ms tunnel round trip).
"""
import os, sys, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from efficient_nerf_tpu.models import NeRFMLP
from efficient_nerf_tpu.render.renderer import RenderConfig, render_image
from efficient_nerf_tpu.core.poses import pose_spherical
import dataclasses

H = W = 400
focal = 555.0
model = NeRFMLP(dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 90)))["params"]

cfg = RenderConfig(n_samples=64, n_importance=128, white_bkgd=True).eval_mode()
# xla: no Pallas at all; composed: field-eval kernel + standalone sampler +
# XLA glue; frame: the whole-ray megakernel dispatch (tuned tiling);
# int8: the W8A8 field-eval serving mode (--teacher_quant int8, r5)
variant = sys.argv[1] if len(sys.argv) > 1 else "composed"
cfg = dataclasses.replace(
    cfg, fused_teacher=(variant != "xla"),
    frame_fused=(variant == "frame"),
    teacher_quant=("int8" if variant == "int8" else ""),
    frame_tile_r=256, frame_eval_chunks=4)

c2w = jnp.asarray(pose_spherical(30.0, -30.0, 4.0)[:3, :4])

def frame(params, c2w):
    res = render_image(model, params, params, H, W, focal, c2w, cfg)
    return jnp.sum(res.rgb)

def make_scan(n):
    @jax.jit
    def run(params, c2w, epss):
        def body(acc, eps):
            return acc + frame(params, c2w + eps), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), epss)
        return acc
    return run

n_lo, n_hi = 1, 4
run_lo, run_hi = make_scan(n_lo), make_scan(n_hi)
eps_lo = jnp.linspace(0.0, 1e-6, n_lo)[:, None, None]
eps_hi = jnp.linspace(0.0, 1e-6, n_hi)[:, None, None]
t0 = time.time()
float(run_lo(params, c2w, eps_lo)); print("compile lo", time.time()-t0, flush=True)
t0 = time.time()
float(run_hi(params, c2w, eps_hi)); print("compile hi", time.time()-t0, flush=True)

def timed(run, eps, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(params, c2w, eps))
        ts.append(time.perf_counter() - t0)
    return min(ts)

dt = (timed(run_hi, eps_hi) - timed(run_lo, eps_lo)) / (n_hi - n_lo)
print(json.dumps({"variant": variant, "ms_per_frame": round(dt*1000, 1)}))
