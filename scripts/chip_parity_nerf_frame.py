"""On-chip parity probe for the whole-ray teacher kernel (nerf_frame.py).

Runs the flagship profile (W256 D8x256-style teacher, 64+128 samples) on the
real TPU and compares nerf_render_rays_fused against BOTH the fast-embed
composed path and the exact-embed XLA path. The interpret-mode twin of this
check lives in tests/test_ops.py::test_nerf_frame_fused_matches_render_rays;
this script is the hardware run (Mosaic lowering, bf16 weights, real roll/
scan lane ops). Output is recorded in docs/PERF.md.

Usage: python scripts/chip_parity_nerf_frame.py
"""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from efficient_nerf_tpu.models import NeRFMLP
from efficient_nerf_tpu.ops.pallas.nerf_frame import nerf_render_rays_fused
from efficient_nerf_tpu.render import RenderConfig, render_rays

model = NeRFMLP(dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 90)))["params"]
rng = np.random.default_rng(0)
N = 4096
o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
d = jnp.asarray((rng.normal(size=(N, 3)) * 0.2
                 + np.array([0, 0, -1.0])).astype(np.float32))
vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

got = nerf_render_rays_fused(params, None, o, d, vd, 2., 6., 64, 128, 10, 4,
                             white_bkgd=True)
rgb_k = np.asarray(got[0])
# composed fused path (field-eval kernel + XLA glue); frame_fused=False so
# the whole-ray kernel does NOT shadow the path it is being checked against
cfg = RenderConfig(n_samples=64, n_importance=128, white_bkgd=True,
                   perturb=False, frame_fused=False)
ref_f = render_rays(model, params, None, o, d, vd, jax.random.PRNGKey(0),
                    cfg.eval_mode())
# exact XLA path: fast_embed=False keeps every teacher kernel off
cfgx = RenderConfig(n_samples=64, n_importance=128, white_bkgd=True,
                    perturb=False, fast_embed=False, frame_fused=False)
ref_x = render_rays(model, params, None, o, d, vd, jax.random.PRNGKey(0),
                    cfgx)
rgb_f, rgb_x = np.asarray(ref_f.rgb), np.asarray(ref_x.rgb)
for name, a, b in [("frame_kernel vs XLA", rgb_k, rgb_x),
                   ("composed_fused vs XLA", rgb_f, rgb_x)]:
    e = np.abs(a - b).max(axis=1)
    print(f"{name}: max={e.max():.4f} mean={e.mean():.6f} "
          f"p99={np.percentile(e, 99):.5f} frac>0.01={float((e > 0.01).mean()):.4f}")
