"""Per-stage timing of the teacher frame pipeline on the real chip.

Breaks the 400x400 frame (reference create_data.py:814-872 workload) into
its stages at the production chunk size and times each with the
scan-differencing methodology (bench.py): N iterations of the stage chained
in one jitted lax.scan, differenced across two scan lengths to cancel the
~30 ms tunnel round trip. Numbers feed docs/PERF.md.

Usage: python scripts/profile_teacher_stages.py [stage ...]
Stages: coarse_eval fine_eval coarse_eval_fused fine_eval_fused composite
        sample_pdf frame frame_fused
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

import dataclasses

from efficient_nerf_tpu.models import NeRFMLP
from efficient_nerf_tpu.render.renderer import (RenderConfig, _query,
                                                render_image, render_rays)
from efficient_nerf_tpu.core.sampling import (linear_zvals, merge_sorted,
                                              sample_pdf)
from efficient_nerf_tpu.core.volume import raw2outputs
from efficient_nerf_tpu.core.poses import pose_spherical

H = W = 400
CHUNK = 32768
N_RAYS = H * W
S_C, S_F = 64, 128

model = NeRFMLP(dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 90)))["params"]
_base = RenderConfig(n_samples=S_C, n_importance=S_F,
                     white_bkgd=True).eval_mode()
cfg = dataclasses.replace(_base, fused_teacher=False)   # pinned XLA variant
cfg_fused = dataclasses.replace(_base, fused_teacher=True)

rng = np.random.default_rng(0)
o = jnp.asarray(rng.normal(size=(CHUNK, 3)).astype(np.float32))
d = jnp.asarray(rng.normal(size=(CHUNK, 3)).astype(np.float32))
vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
c2w = jnp.asarray(pose_spherical(30.0, -30.0, 4.0)[:3, :4])

z_c = jnp.broadcast_to(linear_zvals(2.0, 6.0, S_C, False), (CHUNK, S_C))
z_all = jnp.broadcast_to(linear_zvals(2.0, 6.0, S_C + S_F, False),
                         (CHUNK, S_C + S_F))
w = jnp.asarray(rng.uniform(size=(CHUNK, S_C)).astype(np.float32))
raw_c = jnp.asarray(rng.normal(size=(CHUNK, S_C, 4)).astype(np.float32))


def eval_stage(c, n_s):
    def fn(params, o, d, eps):
        z = z_c if n_s == S_C else z_all
        pts = o[:, None, :] + d[:, None, :] * z[..., :, None] + eps
        raw = _query(model, params, pts, vd, c)
        return jnp.sum(raw)
    return fn


def composite_stage(params, o, d, eps):
    res = raw2outputs(raw_c + eps, z_c, d, 0.0, True)
    return jnp.sum(res.rgb) + jnp.sum(res.weights)


def sample_pdf_stage(params, o, d, eps):
    z_mid = 0.5 * (z_c[:, 1:] + z_c[:, :-1])
    zs = sample_pdf(None, z_mid, w[:, 1:-1] + eps, S_F, det=True)
    return jnp.sum(merge_sorted(z_c, zs))


def frame_stage(c):
    def fn(params, o, d, eps):
        res = render_image(model, params, params, H, W, 555.0, c2w + eps, c)
        return jnp.sum(res.rgb)
    return fn


_CHUNKS_PER_FRAME = -(-N_RAYS // CHUNK)   # frames run ceil(N/chunk) chunks

STAGES = {
    "coarse_eval": (eval_stage(cfg, S_C), _CHUNKS_PER_FRAME),
    "fine_eval": (eval_stage(cfg, S_C + S_F), _CHUNKS_PER_FRAME),
    "coarse_eval_fused": (eval_stage(cfg_fused, S_C), _CHUNKS_PER_FRAME),
    "fine_eval_fused": (eval_stage(cfg_fused, S_C + S_F), _CHUNKS_PER_FRAME),
    "composite": (composite_stage, _CHUNKS_PER_FRAME),
    "sample_pdf": (sample_pdf_stage, _CHUNKS_PER_FRAME),
    "frame": (frame_stage(cfg), 1),
    "frame_fused": (frame_stage(cfg_fused), 1),
    # whole frame as ONE chunk program (no lax.scan over chunks)
    "frame_fused_c1": (frame_stage(dataclasses.replace(
        cfg_fused, chunk=H * W)), 1),
}


def timed(stage_fn, n_lo=1, n_hi=3, reps=4):
    def make(n):
        @jax.jit
        def run(params, o, d, epss):
            def body(acc, eps):
                return acc + stage_fn(params, o, d, eps), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), epss)
            return acc
        return run
    run_lo, run_hi = make(n_lo), make(n_hi)
    eps_lo = jnp.linspace(0.0, 1e-6, n_lo)
    eps_hi = jnp.linspace(0.0, 1e-6, n_hi)
    float(run_lo(params, o, d, eps_lo))
    float(run_hi(params, o, d, eps_hi))

    def t(run, eps):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params, o, d, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(run_hi, eps_hi) - t(run_lo, eps_lo)) / (n_hi - n_lo)


if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        fn, per_frame = STAGES[name]
        dt = timed(fn)
        print(f"{name:20s} {dt * 1e3:8.2f} ms/call  "
              f"{dt * per_frame * 1e3:8.2f} ms/frame", flush=True)
