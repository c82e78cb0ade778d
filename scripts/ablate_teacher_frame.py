"""Teacher-frame ablations: where does frame time go beyond the field evals?

Times the REAL eval frame (render_image, fused cm path) with stages knocked
out by monkeypatching the renderer module — wrong pixels by construction,
correct timing attribution. Scan-differencing methodology (see bench.py).

Variants:
  full        — the production eval frame
  coarse_only — n_importance=0 (64-sample frame: coarse eval + composite)
  nopdf       — sample_pdf replaced by a constant linspace (isolates the
                inverse-CDF cost as fused into the frame program)
  nomerge     — merge_sorted replaced by concatenate (isolates the bitonic
                z-merge cost)
  nopdfmerge  — both

Usage: python scripts/ablate_teacher_frame.py [variant ...]
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
from efficient_nerf_tpu.render import renderer
from efficient_nerf_tpu.core.poses import pose_spherical

H = W = 400
S_C, S_F = 64, 128

model = NeRFMLP(dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 90)))["params"]
cfg = renderer.RenderConfig(n_samples=S_C, n_importance=S_F,
                            white_bkgd=True).eval_mode()
c2w = jnp.asarray(pose_spherical(30.0, -30.0, 4.0)[:3, :4])

_orig_pdf = renderer.sample_pdf
_orig_merge = renderer.merge_sorted
_orig_composite = renderer.raw2outputs_cm


def _const_pdf(key, bins, weights, n_samples, **kw):
    z = jnp.linspace(2.0, 6.0, n_samples)
    # keep a (cheap) data dependence on weights so XLA cannot DCE the
    # coarse composite that produces them
    return jnp.broadcast_to(z, bins.shape[:-1] + (n_samples,)) \
        + 1e-12 * weights[..., :1]


def _concat_merge(a, b):
    return jnp.concatenate([a, b], axis=-1)


def _cheap_composite(raw_cm, z_vals, rays_d, *a, **kw):
    # wrong outputs, cheap compute, keeps data deps on raw/z/d so XLA
    # cannot DCE the kernel that produced raw_cm
    from efficient_nerf_tpu.core.volume import RenderOutputs
    s = jnp.mean(raw_cm, axis=0)                        # [N, S]
    w = s + 1e-12 * z_vals + 1e-12 * rays_d[..., :1]
    m = jnp.mean(w, axis=-1)
    rgb = jnp.broadcast_to(m[..., None], m.shape + (3,))
    return RenderOutputs(rgb, m, m, w, m)


def _const_det_pdf(z_mid, weights, n_importance, **kw):
    z = jnp.linspace(2.0, 6.0, n_importance)
    return jnp.broadcast_to(z, z_mid.shape[:-1] + (n_importance,)) \
        + 1e-12 * weights[..., :1]


VARIANTS = {
    "full": (cfg, {}),
    "coarse_only": (dataclasses.replace(cfg, n_importance=0), {}),
    "nopdf": (cfg, {"sample_pdf": _const_pdf}),
    "nomerge": (cfg, {"merge_sorted": _concat_merge}),
    "nopdfmerge": (cfg, {"sample_pdf": _const_pdf,
                         "merge_sorted": _concat_merge}),
    # r5: knock out the composites / the fused det sampler in the REAL
    # eval-mode frame (the det path does not go through renderer.sample_pdf)
    "nocomposite": (cfg, {"raw2outputs_cm": _cheap_composite}),
    "nodetpdf": (cfg, {"__ops_det_pdf": _const_det_pdf}),
    "nodetpdfmerge": (cfg, {"__ops_det_pdf": _const_det_pdf,
                            "merge_sorted": _concat_merge}),
}


def timed(variant, n_lo=1, n_hi=3, reps=4):
    import efficient_nerf_tpu.ops as _ops
    _orig_det = _ops.sample_pdf_det_fused
    vcfg, patches = VARIANTS[variant]
    for name, fn in patches.items():
        if name == "__ops_det_pdf":
            # render_rays imports sample_pdf_det_fused from ..ops at call
            # time, so patch the ops module attribute
            _ops.sample_pdf_det_fused = fn
        else:
            setattr(renderer, name, fn)
    try:
        def make(n):
            @jax.jit
            def run(params, epss):
                def body(acc, eps):
                    res = renderer.render_image(model, params, params, H, W,
                                                555.0, c2w + eps, vcfg)
                    return acc + jnp.sum(res.rgb), None
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
    finally:
        renderer.sample_pdf = _orig_pdf
        renderer.merge_sorted = _orig_merge
        renderer.raw2outputs_cm = _orig_composite
        _ops.sample_pdf_det_fused = _orig_det


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        dt = timed(name)
        print(f"{name:12s} {dt * 1e3:8.2f} ms/frame", flush=True)
