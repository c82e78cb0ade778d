"""R2L (neural light field) rendering: one ray -> one forward -> one pixel.

Parity with the reference's R2L eval path (main.py:285-325: sample_test ->
positional_embedder -> model forward, reshaped to an image). TPU-first: the
whole H*W-ray frame is one (or a few chunked) [B, 1008] x 88-matmul XLA
program; no per-sample axis exists at all.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.encoding import ray_embed
from ..core.ray_sampler import sample_image_points, sample_ray_points
from ..core.rays import plucker_rays

__all__ = ["r2l_forward_rays", "r2l_render_image", "make_r2l_forward",
           "calibrate_serving_scales"]


def calibrate_serving_scales(model, params, rays_o, rays_d, near: float,
                             far: float, n_sample: int, L: int = 10,
                             n_cal: int = 1024):
    """Per-checkpoint int8 activation scales, computed ONCE at load time.

    Serving loops (render_path with --inference_quant int8, --benchmark)
    pass the result through act_scales so the jitted frame program carries
    no data-dependent self-calibration subgraph — re-calibrating inside
    every frame costs ~1 ms/frame of non-serving work (the round-4
    22.7 -> 23.5 M rays/s win, docs/PERF.md)."""
    from ..ops.pallas.r2l_int8 import calibrate_r2l_int8

    n_cal = min(n_cal, rays_o.shape[0])
    return calibrate_r2l_int8(params, rays_o[:n_cal], rays_d[:n_cal], near,
                              far, n_sample, L, res_scale=model.res_scale)


def _is_conv(model) -> bool:
    from ..models import R2LConvNet

    return isinstance(model, R2LConvNet)


def _fused_eligible(model, plucker: bool, perturb: bool) -> bool:
    """The Pallas megakernel covers the flagship profile: uniform-width
    resmlp scan body, relu in-act, sigmoid tail, eval mode, non-Plucker."""
    from ..ops import fused_r2l_available

    return (not _is_conv(model)
            and not plucker and not perturb
            and model.body_arch == "resmlp"
            and not model.layerwise_widths
            and model.n_learnable == 2
            and model.act == "relu" and model.inact == "relu"
            and model.outact == "none"
            and not model.linear_tail
            and fused_r2l_available())


def r2l_forward_rays(model, params, rays_o, rays_d, near: float, far: float,
                     n_sample: int, L: int = 10, plucker: bool = False,
                     key: Optional[jax.Array] = None, perturb: bool = False,
                     allow_fused: bool = True, quant: str = "",
                     batch_stats=None, act_scales=None):
    """[B, 3] rays -> [B, output_dim] colors.

    Eval-mode calls on TPU dispatch to the fused Pallas megakernel when the
    model matches its profile (allow_fused=False forces the XLA path).
    quant='int8' selects the W8A8 serving kernel (ops/pallas/r2l_int8.py);
    it requires the megakernel profile and raises otherwise.
    """
    if quant and quant != "int8":
        raise ValueError(f"unknown quant mode {quant!r}")
    if quant == "int8":
        if not (allow_fused and _fused_eligible(model, plucker, perturb)):
            raise ValueError("int8 inference requires the fused-megakernel "
                             "profile (uniform resmlp body, eval mode, TPU)")
        from ..ops.pallas.r2l_int8 import (calibrate_r2l_int8,
                                           r2l_forward_int8)

        # static activation scales: pass act_scales precomputed once per
        # checkpoint (the served configuration — calibrate_r2l_int8 outside
        # the hot loop); otherwise self-calibrate with one small
        # full-precision forward over a slice of the actual rays. The
        # self-calibration subgraph depends on the rays, so inside a
        # multi-frame scan it CANNOT be hoisted and costs ~1 ms/frame —
        # fine for one-shot renders, wrong for serving loops.
        if act_scales is None:
            n_cal = min(1024, rays_o.shape[0])
            act_scales = calibrate_r2l_int8(
                params, rays_o[:n_cal], rays_d[:n_cal], near, far, n_sample,
                L, res_scale=model.res_scale)
        return r2l_forward_int8(
            params, rays_o, rays_d, near, far, n_sample, L,
            res_scale=model.res_scale,
            use_global_residual=model.use_residual,
            act_scales=act_scales)
    if allow_fused and _fused_eligible(model, plucker, perturb):
        from ..ops import r2l_forward_fused

        return r2l_forward_fused(
            params, rays_o, rays_d, near, far, n_sample, L,
            res_scale=model.res_scale,
            use_global_residual=model.use_residual)
    if plucker:
        pts = plucker_rays(rays_o, rays_d)
    else:
        pts = sample_ray_points(rays_o, rays_d, near, far, n_sample,
                                key=key, perturb=perturb)
    x = ray_embed(pts, L)
    if _is_conv(model):
        # arbitrary ray sets have no patch geometry: evaluate as 1x1
        # patches (SAME-padded convs reduce to their center taps)
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        return model.apply(v, x[:, None, None, :]).reshape(x.shape[0], -1)
    return model.apply({"params": params}, x)


def make_r2l_forward(model, near: float, far: float, n_sample: int,
                     L: int = 10, plucker: bool = False):
    """Jitted eval-mode ray forward: (params, rays_o, rays_d) -> rgb."""

    def fn(params, rays_o, rays_d):
        return r2l_forward_rays(model, params, rays_o, rays_d, near, far,
                                n_sample, L=L, plucker=plucker, perturb=False)

    return jax.jit(fn)


def r2l_render_image(model, params, c2w, H: int, W: int, focal: float,
                     near: float, far: float, n_sample: int, L: int = 10,
                     plucker: bool = False, chunk: int = 0, quant: str = "",
                     batch_stats=None, act_scales=None):
    """Render a full frame. chunk=0 -> the whole frame in one XLA call
    (the fast path: H*W x width matmuls saturate the MXU). act_scales:
    per-checkpoint int8 scales from calibrate_serving_scales (serving
    loops must pass them; None self-calibrates per call)."""
    if quant == "int8" or _fused_eligible(model, plucker, perturb=False):
        from ..core.rays import get_rays

        rays_o, rays_d = get_rays(H, W, focal, c2w)
        rgb = r2l_forward_rays(model, params, rays_o.reshape(-1, 3),
                               rays_d.reshape(-1, 3), near, far, n_sample, L,
                               quant=quant, act_scales=act_scales)
        return rgb.reshape(H, W, -1)
    pts = sample_image_points(c2w, H, W, focal, near, far, n_sample,
                              plucker=plucker)
    x = ray_embed(pts, L)
    if _is_conv(model):
        # the full frame IS one big patch for the conv student
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        rgb = model.apply(v, x.reshape(1, H, W, x.shape[-1]))
        return rgb.reshape(H, W, -1)
    if chunk and chunk < x.shape[0]:
        n = x.shape[0]
        n_chunks = -(-n // chunk)
        x = jnp.pad(x, ((0, n_chunks * chunk - n), (0, 0)))
        x = x.reshape(n_chunks, chunk, x.shape[-1])
        _, rgb = jax.lax.scan(
            lambda c, xi: (c, model.apply({"params": params}, xi)), None, x)
        rgb = rgb.reshape(-1, rgb.shape[-1])[:n]
    else:
        rgb = model.apply({"params": params}, x)
    return rgb.reshape(H, W, -1)
