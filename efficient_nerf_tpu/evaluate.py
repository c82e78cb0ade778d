"""Evaluation: render poses, compute PSNR/SSIM/LPIPS/FLIP, dump artifacts.

render_path parity (reference main.py:189-398): per-pose rendering for both
model families, per-frame PSNR/SSIM + error maps + PNG dumps, then batch
LPIPS (minibatch 8, inputs rescaled to [-1, 1]) and FLIP at the 3840-px
monitor ppd. LPIPS is weight-file gated (metrics/lpips.py); when weights are
absent the field is reported as NaN rather than crashing (the reference
hard-requires the pip package).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import (default_pixels_per_degree, flip, img2mse, lpips,
                      lpips_available, mse2psnr, ssim)
from .render.r2l_renderer import r2l_render_image
from .render.renderer import RenderConfig, render_image
from .utils.images import save_image

__all__ = ["render_path", "load_given_rays"]


def _rescale(x, ymin, ymax):
    return (ymax - ymin) / (x.max() - x.min() + 1e-12) * (x - x.min()) + ymin


def load_given_rays(path: str):
    """Load a DONeRF-style given-render-path ray dump
    (reference --given_render_path_rays, main.py:207-213): a dict with
    all_rays_o [N, H*W, 3], all_rays_d [N, H*W, 3] and optional
    gt_imgs [N, H, W, 3]. Accepts .npz or a torch .pt/.pth pickle."""
    if path.endswith((".npz", ".npy")):
        z = np.load(path, allow_pickle=True)
        d = dict(z) if hasattr(z, "files") else z.item()
    else:
        import torch

        loaded = torch.load(path, map_location="cpu", weights_only=False)
        d = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in loaded.items()}
    gt = d.get("gt_imgs")
    return (np.asarray(d["all_rays_o"], np.float32),
            np.asarray(d["all_rays_d"], np.float32),
            None if gt is None else np.asarray(gt, np.float32))


def render_path(bundle, poses: Sequence[np.ndarray], hwf, *,
                model_name: str, n_sample_per_ray: int = 16,
                multires: int = 10, plucker: bool = False,
                gt_imgs: Optional[np.ndarray] = None,
                savedir: Optional[str] = None, render_factor: float = 0,
                given_rays=None, flip_reference_domain: bool = False,
                quant: str = "", log=print) -> Dict:
    """Render every pose; return {'rgbs': [N,H,W,3], metrics...}.

    given_rays: optional (all_rays_o [N,HW,3], all_rays_d [N,HW,3]) — render
    these exact rays instead of generating rays from `poses` (the DONeRF
    eval path; R2L only)."""
    H, W, focal = hwf
    if render_factor:
        H, W = int(H / render_factor), int(W / render_factor)
        focal = focal / render_factor

    model, params = bundle.model, bundle.params
    cfg: RenderConfig = bundle.cfg_test
    rgbs, psnrs, ssims, errors = [], [], [], []
    frame_times = []

    n_frames = len(poses) if given_rays is None else len(given_rays[0])

    act_scales = None
    if quant == "int8" and model_name != "nerf":
        # serving configuration: calibrate the int8 activation scales ONCE
        # per checkpoint, outside the frame loop (calibrate_serving_scales
        # docstring; a per-frame self-calibration costs ~1 ms/frame)
        from .render.r2l_renderer import calibrate_serving_scales

        if given_rays is not None:
            cal_o = jnp.asarray(given_rays[0][0])
            cal_d = jnp.asarray(given_rays[1][0])
        else:
            from .core.rays import get_rays

            cal_o, cal_d = get_rays(
                H, W, focal, jnp.asarray(np.asarray(poses[0])[:3, :4]))
            cal_o, cal_d = cal_o.reshape(-1, 3), cal_d.reshape(-1, 3)
        act_scales = calibrate_serving_scales(
            model, params, cal_o, cal_d, cfg.near, cfg.far,
            n_sample_per_ray, L=multires)
    for i in range(n_frames):
        t0 = time.time()
        if given_rays is not None:
            from .render.r2l_renderer import r2l_forward_rays

            o = jnp.asarray(given_rays[0][i])
            d = jnp.asarray(given_rays[1][i])
            rgb = r2l_forward_rays(model, params, o, d, cfg.near, cfg.far,
                                   n_sample_per_ray, L=multires, quant=quant,
                                   act_scales=act_scales)
            rgb = rgb.reshape(H, W, -1)
        elif model_name == "nerf":
            c2w = jnp.asarray(np.asarray(poses[i])[:3, :4])
            res = render_image(model, params["coarse"], params.get("fine"),
                               H, W, focal, c2w, cfg)
            rgb = res.rgb
        else:
            c2w = jnp.asarray(np.asarray(poses[i])[:3, :4])
            rgb = r2l_render_image(model, params, c2w, H, W, focal,
                                   cfg.near, cfg.far, n_sample_per_ray,
                                   L=multires, plucker=plucker, quant=quant,
                                   act_scales=act_scales)
        rgb = np.asarray(jax.device_get(rgb))
        frame_times.append(time.time() - t0)
        rgbs.append(rgb)

        if gt_imgs is not None:
            gt = np.asarray(gt_imgs[i])[:H, :W, :3]
            err = np.abs(rgb - gt)
            errors.append(err)
            psnrs.append(float(mse2psnr(jnp.asarray(np.mean(err ** 2)))))
            ssims.append(float(ssim(jnp.asarray(rgb)[None],
                                    jnp.asarray(gt)[None])))
        if savedir is not None:
            os.makedirs(savedir, exist_ok=True)
            save_image(os.path.join(savedir, f"{i:03d}.png"), rgb)
            if gt_imgs is not None:
                save_image(os.path.join(savedir, f"{i:03d}_gt.png"),
                           np.asarray(gt_imgs[i]))
                save_image(os.path.join(savedir, f"{i:03d}_error.png"),
                           errors[-1])
        note = " (incl. jit compile)" if i == 0 else ""
        log(f"[#{i}] frame rendered in {frame_times[-1]:.3f}s{note}")

    out: Dict = {"rgbs": np.stack(rgbs, 0), "frame_times": frame_times}
    # Frame 0 pays the jit compile; report the steady-state time separately
    # so logs/README quote an honest per-frame number.
    steady = frame_times[1:] if len(frame_times) > 1 else frame_times
    out["frame_time_avg"] = float(np.mean(steady))
    if gt_imgs is not None:
        gt = np.asarray(gt_imgs)[:, :H, :W, :3]
        rec = jnp.asarray(out["rgbs"])
        ref = jnp.asarray(gt)
        test_loss = float(img2mse(rec, ref))
        out["test_loss"] = test_loss
        out["test_psnr"] = float(mse2psnr(jnp.asarray(test_loss)))
        out["test_psnr_v2"] = float(np.mean(psnrs))
        out["test_ssim"] = float(np.mean(ssims))
        out["errors"] = np.stack(errors, 0)

        # batch perceptual metrics at [-1, 1] (reference main.py:355-379)
        rec_m = _rescale(rec, -1.0, 1.0)
        ref_m = _rescale(ref, -1.0, 1.0)
        if lpips_available():
            vals = []
            for s in range(0, rec_m.shape[0], 8):
                vals.append(np.asarray(lpips(rec_m[s:s + 8], ref_m[s:s + 8])))
            out["test_lpips"] = float(np.concatenate(vals).mean())
        else:
            out["test_lpips"] = float("nan")
        # FLIP input domain: the reference feeds the [-1, 1]-rescaled tensors
        # straight into compute_flip (main.py:372-379), whose srgb2linrgb
        # clamps to [0, 1] — crushing half the range. We default to remapping
        # back to [0, 1] (documented divergence, docs/COMPONENTS.md);
        # flip_reference_domain=True reproduces the reference's numbers.
        if flip_reference_domain:
            out["test_flip"] = float(flip(ref_m, rec_m,
                                          default_pixels_per_degree()))
        else:
            out["test_flip"] = float(flip(ref_m * 0.5 + 0.5,
                                          rec_m * 0.5 + 0.5,
                                          default_pixels_per_degree()))
    return out
