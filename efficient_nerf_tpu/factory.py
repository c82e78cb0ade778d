"""Model/optimizer construction from parsed args (create_nerf parity,
reference main.py:407-553)."""
from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .core.encoding import nerf_embed_dim, ray_embed_dim
from .models import NeRFMLP, R2LNet, nerf_flops_per_pixel, r2l_flops_per_pixel
from .render.renderer import RenderConfig
from .train.checkpoints import (import_reference_checkpoint, load_checkpoint)
from .train.schedules import make_lr_schedule, parse_warmup
from .utils.meters import count_params

__all__ = ["Bundle", "create_models", "render_config_from_args"]


class Bundle(NamedTuple):
    model: Any
    params: Any                 # nerf: {'coarse','fine'}; r2l: param tree
    optimizer: Any
    cfg_train: RenderConfig
    cfg_test: RenderConfig
    history: Dict[str, Any]     # start / best_psnr / best_psnr_step
    restored_opt_state: Any     # optimizer state when --resume, else None
    input_dim: int              # r2l network input dim (0 for nerf)
    flops_per_pixel: float
    n_params: int


def render_config_from_args(args, near: float, far: float) -> RenderConfig:
    ndc = (args.dataset_type == "llff") and not args.no_ndc
    return RenderConfig(
        n_samples=args.N_samples,
        n_importance=args.N_importance,
        perturb=args.perturb > 0,
        lindisp=bool(args.lindisp) and not ndc,
        white_bkgd=bool(args.white_bkgd),
        raw_noise_std=float(args.raw_noise_std),
        use_viewdirs=bool(args.use_viewdirs),
        multires=args.multires,
        multires_views=args.multires_views,
        ndc=ndc,
        near=float(near),
        far=float(far),
        chunk=args.chunk,
        fast_embed=not getattr(args, "exact_embed", False),
    )


def _compute_dtype(args):
    return (jnp.bfloat16 if getattr(args, "compute_dtype", "f32") == "bf16"
            else jnp.float32)


def _r2l_from_args(args, input_dim: int) -> R2LNet:
    trial_on = getattr(args.trial, "ON", False)
    body_arch = args.trial.body_arch if trial_on else "mlp"
    out_dim = {"": 3, "depth": 4, "surface": 6}[
        getattr(args, "learn_depth", "") or ""]
    if getattr(args, "data_mode", "") == "patches":
        # CNN-style patch student: consumes the 16x16patches/3x3rays shards
        # (reference --body_arch/--use_bn/--kernel_size, option.py:297-304)
        from .models import R2LConvNet

        return R2LConvNet(
            input_dim=input_dim,
            depth=args.netdepth,
            width=args.netwidth,
            output_dim=out_dim,
            kernel_size=args.kernel_size,
            body_arch=args.body_arch,
            use_bn=bool(args.use_bn),
            act=args.act,
            res_scale=args.trial.res_scale if trial_on else 1.0,
            dtype=_compute_dtype(args),
        )
    return R2LNet(
        input_dim=input_dim,
        depth=args.netdepth,
        width=args.netwidth,
        output_dim=out_dim,
        n_block=args.trial.n_block if trial_on else -1,
        n_learnable=args.trial.n_learnable if trial_on else 2,
        body_arch=body_arch,
        act=args.act,
        inact=args.trial.inact if trial_on else "relu",
        outact=args.trial.outact if trial_on else "none",
        res_scale=args.trial.res_scale if trial_on else 1.0,
        use_residual=bool(args.use_residual),
        linear_tail=bool(args.linear_tail),
        layerwise_widths=tuple(
            int(x) for x in args.layerwise_netwidths.split(",")
        ) if args.layerwise_netwidths else (),
        # remat off: v5e HBM holds the 88-layer activations at the
        # reference batch (4.3 GB at B=98k bf16) and it is ~15% faster
        remat_body=False,
        dtype=_compute_dtype(args),
    )


def _is_reference_ckpt(path: str) -> bool:
    if path.endswith(".tar"):
        return True
    with open(path, "rb") as f:
        return f.read(8) != b"ENTPUCK1"


def create_models(args, near: float, far: float, key=None) -> Bundle:
    key = key if key is not None else jax.random.PRNGKey(0)
    cfg_train = render_config_from_args(args, near, far)
    cfg_test = cfg_train.eval_mode()
    import dataclasses
    if args.perturb_test > 0:
        cfg_test = dataclasses.replace(cfg_test, perturb=True)
    if getattr(args, "teacher_quant", ""):
        # eval/pseudo-gen serving mode only (no VJP): cfg_train stays ''
        cfg_test = dataclasses.replace(cfg_test,
                                       teacher_quant=args.teacher_quant)

    warmup = parse_warmup(args.warmup_lr)
    schedule = make_lr_schedule(args.lrate, args.lrate_decay, warmup)
    optimizer = optax.adam(schedule, b1=0.9, b2=0.999)
    if getattr(args, "freeze_pretrained", False):
        # reference: frozen params are excluded from grad_vars (main.py:461)
        optimizer = optax.set_to_zero()

    history = {"start": 0, "best_psnr": 0.0, "best_psnr_step": 0}
    restored_opt_state = None

    if args.model_name == "nerf":
        input_ch = nerf_embed_dim(3, args.multires) if args.i_embed != -1 else 3
        input_ch_views = (nerf_embed_dim(3, args.multires_views)
                          if args.use_viewdirs else 0)
        skips = tuple(int(s) for s in str(args.skips).split(","))
        model = NeRFMLP(depth=args.netdepth, width=args.netwidth,
                        input_ch=input_ch, input_ch_views=input_ch_views,
                        output_ch=5 if args.N_importance > 0 else 4,
                        skips=skips, use_viewdirs=bool(args.use_viewdirs),
                        dtype=_compute_dtype(args))
        kc, kf = jax.random.split(key)
        dummy = jnp.zeros((1, input_ch + input_ch_views))
        params = {"coarse": model.init(kc, dummy)["params"]}
        if args.N_importance > 0:
            fine = NeRFMLP(depth=args.netdepth_fine, width=args.netwidth_fine,
                           input_ch=input_ch, input_ch_views=input_ch_views,
                           output_ch=5, skips=skips,
                           use_viewdirs=bool(args.use_viewdirs),
                           dtype=_compute_dtype(args))
            params["fine"] = fine.init(kf, dummy)["params"]

        if args.pretrained_ckpt:
            params, history, restored_opt_state = _load_nerf_ckpt(
                args, params, history)
        flops = nerf_flops_per_pixel(
            args.netdepth, args.netwidth, input_ch, input_ch_views, skips,
            bool(args.use_viewdirs), args.N_samples, args.N_importance)
        return Bundle(model, params, optimizer, cfg_train, cfg_test, history,
                      restored_opt_state, 0, flops,
                      count_params(params))

    # R2L student
    embed_dim = 2 * args.multires + 1
    if args.plucker:
        input_dim = 6 * embed_dim
    else:
        input_dim = ray_embed_dim(args.n_sample_per_ray * 3, args.multires)
    model = _r2l_from_args(args, input_dim)
    if getattr(args, "data_mode", "") == "patches":
        variables = model.init(key, jnp.zeros((1, 4, 4, input_dim)))
    else:
        variables = model.init(key, jnp.zeros((1, input_dim)))
    params = variables["params"]

    if args.pretrained_ckpt:
        params, history, restored_opt_state = _load_r2l_ckpt(
            args, model, params, history)

    flops = r2l_flops_per_pixel(
        input_dim, args.netdepth, args.netwidth,
        n_block=args.trial.n_block if getattr(args.trial, "ON", False) else -1,
        n_learnable=args.trial.n_learnable if getattr(args.trial, "ON", False) else 2)
    return Bundle(model, params, optimizer, cfg_train, cfg_test, history,
                  restored_opt_state, input_dim, flops, count_params(params))


def _load_nerf_ckpt(args, params, history):
    path = args.pretrained_ckpt
    restored_opt = None
    if _is_reference_ckpt(path):
        meta, params = import_reference_checkpoint(
            path, "nerf", depth=args.netdepth,
            use_viewdirs=bool(args.use_viewdirs))
    else:
        meta, params, restored_opt = load_checkpoint(path, params)
    if args.resume:
        history = {"start": meta.get("step", 0),
                   "best_psnr": meta.get("best_psnr", 0.0),
                   "best_psnr_step": meta.get("best_psnr_step", 0)}
        return params, history, restored_opt
    return params, history, None


def _load_r2l_ckpt(args, model, params, history):
    path = args.pretrained_ckpt
    restored_opt = None
    if _is_reference_ckpt(path):
        meta, params = import_reference_checkpoint(
            path, "r2l", n_block=model._n_block(),
            n_learnable=model.n_learnable,
            linear_tail=model.linear_tail)
    else:
        meta, params, restored_opt = load_checkpoint(path, params)
    if args.resume:
        history = {"start": meta.get("step", 0),
                   "best_psnr": meta.get("best_psnr", 0.0),
                   "best_psnr_step": meta.get("best_psnr_step", 0)}
        return params, history, restored_opt
    return params, history, None
