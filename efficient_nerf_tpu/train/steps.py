"""Jitted training steps for the R2L student and the NeRF teacher.

Everything that the reference does per iteration on the host (lr schedule,
hard-pool bookkeeping, loss/psnr computation; main.py:1175-1425) is fused
here into a single donated XLA program per step: params, optimizer state and
the hard-ray pool live on device and are updated in place.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.encoding import ray_embed
from ..core.ray_sampler import sample_patch_points, sample_ray_points
from ..core.rays import ndc_rays, plucker_rays
from ..render.renderer import RenderConfig, render_rays
from .hard_mining import HardPool, pick_hard_rays, update_hard_pool

__all__ = ["TrainState", "init_train_state", "make_r2l_train_step",
           "make_patch_train_step", "make_teacher_train_step", "mse_to_psnr"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def mse_to_psnr(mse):
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def make_r2l_train_step(
    model,
    optimizer,
    *,
    near: float,
    far: float,
    n_sample: int,
    L: int = 10,
    perturb: bool = True,
    lw_rgb: float = 1.0,
    learn_depth: bool = False,
    lw_depth: float = 0.1,
    plucker: bool = False,
    hard: Optional[Tuple[int, int]] = None,  # (n_hard_in, n_hard_out)
    exact_hard_mining: bool = False,
    fast_embed: bool = True,
    fused: Optional[bool] = None,
    mesh=None,
    interpret: bool = False,
    donate: bool = True,
    jit: bool = True,
):
    """Build the jitted R2L distillation step.

    step(state, pool, key, rays_o, rays_d, target) ->
        (state, pool, metrics dict)

    target is [B, 3] rgb (or [B, 4] with depth when learn_depth).

    fused: use the Pallas fused fwd+bwd custom-VJP kernel for the model
    apply (ops/pallas/r2l_train.py). None = auto: on when the backend is a
    TPU and the model matches the uniform scan-body profile.

    mesh: a jax.sharding.Mesh with a 'data' axis. The fused kernel is a
    per-chip program (not GSPMD-partitionable), so with a mesh the apply is
    shard_map'ed over 'data': each chip runs the kernel on its local ray
    shard with params replicated in, and shard_map's transpose psums the
    weight grads over ICI — the same collective GSPMD inserts for the XLA
    path, so multi-chip keeps the kernel's ~2.6x step win. The sample rows
    per step (batch + n_hard_out) must divide the 'data' axis size.

    interpret: run the kernel in Pallas interpret mode (CPU tests/dryrun).
    """
    if fused is None or fused:
        from ..ops import fused_r2l_train_available

        eligible = (getattr(model, "body_arch", "") == "resmlp"
                    and not getattr(model, "layerwise_widths", ())
                    and model.n_learnable == 2 and model.inact == "relu"
                    and model.outact == "none" and model.act == "relu"
                    and not model.linear_tail)
        if fused and not eligible:
            raise ValueError("fused train step requires the uniform "
                             "scan-body R2LNet profile")
        fused = eligible and (fused_r2l_train_available() or interpret)

    fused_apply = None
    if fused:
        from ..ops import r2l_train_apply

        def _fused_apply(params, x):
            # fast_embed: the kernel embeds the raw sample coords itself
            # (no XLA embed, no [B, K*(2L+1)] HBM round trip). need_dx=
            # False: pts are sampled data, never differentiated — skips
            # the input-cotangent matmul/chain and its padded [B, in] HBM
            # store in the backward kernel.
            return r2l_train_apply(
                params, x, res_scale=model.res_scale,
                use_global_residual=model.use_residual,
                dtype=model.dtype, embed_L=L if fast_embed else 0,
                need_dx=False, interpret=interpret)

        if mesh is not None:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            # per-chip kernel over the local ray shard; params broadcast
            # in (P() in_spec), so shard_map's transpose psums the weight
            # cotangents across 'data' — exactly the DP grad all-reduce.
            fused_apply = shard_map(
                _fused_apply, mesh=mesh,
                in_specs=(P(), P("data")), out_specs=P("data"),
                check_rep=False)
        else:
            fused_apply = _fused_apply

    def step(state: TrainState, pool: HardPool, key, rays_o, rays_d, target):
        batch_size = rays_o.shape[0]
        k_pick, k_perturb = jax.random.split(key)
        idx_out = None
        if hard is not None:
            n_hard_in, n_hard_out = hard
            rows = jnp.concatenate([rays_o, rays_d, target], axis=-1)
            picked, idx_out = pick_hard_rays(pool, k_pick, rows, n_hard_out)
            rays_o_aug = jnp.concatenate([rays_o, picked[:, :3]], 0)
            rays_d_aug = jnp.concatenate([rays_d, picked[:, 3:6]], 0)
            target_aug = jnp.concatenate([target, picked[:, 6:]], 0)
        else:
            rays_o_aug, rays_d_aug, target_aug = rays_o, rays_d, target

        def loss_fn(params):
            if plucker:
                pts = plucker_rays(rays_o_aug, rays_d_aug)
            else:
                pts = sample_ray_points(rays_o_aug, rays_d_aug, near, far,
                                        n_sample, key=k_perturb,
                                        perturb=perturb)
            if fused:
                out = fused_apply(
                    params, pts if fast_embed else ray_embed(pts, L))
            else:
                x = ray_embed(pts, L, fast=fast_embed)
                out = model.apply({"params": params}, x)
            per_ray_mse = jnp.mean(
                (out[:, :3] - target_aug[:, :3]) ** 2, axis=-1)
            loss_rgb = jnp.mean(per_ray_mse) * lw_rgb
            loss = loss_rgb
            loss_d = jnp.zeros(())
            if learn_depth:
                loss_d = jnp.mean((out[:, 3:] - target_aug[:, 3:]) ** 2)
                loss = loss + loss_d * lw_depth
            return loss, (per_ray_mse, loss_rgb, loss_d)

        grads, (per_ray_mse, loss_rgb, loss_d) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)

        if hard is not None:
            rows_aug = jnp.concatenate([rays_o_aug, rays_d_aug, target_aug], -1)
            pool = update_hard_pool(pool, rows_aug, per_ray_mse, idx_out,
                                    hard[0], batch_size,
                                    exact=exact_hard_mining)

        metrics = {
            "loss_rgb": loss_rgb,
            "loss_depth": loss_d,
            "psnr": mse_to_psnr(loss_rgb / lw_rgb),
        }
        return TrainState(params, opt_state, state.step + 1), pool, metrics

    if not jit:
        return step
    dn = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=dn)


def make_patch_train_step(
    model,
    optimizer,
    *,
    near: float,
    far: float,
    n_sample: int,
    L: int = 10,
    perturb: bool = True,
    lw_rgb: float = 1.0,
    use_bn: bool = False,
    fast_embed: bool = True,
    donate: bool = True,
    jit: bool = True,
):
    """Jitted CNN-style patch distillation step (R2LConvNet consumer of the
    16x16patches / 3x3rays / rand_tworays creation modes).

    step(state, batch_stats, key, rays_o, rays_d, target) ->
        (state, batch_stats, metrics)

    rays/target: [N, ph, pw, 3]. Stratified jitter is per-PATCH (one uniform
    per patch, reference sample_train2 semantics). batch_stats is the flax
    BatchNorm collection ({} when use_bn=False — threaded through unchanged
    so the step signature is uniform).
    """

    def step(state: TrainState, batch_stats, key, rays_o, rays_d, target):
        pts = sample_patch_points(rays_o, rays_d, near, far, n_sample,
                                  key=key, perturb=perturb)
        x = ray_embed(pts, L, fast=fast_embed)

        def loss_fn(params):
            if use_bn:
                rgb, upd = model.apply(
                    {"params": params, "batch_stats": batch_stats}, x,
                    train=True, mutable=["batch_stats"])
                new_bs = upd["batch_stats"]
            else:
                rgb = model.apply({"params": params}, x, train=True)
                new_bs = batch_stats
            loss_rgb = jnp.mean((rgb - target) ** 2) * lw_rgb
            return loss_rgb, new_bs

        (loss_rgb, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss_rgb": loss_rgb, "loss_depth": jnp.zeros(()),
                   "psnr": mse_to_psnr(loss_rgb / lw_rgb)}
        return (TrainState(params, opt_state, state.step + 1), new_bs,
                metrics)

    if not jit:
        return step
    dn = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=dn)


def make_teacher_train_step(
    model,
    optimizer,
    cfg: RenderConfig,
    hwf: Optional[Tuple[int, int, float]] = None,
    donate: bool = True,
    jit: bool = True,
):
    """Build the jitted NeRF-teacher step (coarse + fine MSE losses).

    step(state, key, rays_o, rays_d, target) -> (state, metrics)

    state.params is {'coarse': ..., 'fine': ...} ('fine' may be absent when
    cfg.n_importance == 0).

    rays_o/rays_d are RAW world rays in every mode. When cfg.ndc (LLFF
    forward-facing scenes) the step itself applies the projection, matching
    the reference where every training call goes through render():
    viewdirs are normalized from the PRE-NDC world dirs, then o/d are
    projected to NDC before sampling z in [0, 1] (reference
    main.py:148-162). hwf=(H, W, focal) is required for the projection.
    """
    has_fine = cfg.n_importance > 0
    if cfg.ndc and hwf is None:
        raise ValueError("cfg.ndc requires hwf=(H, W, focal) so the step "
                         "can project raw rays itself")

    def step(state: TrainState, key, rays_o, rays_d, target):
        k_render = key

        def loss_fn(params):
            viewdirs = None
            if cfg.use_viewdirs:
                # pre-NDC world dirs (reference main.py:148-158)
                viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1,
                                                    keepdims=True)
            ro, rd = rays_o, rays_d
            if cfg.ndc:
                H, W, focal = hwf
                ro, rd = ndc_rays(H, W, focal, 1.0, ro, rd)
            res = render_rays(model, params["coarse"],
                              params.get("fine"), ro, rd,
                              viewdirs, k_render, cfg)
            loss = jnp.mean((res.rgb - target) ** 2)
            loss_fine = loss
            if has_fine:
                loss = loss + jnp.mean((res.rgb0 - target) ** 2)
            return loss, loss_fine

        (loss, loss_fine), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "psnr": mse_to_psnr(loss_fine)}
        return TrainState(params, opt_state, state.step + 1), metrics

    if not jit:
        return step
    dn = (0,) if donate else ()
    return jax.jit(step, donate_argnums=dn)
