"""The single volumetric renderer (coarse + hierarchical fine pass).

The reference implements this stack three times (main.py:51-186/556-756,
create_data.py:41-544, helpers+model partials); this is the one
implementation, a pure function of (params, rays, rng) designed for jit:

  * static shapes everywhere (N_samples / N_importance / chunk are Python
    ints), so XLA tiles every matmul onto the MXU;
  * `sample_pdf` runs on device (the reference round-trips through the CPU,
    main.py:722-728);
  * the whole coarse->fine chain (embed, MLP, composite, importance
    resample, fine MLP, composite) compiles into one fused program;
  * full-image rendering pads H*W rays to a chunk multiple and lax.map's
    the chunk renderer — one compile, any image size.

Ray-batch convention (parity with reference render() main.py:107-186): rays
are (o, d) pairs with scalar near/far from config; viewdirs are normalized
rays_d computed BEFORE NDC projection.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.encoding import nerf_embed
from ..core.rays import get_rays, ndc_rays
from ..core.sampling import (linear_zvals, merge_sorted, sample_pdf,
                             stratify_zvals)
from ..core.volume import raw2outputs, raw2outputs_cm

__all__ = ["RenderConfig", "RenderResult", "render_rays", "render_image",
           "make_ray_renderer"]


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering options (hashable -> usable as a jit static arg)."""

    n_samples: int = 64
    n_importance: int = 128
    perturb: bool = True          # stratified jitter of coarse depths
    lindisp: bool = False
    white_bkgd: bool = False
    raw_noise_std: float = 0.0
    use_viewdirs: bool = True
    multires: int = 10            # positional-encoding L for points
    multires_views: int = 4       # positional-encoding L for view dirs
    ndc: bool = False
    near: float = 2.0
    far: float = 6.0
    chunk: int = 32768            # rays per compiled step in render_image
    # dispatch field evals to the Pallas teacher megakernel (inference only:
    # it has no VJP, so this must stay False for configs used under jax.grad).
    # eval_mode() turns it on; measured on v5e the kernel (fast-sin embed,
    # per-ray dirs, channel-major points) cuts the 400x400 frame from 596 to
    # 362 ms — see docs/PERF.md.
    fused_teacher: bool = False
    # double-angle-recurrence positional encoding (~Lx fewer VPU
    # transcendentals, ~1e-4 abs error — see core/encoding._doubling_sincos).
    # Default on; the strict reference-parity gates pin it off
    # (--exact_embed on the CLI).
    fast_embed: bool = True
    # OPT-IN int8 teacher serving mode ('' | 'int8', --teacher_quant): the
    # field-eval body runs W8A8 with per-render-call static activation
    # scales (ops/pallas/nerf_int8.py; jnp twin with identical quantization
    # math off TPU). Eval/pseudo-gen only — the int8 path has no VJP, so
    # cfg_train must keep ''. Quality cost is measured by the e2e gate
    # (tests/test_quality_e2e.py), not assumed.
    teacher_quant: str = ""
    # whole-ray teacher megakernel (ops/pallas/nerf_frame.py): coarse eval
    # -> composite -> inverse-CDF -> z-merge -> fine eval -> composite in
    # ONE Pallas program. OPT-IN (measured slower than the composed path):
    # on v5e/jax-0.9 the best tiling runs a 400x400 frame in 430 ms vs the
    # composed field-eval-kernel path's 380 ms — the XLA glue it removes
    # (~60 ms) is outweighed by Mosaic's in-kernel costs for the per-ray
    # glue stages (lane rolls ~1-2 us flat, loop-carry VMEM round trips
    # ~1.4-5.7 us/iteration, lane<->sublane relayouts for the fine-pass
    # depth column). Full stage attribution: docs/PERF.md (round-4 table).
    # Deterministic eval only; dispatch requires _frame_fused_eligible.
    frame_fused: bool = False
    frame_tile_r: int = 256       # rays per grid step (chip-tuned)
    frame_eval_chunks: int = 4    # field-eval ray sub-chunks per tile

    def eval_mode(self) -> "RenderConfig":
        """Test-time variant: no jitter, no sigma noise.

        Also opts into the fused teacher megakernel (r2: 596 -> 362 ms per
        400x400 frame) unless the config pins exact embeds (--exact_embed:
        the kernel's fast polynomial sine is ~1e-6-approximate, so strict
        reference-parity evals keep the XLA path). Dispatch still requires
        the profile + a TPU (_nerf_fused_eligible)."""
        return dataclasses.replace(
            self, perturb=False, raw_noise_std=0.0,
            fused_teacher=self.fused_teacher or self.fast_embed)


class RenderResult(NamedTuple):
    rgb: jnp.ndarray
    disp: jnp.ndarray
    acc: jnp.ndarray
    depth: jnp.ndarray
    # coarse-pass outputs (meaningful when n_importance > 0)
    rgb0: jnp.ndarray
    disp0: jnp.ndarray
    acc0: jnp.ndarray
    z_std: jnp.ndarray


def _teacher_profile_ok(model, cfg: RenderConfig) -> bool:
    """The teacher kernels (bf16 + int8) cover the reference profile:
    viewdir branch, one input skip, embed dims matching the config."""
    skips = tuple(getattr(model, "skips", ()))
    return (cfg.use_viewdirs
            and getattr(model, "use_viewdirs", False)
            and len(skips) == 1
            # the kernel concatenates the skip input before a *following* pts
            # layer; a skip at the last pts layer would feed the heads
            # width+in_ch inputs and fail with an opaque shape mismatch
            and 0 <= skips[0] < model.depth - 1
            and model.input_ch == 3 * (2 * cfg.multires + 1)
            and model.input_ch_views == 3 * (2 * cfg.multires_views + 1))


def _nerf_profile_ok(model, cfg: RenderConfig) -> bool:
    return cfg.fused_teacher and _teacher_profile_ok(model, cfg)


def _nerf_fused_eligible(model, cfg: RenderConfig) -> bool:
    from ..ops import fused_nerf_available

    return _nerf_profile_ok(model, cfg) and fused_nerf_available()


# tests flip this to run the frame kernel in Pallas interpret mode on CPU
_FRAME_INTERPRET = False


def _frame_fused_eligible(model, cfg: RenderConfig, near, far,
                          t_rand, u, noise) -> bool:
    """Whole-ray megakernel dispatch: the deterministic eval profile with
    scalar config near/far and no determinism hooks. Covers the reference
    eval/pseudo-gen hot loop (create_data.py:814-872, main.py:189-282)."""
    from ..ops import fused_nerf_frame_available

    return (cfg.frame_fused and not cfg.teacher_quant
            and _nerf_profile_ok(model, cfg)
            and cfg.n_importance >= 16 and cfg.n_samples >= 16
            and cfg.n_samples % 8 == 0 and cfg.n_importance % 8 == 0
            and not cfg.perturb and cfg.raw_noise_std == 0.0
            and near is None and far is None
            and t_rand is None and u is None and noise is None
            and (fused_nerf_frame_available() or _FRAME_INTERPRET))


def _query_int8(model, params, pts, viewdirs, cfg: RenderConfig, cm: bool):
    """--teacher_quant int8 field eval: per-call static-scale calibration
    (a tiny f32 forward on the call's own first points — in-graph, so no
    per-checkpoint plumbing) then the W8A8 kernel (jnp twin off TPU, same
    quantization math). Eval-only: no VJP."""
    from ..ops import fused_nerf_available
    from ..ops.pallas.nerf_int8 import (calibrate_nerf_int8,
                                        nerf_forward_int8,
                                        nerf_forward_int8_ref)

    if cfg.teacher_quant != "int8":
        raise ValueError(f"unknown teacher_quant {cfg.teacher_quant!r}")
    if not _teacher_profile_ok(model, cfg):
        raise ValueError("teacher_quant=int8 requires the standard "
                         "viewdir teacher profile")
    flat = (pts.reshape(3, -1).T if cm else pts.reshape(-1, 3))
    scales = calibrate_nerf_int8(params, flat[:1024], cfg.multires,
                                 skip=tuple(model.skips)[0])
    impl = nerf_forward_int8 if fused_nerf_available() \
        else nerf_forward_int8_ref
    return impl(params, pts, viewdirs, cfg.multires, cfg.multires_views,
                skip=tuple(model.skips)[0], act_scales=scales,
                dtype=model.dtype, cm=cm)


def _query(model, params, pts, viewdirs, cfg: RenderConfig):
    """Embed sample points (+dirs) and evaluate the field MLP.

    pts: [N, S, 3]; viewdirs: [N, 3] or None. Returns raw [N, S, 4].
    """
    if cfg.teacher_quant:
        return _query_int8(model, params, pts, viewdirs, cfg, cm=False)
    if _nerf_fused_eligible(model, cfg):
        from ..ops import nerf_forward_fused

        return nerf_forward_fused(params, pts, viewdirs,
                                  cfg.multires, cfg.multires_views,
                                  skip=tuple(model.skips)[0],
                                  dtype=model.dtype)
    emb = nerf_embed(pts, cfg.multires, fast=cfg.fast_embed)
    if cfg.use_viewdirs:
        dirs = nerf_embed(viewdirs, cfg.multires_views, fast=cfg.fast_embed)
        dirs = jnp.broadcast_to(dirs[..., None, :], pts.shape[:-1] + (dirs.shape[-1],))
        emb = jnp.concatenate([emb, dirs], axis=-1)
    return model.apply({"params": params}, emb)


def _query_composite_cm(model, params, rays_o, rays_d, z_vals, viewdirs,
                        cfg: RenderConfig, noise_key=None, noise=None):
    """Fused field eval + composite, channel-major end to end.

    Builds the sample points directly as [3, N, S] (a [N, S, 3] points
    tensor has minor dim 3, which the TPU lane-pads 42.7x — measured to
    dominate the pre-kernel cost), feeds the megakernel in cm mode, and
    composites the [4, N, S] raw output with raw2outputs_cm: no minor-dim-
    3/4 tensor exists anywhere between ray decode and the final [N, 3] rgb.
    """
    from ..ops import nerf_forward_fused

    pts_cm = (rays_o.T[:, :, None]
              + rays_d.T[:, :, None] * z_vals[None])       # [3, N, S]
    if cfg.teacher_quant:
        raw_cm = _query_int8(model, params, pts_cm, viewdirs, cfg, cm=True)
    else:
        raw_cm = nerf_forward_fused(params, pts_cm, viewdirs,
                                    cfg.multires, cfg.multires_views,
                                    skip=tuple(model.skips)[0],
                                    dtype=model.dtype, cm=True)
    return raw2outputs_cm(raw_cm, z_vals, rays_d, cfg.raw_noise_std,
                          cfg.white_bkgd, noise_key=noise_key, noise=noise)


def render_rays(
    model: Any,
    params_coarse,
    params_fine,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    key: Optional[jax.Array],
    cfg: RenderConfig,
    near=None,
    far=None,
    t_rand=None,
    u=None,
    noise=None,
) -> RenderResult:
    """Render a batch of rays [N, 3] through the coarse(+fine) field.

    t_rand / u / noise are the determinism hooks (pre-drawn randoms) used by
    golden tests, mirroring the reference's pytest=True mechanism.
    """
    n_rays = rays_o.shape[0]
    if _frame_fused_eligible(model, cfg, near, far, t_rand, u, noise):
        from ..ops import nerf_render_rays_fused

        out = nerf_render_rays_fused(
            params_coarse, params_fine, rays_o, rays_d, viewdirs,
            cfg.near, cfg.far, cfg.n_samples, cfg.n_importance,
            cfg.multires, cfg.multires_views, skip=tuple(model.skips)[0],
            white_bkgd=cfg.white_bkgd, lindisp=cfg.lindisp,
            dtype=model.dtype, tile_r=cfg.frame_tile_r,
            eval_chunks=cfg.frame_eval_chunks, interpret=_FRAME_INTERPRET)
        return RenderResult(*out)

    near = cfg.near if near is None else near
    far = cfg.far if far is None else far

    if key is not None:
        k_strat, k_pdf, k_noise_c, k_noise_f = jax.random.split(key, 4)
    else:
        k_strat = k_pdf = k_noise_c = k_noise_f = None

    z_vals = jnp.broadcast_to(
        linear_zvals(near, far, cfg.n_samples, cfg.lindisp), (n_rays, cfg.n_samples)
    )
    if cfg.perturb:
        z_vals = stratify_zvals(k_strat, z_vals, t_rand)

    fused = _nerf_fused_eligible(model, cfg)
    if fused:
        coarse = _query_composite_cm(model, params_coarse, rays_o, rays_d,
                                     z_vals, viewdirs, cfg,
                                     noise_key=k_noise_c, noise=noise)
    else:
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
        raw = _query(model, params_coarse, pts, viewdirs, cfg)
        coarse = raw2outputs(raw, z_vals, rays_d, cfg.raw_noise_std,
                             cfg.white_bkgd, noise_key=k_noise_c, noise=noise)

    if cfg.n_importance <= 0:
        zeros = jnp.zeros((n_rays,), rays_o.dtype)
        return RenderResult(coarse.rgb, coarse.disp, coarse.acc, coarse.depth,
                            coarse.rgb, coarse.disp, coarse.acc, zeros)

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    if fused and u is None and not cfg.perturb:
        # deterministic eval path on TPU: the Pallas inverse-CDF kernel runs
        # the identical dense masked interpolation per ray tile in VMEM
        # (no [N, S, C] broadcast intermediates touch HBM)
        from ..ops import sample_pdf_det_fused

        z_samples = sample_pdf_det_fused(z_mid, coarse.weights[..., 1:-1],
                                         cfg.n_importance)
    else:
        z_samples = sample_pdf(k_pdf, z_mid, coarse.weights[..., 1:-1],
                               cfg.n_importance, det=not cfg.perturb, u=u,
                               sorted_u=True)
    z_samples = jax.lax.stop_gradient(z_samples)
    if u is None:
        # z_samples is per-ray sorted (det linspace / sorted_uniform draws),
        # and the stratified z_vals are sorted by construction: a bitonic
        # two-way merge replaces the full jnp.sort (~4x fewer network stages).
        z_all = merge_sorted(z_vals, z_samples)
    else:
        # determinism hook supplies arbitrary-order u -> general sort.
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), axis=-1)

    params_f = params_fine if params_fine is not None else params_coarse
    if fused:
        fine = _query_composite_cm(model, params_f, rays_o, rays_d,
                                   z_all, viewdirs, cfg,
                                   noise_key=k_noise_f, noise=None)
    else:
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]
        raw = _query(model, params_f, pts, viewdirs, cfg)
        fine = raw2outputs(raw, z_all, rays_d, cfg.raw_noise_std,
                           cfg.white_bkgd, noise_key=k_noise_f, noise=None)

    z_std = jnp.std(z_samples, axis=-1)
    return RenderResult(fine.rgb, fine.disp, fine.acc, fine.depth,
                        coarse.rgb, coarse.disp, coarse.acc, z_std)


def _prep_full_image_rays(H, W, focal, c2w, cfg: RenderConfig):
    rays_o, rays_d = get_rays(H, W, focal, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    viewdirs = None
    if cfg.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if cfg.ndc:
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    return rays_o, rays_d, viewdirs


def make_ray_renderer(model, cfg: RenderConfig):
    """Jit-compiled chunk renderer: (params_c, params_f, o, d, vd, key) -> RenderResult."""

    def fn(params_coarse, params_fine, rays_o, rays_d, viewdirs, key):
        return render_rays(model, params_coarse, params_fine, rays_o, rays_d,
                           viewdirs, key, cfg)

    return jax.jit(fn)


def render_image(model, params_coarse, params_fine, H: int, W: int,
                 focal: float, c2w, cfg: RenderConfig,
                 key: Optional[jax.Array] = None) -> RenderResult:
    """Render a full H x W image, chunked to bound memory.

    Pads the ray list to a multiple of cfg.chunk and scans the compiled
    chunk renderer over it; outputs are reshaped to [H, W, ...].
    """
    rays_o, rays_d, viewdirs = _prep_full_image_rays(H, W, focal, c2w, cfg)
    n = rays_o.shape[0]
    chunk = min(cfg.chunk, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def pad0(x):
        return jnp.pad(x, ((0, pad), (0, 0)))

    rays_o, rays_d = pad0(rays_o), pad0(rays_d)
    viewdirs = pad0(viewdirs) if viewdirs is not None else None
    keys = (jax.random.split(key, n_chunks) if key is not None
            else jnp.zeros((n_chunks, 2), jnp.uint32))

    def chunk_fn(carry, inp):
        o, d, vd, k = inp
        res = render_rays(model, params_coarse, params_fine, o, d,
                          vd if cfg.use_viewdirs else None,
                          k if key is not None else None, cfg)
        return carry, res

    o_c = rays_o.reshape(n_chunks, chunk, 3)
    d_c = rays_d.reshape(n_chunks, chunk, 3)
    vd_c = (viewdirs.reshape(n_chunks, chunk, 3) if viewdirs is not None
            else jnp.zeros((n_chunks, chunk, 3)))

    _, res = jax.lax.scan(chunk_fn, None, (o_c, d_c, vd_c, keys))

    def unshape(x):
        x = x.reshape((n_chunks * chunk,) + x.shape[2:])[:n]
        return x.reshape((H, W) + x.shape[1:])

    return RenderResult(*[unshape(r) for r in res])
