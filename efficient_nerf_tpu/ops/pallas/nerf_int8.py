"""Int8 (W8A8) teacher field-evaluation kernel — the pseudo-gen serving mode.

The bf16 field-eval kernel (nerf_forward.py) sustains ~150 TF/s and the
400x400 eval frame is 91% field-eval time (docs/PERF.md r5 ablations) — the
only remaining frame lever is FLOPs, not scheduling. The MXU's int8 path
doubles the matmul ceiling (~394 TOPS on v5e). This kernel quantizes the
teacher MLP's dense middle — the 7 hidden [W, W] layers + the feature head,
~86% of the ~0.6 MMACs/point — to int8 with:

  * per-output-channel symmetric weight scales (packed once per call from
    the f32 params), and
  * per-layer STATIC activation scales (act_scales, one scalar per hidden
    layer + one for the feature input) calibrated from a point sample by
    `calibrate_nerf_int8` — cheap enough (~1024-point f32 forward) to run
    in-graph per render call, so no per-checkpoint plumbing is needed.

Kept in bf16/f32: the embed + first layer (mixed-magnitude sin/cos +
identity columns waste int8 range under one scale — same reasoning as the
R2L kernel's head, r2l_int8.py), the skip-input matmul, the whole view-dir
branch, and the alpha/rgb output heads. Accumulation is int32 on the MXU,
dequantized as acc * (s_act * s_w[col]) in f32 before the bias/relu
epilogues.

This is an OPT-IN serving mode (`--teacher_quant int8`): teacher TRAINING
and strict reference-parity evals keep full precision; the quality cost for
distillation targets is measured by the e2e gate (int8-vs-bf16 teacher
renders + student distilled from the int8 stream,
tests/test_quality_e2e.py). `nerf_forward_int8_ref` is a pure-jnp twin
with identical quantization math — it is also the production fallback off
TPU, so the quality gates exercise the exact served arithmetic on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nerf_forward import (LANES, _default_tiling, _fast_sin,
                           _linearized_embed, _ray_tile, nerf_embed_constants,
                           pack_nerf_weights)

__all__ = ["nerf_forward_int8", "nerf_forward_int8_ref",
           "pack_nerf_weights_int8", "calibrate_nerf_int8"]


def _quantize_cols(w):
    """f32 [K, N] -> (int8 [K, N], f32 [N] per-column scales)."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def pack_nerf_weights_int8(params, skip: int = 4, dtype=jnp.bfloat16):
    """pack_nerf_weights + int8 body/feature operands (from the f32
    params, not the packed bf16 copies)."""
    packed = pack_nerf_weights(params, skip=skip, dtype=dtype)
    f32 = jnp.float32
    in_ch, depth = packed["in_ch"], packed["depth"]
    ws = []
    for i in range(1, depth):
        k = jnp.asarray(params[f"pts_{i}"]["kernel"], f32)
        if i == skip + 1:
            k = k[in_ch:]          # skip-input rows stay a bf16 matmul
        ws.append(k)
    q, s = jax.vmap(_quantize_cols)(jnp.stack(ws, 0))
    packed["body_qw"], packed["body_sw"] = q, s          # [d-1, W, W]/[d-1, W]
    fq, fs = _quantize_cols(jnp.asarray(params["feature"]["kernel"], f32))
    packed["feat_qw"], packed["feat_sw"] = fq, fs
    del packed["body_w"], packed["feat_w"]
    return packed


def calibrate_nerf_int8(params, pts_flat, L: int = 10, *, skip: int = 4,
                        margin: float = 1.02):
    """Static per-layer activation scales from a point-sample f32 forward.

    pts_flat: [k, 3] sample points (any representative slice of the render
    call's own points — the renderer uses its first ~1024). Returns
    [depth] f32: scales for the inputs of hidden layers 1..depth-1 followed
    by the feature-head input (= running max * margin / 127; out-of-range
    activations saturate at +-127 in the kernel).
    """
    f32 = jnp.float32
    x = _linearized_embed(jnp.asarray(pts_flat, f32), L)
    in_ch = x.shape[-1]
    w0 = jnp.asarray(params["pts_0"]["kernel"], f32)
    h = jnp.maximum(x @ w0 + jnp.asarray(params["pts_0"]["bias"], f32), 0.0)
    depth = 0
    while f"pts_{depth}" in params:
        depth += 1
    scales = []
    for i in range(1, depth):
        scales.append(jnp.max(jnp.abs(h)))
        w = jnp.asarray(params[f"pts_{i}"]["kernel"], f32)
        b = jnp.asarray(params[f"pts_{i}"]["bias"], f32)
        if i == skip + 1:
            g = x @ w[:in_ch] + h @ w[in_ch:] + b
        else:
            g = h @ w + b
        h = jnp.maximum(g, 0.0)
    scales.append(jnp.max(jnp.abs(h)))                   # feature input
    return jnp.stack(scales) * (margin / 127.0)


def _qstatic(h, inv_s):
    return jnp.clip(jnp.round(h * inv_s), -127.0, 127.0).astype(jnp.int8)


def _kernel(pts_ref, dirs_ref, fp_ref, php_ref, idp_ref,
            pts0_w_ref, pts0_b_ref, body_qw_ref, body_dqs_ref, body_invs_ref,
            body_b_ref, skip_x_w_ref,
            feat_qw_ref, feat_dqs_ref, feat_invs_ref, feat_b_ref,
            views_h_w_ref, views_d_w_ref, views_b_ref,
            out_w_hv_ref, out_w_h_ref, out_b_ref, out_ref, *,
            depth: int, skip: int, s_per_ray: int, interleave: int):
    f32 = jnp.float32
    wdt = pts0_w_ref.dtype

    def embed_pts(x_cm):
        # identical to nerf_forward._kernel.embed_pts (exact-f32 elementwise
        # frequencies; see the precision note there)
        E = fp_ref.shape[0]
        sub = x_cm.shape[1]
        xr = jnp.broadcast_to(x_cm[None], (E // 3, 3, sub)).reshape(E, sub)
        y = xr * fp_ref[:]
        e = jnp.where(idp_ref[:] != 0, y, _fast_sin(y + php_ref[:]))
        return e.astype(wdt)

    tile = pts_ref.shape[1]
    rt = dirs_ref.shape[0]
    sub = tile // interleave
    rsub = rt // interleave
    K = range(interleave)

    hv_d_ray = jnp.dot(dirs_ref[:].astype(wdt), views_d_w_ref[:],
                       preferred_element_type=f32)

    def bcast_rays(v, rows):
        return jnp.broadcast_to(
            v[:, None, :], (rows, s_per_ray, v.shape[-1])
        ).reshape(rows * s_per_ray, v.shape[-1])

    xs = [embed_pts(pts_ref[:, k * sub:(k + 1) * sub].astype(f32))
          for k in K]
    fdim = (((0,), (0,)), ((), ()))

    def imm(q, qw):
        return jax.lax.dot_general(q, qw, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    # Folded epilogues (r2l_int8's trick): relu commutes with the positive
    # next-stage scale, so for every body layer whose output feeds ONLY
    # the next int8 matmul the chain dequant -> (+skip) -> bias -> relu ->
    # requantize collapses to one fused multiply-add + relu + round/clip —
    # the wrapper pre-folds inv_{i+1} into body_dqs/body_b/skip_x_w, so
    # the kernel never materializes the unscaled activation. Only the
    # LAST body layer stays unfolded: its h feeds both the bf16 alpha
    # head and the feature quantize.
    def folded_layer(x_w, q, i):
        t = imm(q, body_qw_ref[i - 1]).astype(f32) * body_dqs_ref[i - 1] \
            + body_b_ref[i - 1]
        if i == skip + 1:
            t = t + jax.lax.dot_general(x_w, skip_x_w_ref[:], fdim,
                                        preferred_element_type=f32)
        return jnp.clip(jnp.round(jnp.maximum(t, 0.0)), -127.0, 127.0
                        ).astype(jnp.int8)

    # head output -> first quantize (explicit: h0 comes from a bf16 matmul)
    qs = []
    for k in K:
        h0 = jnp.maximum(
            jax.lax.dot_general(xs[k], pts0_w_ref[:], fdim,
                                preferred_element_type=f32)
            + pts0_b_ref[:].astype(f32), 0.0)
        qs.append(_qstatic(h0, body_invs_ref[0, 0]))
    for i in range(1, depth - 1):
        qs = [folded_layer(xs[k], qs[k], i) for k in K]
    # last body layer: unfolded (plain dqs/bias — the wrapper leaves them
    # unscaled for this row)
    hs = []
    for k in K:
        g = imm(qs[k], body_qw_ref[depth - 2]).astype(f32) \
            * body_dqs_ref[depth - 2] + body_b_ref[depth - 2]
        if depth - 1 == skip + 1:
            g = g + jax.lax.dot_general(xs[k], skip_x_w_ref[:], fdim,
                                        preferred_element_type=f32)
        hs.append(jnp.maximum(g, 0.0))

    for k in K:
        h = hs[k]                                         # f32 [sub, W]
        alpha_part = jnp.dot(h.astype(wdt), out_w_h_ref[:],
                             preferred_element_type=f32)
        feat = (imm(_qstatic(h, feat_invs_ref[0, 0]),
                    feat_qw_ref[:]).astype(f32) * feat_dqs_ref[:]
                + feat_b_ref[:].astype(f32)).astype(wdt)
        hv = (jnp.dot(feat, views_h_w_ref[:], preferred_element_type=f32)
              + bcast_rays(hv_d_ray[k * rsub:(k + 1) * rsub], rsub)
              + views_b_ref[:].astype(f32))
        hv = jnp.maximum(hv, 0.0).astype(wdt)
        rgb_part = jnp.dot(hv, out_w_hv_ref[:], preferred_element_type=f32)
        raw = alpha_part + rgb_part + out_b_ref[:]
        out_ref[:, k * sub:(k + 1) * sub] = raw[:, :4].T


def nerf_forward_int8(params, pts, viewdirs, L: int = 10, L_views: int = 4,
                      *, skip: int = 4, act_scales, tile_p: int = 0,
                      dtype=jnp.bfloat16, interleave: int = 0,
                      interpret: bool = False, cm: bool = False):
    """Int8-body teacher field evaluation; interface mirrors
    nerf_forward_fused (pts [N, S, 3] / cm [3, N, S]; per-ray viewdirs
    [N, 3]; returns raw [N, S, 4] f32 / cm [4, N, S]).

    act_scales [depth] f32 from calibrate_nerf_int8 (required — the
    static-scale epilogue is the whole point; a per-row dynamic reduce
    costs half the int8 win, measured on the R2L kernel)."""
    if act_scales is None:
        raise ValueError("nerf_forward_int8 requires act_scales "
                         "(calibrate_nerf_int8)")
    packed = pack_nerf_weights_int8(params, skip=skip, dtype=dtype)
    if cm:
        assert pts.ndim == 3 and pts.shape[0] == 3, "cm pts must be [3, N, S]"
        N, S = pts.shape[1], pts.shape[2]
    else:
        assert pts.ndim == 3 and pts.shape[-1] == 3, "pts must be [N, S, 3]"
        N, S = pts.shape[0], pts.shape[1]
    assert viewdirs.shape == (N, 3), "viewdirs must be per-ray [N, 3]"

    in_ch, in_ch_views = packed["in_ch"], packed["in_ch_views"]
    Fp, _, _ = nerf_embed_constants(L)
    assert Fp.shape[1] == in_ch and 3 * (2 * L_views + 1) == in_ch_views

    auto_tp, auto_il = _default_tiling(S)
    tile_p = tile_p or auto_tp
    interleave = interleave or auto_il

    dirs_emb = _linearized_embed(viewdirs.astype(jnp.float32), L_views)

    act_scales = jnp.asarray(act_scales, jnp.float32)
    depth0 = packed["depth"]
    inv_all = 1.0 / act_scales                             # [depth]
    # fold[r] = next-stage inverse scale for body row r (layer r+1); the
    # last row stays unfolded (its h feeds alpha + the feature quantize)
    fold = jnp.concatenate([inv_all[1:depth0 - 1],
                            jnp.ones((1,), jnp.float32)])  # [d-1]
    body_dqs = (act_scales[:-1, None] * packed["body_sw"]
                * fold[:, None])                           # [d-1, W]
    body_b = jnp.stack(
        [jnp.asarray(params[f"pts_{i}"]["bias"], jnp.float32)
         for i in range(1, depth0)], 0) * fold[:, None]
    skip_x_w = (packed["skip_x_w"].astype(jnp.float32)
                * fold[skip]).astype(dtype)
    body_invs = (1.0 / act_scales[:-1])[:, None]  # kernel reads row 0 only
    feat_dqs = act_scales[-1] * packed["feat_sw"]          # [W]
    feat_invs = (1.0 / act_scales[-1])[None, None]         # [1, 1]

    r_t = _ray_tile(S, tile_p, interleave)
    n_tiles = -(-N // r_t)
    pad = n_tiles * r_t - N
    if cm:
        if pad:
            pts = jnp.pad(pts, ((0, 0), (0, pad), (0, 0)))
            dirs_emb = jnp.pad(dirs_emb, ((0, pad), (0, 0)))
        pts_cm = pts.reshape(3, -1)
    else:
        if pad:
            pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)))
            dirs_emb = jnp.pad(dirs_emb, ((0, pad), (0, 0)))
        pts_cm = pts.reshape(-1, 3).T
    tile = r_t * S

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    depth, width, half = packed["depth"], packed["width"], packed["half"]
    php, idp = nerf_embed_constants(L)[1:]
    fcol = jnp.sum(Fp, axis=0)[:, None]
    phcol, idcol = php[0][:, None], idp[0][:, None]
    in_specs = [
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((r_t, in_ch_views), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        const_spec((in_ch, 1)), const_spec((in_ch, 1)),
        const_spec((in_ch, 1)),
        const_spec((in_ch, width)), const_spec((width,)),
        const_spec((depth - 1, width, width)),            # body_qw int8
        const_spec((depth - 1, width)),                   # body_dqs
        const_spec((depth - 1, 1)),                       # body_invs
        const_spec((depth - 1, width)),                   # body_b
        const_spec((in_ch, width)),                       # skip_x_w
        const_spec((width, width)),                       # feat_qw int8
        const_spec((width,)),                             # feat_dqs
        const_spec((1, 1)),                               # feat_invs
        const_spec((width,)),                             # feat_b
        const_spec((width, half)), const_spec((in_ch_views, half)),
        const_spec((half,)),
        const_spec((half, LANES)), const_spec((width, LANES)),
        const_spec((LANES,)),
    ]
    assert tile % interleave == 0 and r_t % interleave == 0
    out = pl.pallas_call(
        functools.partial(_kernel, depth=depth, skip=packed["skip"],
                          s_per_ray=S, interleave=interleave),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_tiles * tile), jnp.float32),
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)),
        interpret=interpret,
    )(pts_cm, dirs_emb, fcol, phcol, idcol,
      packed["pts0_w"], packed["pts0_b"],
      packed["body_qw"], body_dqs, body_invs,
      body_b, skip_x_w,
      packed["feat_qw"], feat_dqs, feat_invs,
      jnp.asarray(params["feature"]["bias"], jnp.float32),
      packed["views_h_w"], packed["views_d_w"], packed["views_b"],
      packed["out_w_hv"], packed["out_w_h"], packed["out_b"])

    if cm:
        return out[:, :N * S].reshape(4, N, S)
    return out[:, :N * S].T.reshape(N, S, 4)


def nerf_forward_int8_ref(params, pts, viewdirs, L: int = 10,
                          L_views: int = 4, *, skip: int = 4, act_scales,
                          dtype=jnp.bfloat16, cm: bool = False):
    """Pure-jnp twin with the kernel's exact quantization math. Parity
    oracle for interpret/CPU tests AND the production off-TPU fallback of
    the `--teacher_quant int8` dispatch — the CPU quality gates exercise
    the served arithmetic."""
    f32 = jnp.float32
    if act_scales is None:
        raise ValueError("act_scales required")
    if cm:
        pts_rm = jnp.moveaxis(pts, 0, -1)           # [N, S, 3]
    else:
        pts_rm = pts
    N, S = pts_rm.shape[0], pts_rm.shape[1]
    packed = pack_nerf_weights_int8(params, skip=skip, dtype=dtype)
    depth, width = packed["depth"], packed["width"]
    act_scales = jnp.asarray(act_scales, f32)

    x = _linearized_embed(pts_rm.reshape(-1, 3).astype(f32), L)
    wdt = packed["pts0_w"].dtype
    h0 = jnp.maximum(
        jnp.dot(x.astype(wdt), packed["pts0_w"], preferred_element_type=f32)
        + packed["pts0_b"].astype(f32), 0.0)

    # identical folded epilogue math as the kernel (see _kernel): the
    # next-stage inverse scale is pre-multiplied into dqs/bias/skip for
    # every body layer except the last
    inv_all = 1.0 / act_scales
    fold = jnp.concatenate([inv_all[1:depth - 1],
                            jnp.ones((1,), f32)])
    skip_x_w = (packed["skip_x_w"].astype(f32)
                * fold[skip]).astype(wdt)

    def imm(q, qw):
        return jax.lax.dot_general(q, qw, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    q = _qstatic(h0, inv_all[0])
    for i in range(1, depth):
        r = i - 1
        dqs = act_scales[r] * packed["body_sw"][r] * fold[r]
        b = jnp.asarray(params[f"pts_{i}"]["bias"], f32) * fold[r]
        t = imm(q, packed["body_qw"][r]).astype(f32) * dqs + b
        if i == skip + 1:
            t = t + jnp.dot(x.astype(wdt), skip_x_w,
                            preferred_element_type=f32)
        if i < depth - 1:
            q = jnp.clip(jnp.round(jnp.maximum(t, 0.0)), -127.0, 127.0
                         ).astype(jnp.int8)
        else:
            h = jnp.maximum(t, 0.0)

    alpha_part = jnp.dot(h.astype(wdt), packed["out_w_h"],
                         preferred_element_type=f32)
    feat = (imm(_qstatic(h, inv_all[-1]),
                packed["feat_qw"]).astype(f32)
            * (act_scales[-1] * packed["feat_sw"])
            + jnp.asarray(params["feature"]["bias"], f32)).astype(wdt)
    dirs_emb = _linearized_embed(viewdirs.astype(f32), L_views).astype(wdt)
    hv_d = jnp.dot(dirs_emb, packed["views_d_w"], preferred_element_type=f32)
    hv_d = jnp.broadcast_to(hv_d[:, None, :], (N, S, hv_d.shape[-1])
                            ).reshape(N * S, -1)
    hv = (jnp.dot(feat, packed["views_h_w"], preferred_element_type=f32)
          + hv_d + packed["views_b"].astype(f32))
    hv = jnp.maximum(hv, 0.0).astype(wdt)
    rgb_part = jnp.dot(hv, packed["out_w_hv"], preferred_element_type=f32)
    raw = (alpha_part + rgb_part + packed["out_b"])[:, :4]
    raw = raw.reshape(N, S, 4)
    if cm:
        return jnp.moveaxis(raw, -1, 0)
    return raw
