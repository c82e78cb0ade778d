"""Int8 (W8A8) R2L inference megakernel.

The bf16 megakernel (r2l_forward.py) runs at ~85% of the v5e's 197 bf16
TFLOP/s; the MXU's int8 path doubles that ceiling (~394 TOPS). This kernel
quantizes the 43-block residual body — 95.6% of the 11.79 MFLOPs/ray — to
int8 with:

  * per-output-channel symmetric weight scales (max|W[:, n]| / 127, packed
    once at call time from the f32 params), and
  * per-tile dynamic activation scales (max|h| / 127 recomputed each layer
    on the VPU), so the residual stream's depth-growing magnitude never
    clips.

The head matmul (embedded input: mixed-magnitude sin/cos + identity
columns that would waste int8 range under one scale) and the tiny tail stay
bf16; accumulation is int32 on the MXU, dequantized as acc * (s_h * s_w[n])
in f32 before bias/relu/residual epilogues — the same f32 epilogue chain as
the bf16 kernel.

This is a serving-path option (reference README.md:17's ~30x headline is
the workload); quality cost is measured, not assumed: the synthetic-scene
gate (tests/test_quality_e2e.py) bounds the PSNR drop vs the bf16 kernel,
and `r2l_forward_int8_ref` is a pure-jnp twin with bit-identical
quantization math for interpret-mode parity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .r2l_forward import (LANES, _doubling_head_perm_np, _point_constants_np,
                          pack_r2l_weights)
from .trig import fast_sincos

__all__ = ["r2l_forward_int8", "r2l_forward_int8_ref",
           "pack_r2l_weights_int8", "calibrate_r2l_int8"]


def _quantize_cols(w):
    """f32 [K, N] -> (int8 [K, N], f32 [N] per-column scales)."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def pack_r2l_weights_int8(params, head_dtype=jnp.bfloat16):
    """R2LNet scan-body params -> bf16 head/tail + int8 body operands."""
    packed = pack_r2l_weights(params, head_dtype)
    w0 = jnp.asarray(params["body"]["lin_0"]["kernel"], jnp.float32)
    w1 = jnp.asarray(params["body"]["lin_1"]["kernel"], jnp.float32)
    q0, s0 = jax.vmap(_quantize_cols)(w0)
    q1, s1 = jax.vmap(_quantize_cols)(w1)
    packed["body_qw"] = jnp.stack([q0, q1], axis=1)      # [n, 2, W, W] int8
    packed["body_sw"] = jnp.stack([s0, s1], axis=1)      # [n, 2, W] f32
    del packed["body_w"]
    return packed


def _qdyn(h):
    """Per-row (per-ray) symmetric dynamic quantization:
    f32 [T, W] -> (int8 [T, W], f32 [T, 1] scales). Row granularity keeps
    rays with small activations at full 8-bit resolution (per-tile scales
    measured ~5x worse worst-case output error)."""
    s = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                    1e-12) / 127.0
    q = jnp.clip(jnp.round(h / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _qstatic(h, inv_s):
    """Static-scale quantization: no reduce, just scale/round/clip/cast.
    Values beyond the calibrated range saturate gracefully at +-127."""
    return jnp.clip(jnp.round(h * inv_s), -127.0, 127.0).astype(jnp.int8)


def _int8_block_math(h, qw, sw, bias, res_scale, dqs=None, inv_s=None):
    """One residual block with int8 matmuls; shared by kernel and jnp twin.

    h f32 [T, W]; qw int8 [2, W, W]; sw f32 [2, W]; bias f32 [2, W].
    Static-calibrated mode (dqs/inv_s set): activation scales are baked in
    — dqs[j] = s_act[j] * sw[j] precomputed, inv_s[j] = 1/s_act[j] — so the
    whole quantize epilogue is mul+round+clip+cast (the per-row dynamic
    max-reduce costs half the int8 MXU win, measured ~150 vs 263 TFLOP/s
    on the bare chain).
    """
    f32 = jnp.float32

    def mm(q, j):
        return jax.lax.dot_general(q, qw[j], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    if dqs is not None:
        # Inner epilogue folded: relu commutes with the positive scale
        # inv_s[1], so dequant -> bias -> relu -> requantize collapses to
        # one fused multiply-add + relu + round/clip (saves a full [T, W]
        # multiply per block on the serial VPU path).
        t = (mm(_qstatic(h, inv_s[0]), 0).astype(f32) * (dqs[0] * inv_s[1])
             + bias[0] * inv_s[1])
        qg = jnp.clip(jnp.round(jnp.maximum(t, 0.0)), -127.0, 127.0
                      ).astype(jnp.int8)
        g = mm(qg, 1).astype(f32) * dqs[1] + bias[1]
        return g * res_scale + h

    qh, sh = _qdyn(h)
    g = mm(qh, 0).astype(f32) * (sh * sw[0]) + bias[0]
    g = jnp.maximum(g, 0.0)
    qg, sg = _qdyn(g)
    g = mm(qg, 1).astype(f32) * (sg * sw[1]) + bias[1]
    return g * res_scale + h


def _doubling_embed(p, n_freq):
    s, c = fast_sincos(p, degree=9)
    sins, coss = [s], [c]
    for _ in range(1, n_freq):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        sins.append(s)
        coss.append(c)
    return jnp.concatenate(sins + coss + [p], axis=-1)


def _doubling_embed_t(p_t, n_freq):
    """Transposed (feature-major) doubling embed: p_t [K, tile] ->
    [K*(2L+1), tile], block layout [sins | coss | p] along dim 0 (same
    feature order as _doubling_embed, so the head-row perm is shared)."""
    s, c = fast_sincos(p_t, degree=9)
    sins, coss = [s], [c]
    for _ in range(1, n_freq):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        sins.append(s)
        coss.append(c)
    return jnp.concatenate(sins + coss + [p_t], axis=0)


def _kernel(o_ref, d_ref, zc_ref, head_w_ref, head_b_ref,
            body_qw_ref, body_sw_ref, body_b_ref, dqs_ref, invs_ref,
            tail_w_ref, tail_b_ref, out_ref, *, n_block: int,
            res_scale: float, use_global_residual: bool, n_freq: int,
            static_scales: bool, interleave: int = 1):
    f32 = jnp.float32
    wdt = head_w_ref.dtype

    # transposed double-angle embedding (see r2l_forward._kernel): the
    # base points are built exact-f32 elementwise (_points_t — an MXU
    # embed dot would put an O(1) phase error on the top octaves), and
    # the head contracts dim 0 of the feature-major embed directly
    from .r2l_forward import _points_t

    o = o_ref[:].astype(f32)              # channel-major [3, tile]
    d = d_ref[:].astype(f32)
    p = _points_t(o, d, zc_ref[:])        # [K, tile]
    x_t = _doubling_embed_t(p, n_freq)    # [in_dim, tile]

    h = jnp.maximum(
        jax.lax.dot_general(x_t.astype(wdt), head_w_ref[:],
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
        + head_b_ref[:], 0.0)
    h0 = h
    # interleave > 1: split the tile's rows into independent chains walked
    # in one unrolled body. The int8 quantize epilogue is serial VPU work
    # on the single-chain critical path (~40% of the block chain); with two
    # chains the scheduler overlaps one chain's quantize with the other's
    # MXU matmul. Row-chunk math is identical, so results are bitwise the
    # same as interleave=1.
    tc = h.shape[0] // interleave
    hs = [h[c * tc:(c + 1) * tc] for c in range(interleave)]
    for i in range(n_block):
        hs = [_int8_block_math(
            hc, body_qw_ref[i], body_sw_ref[i], body_b_ref[i], res_scale,
            dqs=dqs_ref[i] if static_scales else None,
            inv_s=((invs_ref[i, 0], invs_ref[i, 1])
                   if static_scales else None)) for hc in hs]
    h = jnp.concatenate(hs, axis=0) if interleave > 1 else hs[0]
    if use_global_residual:
        h = h + h0
    t = jnp.dot(h.astype(wdt), tail_w_ref[:],
                preferred_element_type=f32) + tail_b_ref[:]
    out_ref[:] = jax.nn.sigmoid(t)


def calibrate_r2l_int8(params, rays_o, rays_d, near: float, far: float,
                       n_sample: int, L: int = 10, *, res_scale: float = 1.0,
                       margin: float = 1.02):
    """Static activation scales for the int8 kernel: run the full-precision
    forward on a calibration ray batch and record each block's input and
    inner-activation max. Returns act_scales [n_block, 2] f32 (= max *
    margin / 127); pass to r2l_forward_int8 to replace the per-row dynamic
    scales (half the quantize-epilogue cost; out-of-range values saturate).
    """
    f32 = jnp.float32
    A, Bz = _point_constants_np(n_sample, float(near), float(far))
    perm = _doubling_head_perm_np(n_sample, L)
    head_w = jnp.asarray(params["head"]["kernel"], f32)[jnp.asarray(perm)]
    head_b = jnp.asarray(params["head"]["bias"], f32)
    w = jnp.stack([jnp.asarray(params["body"]["lin_0"]["kernel"], f32),
                   jnp.asarray(params["body"]["lin_1"]["kernel"], f32)], 1)
    b = jnp.stack([jnp.asarray(params["body"]["lin_0"]["bias"], f32),
                   jnp.asarray(params["body"]["lin_1"]["bias"], f32)], 1)

    # exact elementwise points — the same multiply-add per element as the
    # kernel's _points_t, so p is BITWISE identical to the kernel's (an XLA
    # matmul, even at HIGHEST precision, differs by ulps, and the dynamic
    # per-row quantization scales turn a 1-ulp row-max flip into a whole
    # int8 level)
    z = jnp.asarray(np.linspace(near, far, n_sample), jnp.float32)
    p = (rays_o[:, None, :]
         + z[None, :, None] * rays_d[:, None, :]).reshape(rays_o.shape[0], -1)
    x = _doubling_embed(p, L)
    h = jnp.maximum(x @ head_w + head_b, 0.0)

    def block(h, wb):
        wi, bi = wb
        s_h = jnp.max(jnp.abs(h))
        g = jnp.maximum(h @ wi[0] + bi[0], 0.0)
        s_g = jnp.max(jnp.abs(g))
        h = (g @ wi[1] + bi[1]) * res_scale + h
        return h, jnp.stack([s_h, s_g])

    _, maxes = jax.lax.scan(block, h, (w, b))
    return maxes * (margin / 127.0)


def r2l_forward_int8(params, rays_o, rays_d, near: float, far: float,
                     n_sample: int, L: int = 10, *, tile_b: int = 1024,
                     res_scale: float = 1.0,
                     use_global_residual: bool = False,
                     act_scales=None, head_dtype=jnp.bfloat16,
                     interleave: int = 2, interpret: bool = False):
    """Int8-body fused inference forward. rays [B, 3] -> rgb [B, out_dim].

    act_scales [n_block, 2] (from calibrate_r2l_int8) switches the kernel
    to static activation scales — the production serving mode; None uses
    per-row dynamic scales (calibration-free, slower epilogue)."""
    packed = pack_r2l_weights_int8(params, head_dtype)
    n_block = packed["body_qw"].shape[0]
    width = packed["body_qw"].shape[-1]
    in_dim = packed["head_w"].shape[0]

    perm = _doubling_head_perm_np(n_sample, L)
    head_w = packed["head_w"][jnp.asarray(perm)]
    zc_col = jnp.asarray(np.repeat(
        np.linspace(near, far, n_sample), 3)[:, None].astype(np.float32))

    B = rays_o.shape[0]
    n_tiles = -(-B // tile_b)
    pad = n_tiles * tile_b - B
    if pad:
        rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
        rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)))
    # channel-major [3, B] (see r2l_forward: avoids the 42.7x lane padding)
    rays_o = rays_o.T
    rays_d = rays_d.T

    if tile_b % max(int(interleave), 1):
        interleave = 1
    static_scales = act_scales is not None
    if static_scales:
        act_scales = jnp.asarray(act_scales, jnp.float32)
        dqs = act_scales[:, :, None] * packed["body_sw"]   # [n, 2, W]
        invs = 1.0 / act_scales                            # [n, 2]
    else:
        dqs = jnp.zeros((1, 2, width), jnp.float32)
        invs = jnp.ones((1, 2), jnp.float32)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, n_block=n_block, res_scale=res_scale,
        use_global_residual=use_global_residual, n_freq=L,
        static_scales=static_scales, interleave=int(interleave))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            const_spec((n_sample * 3, 1)),
            const_spec((in_dim, width)),
            const_spec((width,)),
            const_spec((n_block, 2, width, width)),
            const_spec((n_block, 2, width)),
            const_spec((n_block, 2, width)),
            const_spec(tuple(dqs.shape)),
            const_spec(tuple(invs.shape)),
            const_spec((width, LANES)),
            const_spec((LANES,)),
        ],
        out_specs=pl.BlockSpec((tile_b, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_b, LANES),
                                       jnp.float32),
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)),
        interpret=interpret,
    )(rays_o, rays_d, zc_col, head_w,
      packed["head_b"], packed["body_qw"], packed["body_sw"],
      packed["body_b"], dqs, invs, packed["tail_w"], packed["tail_b"])
    return out[:B, :packed["out_dim"]]


def r2l_forward_int8_ref(params, rays_o, rays_d, near: float, far: float,
                         n_sample: int, L: int = 10, *,
                         res_scale: float = 1.0,
                         use_global_residual: bool = False,
                         act_scales=None, head_dtype=jnp.float32):
    """Pure-jnp twin of the int8 kernel (same quantization math, whole
    batch as one tile). Parity oracle for interpret-mode tests."""
    f32 = jnp.float32
    packed = pack_r2l_weights_int8(params, head_dtype)
    A, Bz = _point_constants_np(n_sample, float(near), float(far))
    perm = _doubling_head_perm_np(n_sample, L)
    head_w = packed["head_w"][jnp.asarray(perm)]

    # exact elementwise points — the same multiply-add per element as the
    # kernel's _points_t, so p is BITWISE identical to the kernel's (an XLA
    # matmul, even at HIGHEST precision, differs by ulps, and the dynamic
    # per-row quantization scales turn a 1-ulp row-max flip into a whole
    # int8 level)
    z = jnp.asarray(np.linspace(near, far, n_sample), jnp.float32)
    p = (rays_o[:, None, :]
         + z[None, :, None] * rays_d[:, None, :]).reshape(rays_o.shape[0], -1)
    x = _doubling_embed(p, L)

    h = jnp.maximum(
        jnp.dot(x.astype(head_dtype), head_w,
                preferred_element_type=f32) + packed["head_b"], 0.0)
    h0 = h
    if act_scales is not None:
        act_scales = jnp.asarray(act_scales, f32)
        dqs_all = act_scales[:, :, None] * packed["body_sw"]
        invs_all = 1.0 / act_scales
    for i in range(packed["body_qw"].shape[0]):
        h = _int8_block_math(
            h, packed["body_qw"][i], packed["body_sw"][i],
            packed["body_b"][i], res_scale,
            dqs=None if act_scales is None else dqs_all[i],
            inv_s=None if act_scales is None
            else (invs_all[i, 0], invs_all[i, 1]))
    if use_global_residual:
        h = h + h0
    t = jnp.dot(h.astype(head_dtype), packed["tail_w"],
                preferred_element_type=f32) + packed["tail_b"]
    out = jax.nn.sigmoid(t)
    return out[:, :packed["out_dim"]]
