"""Fused teacher-NeRF field-evaluation megakernel (Pallas/Mosaic).

One kernel evaluates a tile of sample points end-to-end:

    (point, viewdir) -> positional encodings (63-d / 27-d)
                     -> 8-layer W256 MLP with input skip
                     -> alpha head + feature head + view layer + rgb head

entirely in VMEM: the ~0.6 MB of weights stay VMEM-resident across grid
steps (constant index maps) and activations never leave VMEM, so HBM
traffic is points in + raw out.

Measured on v5e (docs/PERF.md): 1.6x over the XLA lowering on isolated
point evaluation (24.7 vs 39.5 ms / 2M points, ~101 bf16-TFLOP/s), but only
parity inside the full render_rays frame program, where XLA's fused
epilogues reach the same serial MXU+VPU floor — so the frame renderer keeps
the XLA path by default (RenderConfig.fused_teacher opts in). The kernel is
the fast path for workloads that evaluate the field directly at points.

Like ops/pallas/r2l_forward.py, the encodings are linearized into matmuls
plus a trig select:
    y[p, j] = x[p] @ F[:, j],  emb = {sin, cos, id}(y)  per-column mode
reproducing core.encoding.nerf_embed's [x, sin(f0 x), cos(f0 x), ...] layout
exactly (golden-tested in interpret mode vs the flax forward).

Inference only (no VJP): used by the eval/pseudo-data render paths; teacher
*training* keeps the XLA path (its cost is the matmul backward anyway).

Covers the reference teacher profile (model/nerf_raybased.py:337-440):
depth 8, one input skip, viewdir branch. Width/L are free parameters.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nerf_forward_fused", "pack_nerf_weights", "nerf_embed_constants"]

LANES = 128


@functools.lru_cache(maxsize=8)
def _nerf_embed_constants_np(L: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Linearized nerf_embed for d=3: F [3, 3*(2L+1)], sin/cos masks.

    Layout (core.encoding.nerf_embed): [x, sin(f0 x), cos(f0 x),
    sin(f1 x), cos(f1 x), ...] with f_l = 2^l; each group is 3 wide.
    """
    E = 3 * (2 * L + 1)
    F = np.zeros((3, E))
    mode = np.full((E,), 2, np.int32)  # 2 = identity
    for c in range(3):
        F[c, c] = 1.0
    for l in range(L):
        f = 2.0 ** l
        for c in range(3):
            F[c, 3 + 6 * l + c] = f
            mode[3 + 6 * l + c] = 0  # sin
            F[c, 3 + 6 * l + 3 + c] = f
            mode[3 + 6 * l + 3 + c] = 1  # cos
    return F.astype(np.float32), (mode == 0).astype(np.int32), \
        (mode == 1).astype(np.int32)


def nerf_embed_constants(L: int):
    F, sin_m, cos_m = _nerf_embed_constants_np(L)
    return jnp.asarray(F), jnp.asarray(sin_m)[None, :], jnp.asarray(cos_m)[None, :]


def pack_nerf_weights(params, skip: int = 4, dtype=jnp.bfloat16):
    """NeRFMLP flax params -> packed kernel operands.

    The post-skip layer's [63+W, W] kernel is split into its pts-embed rows
    and hidden rows (in-kernel `concat` becomes two matmuls); the view layer's
    [W+27, W/2] kernel likewise; the rgb [W/2, 3] and alpha [W, 1] heads are
    packed into one LANES-wide output projection (rgb at columns 0..2, alpha
    at column 3).
    """
    def k(name):
        return jnp.asarray(params[name]["kernel"], dtype)

    def b(name):
        # inner biases live in the compute dtype (the epilogues run in it);
        # only the final output bias stays f32.
        return jnp.asarray(params[name]["bias"], dtype)

    depth = 0
    while f"pts_{depth}" in params:
        depth += 1
    in_ch = params["pts_0"]["kernel"].shape[0]           # 3*(2L+1)
    width = params["pts_0"]["kernel"].shape[1]
    in_ch_views = params["views_0"]["kernel"].shape[0] - width
    half = params["views_0"]["kernel"].shape[1]

    pts_w, pts_b = [], []
    skip_x = jnp.zeros((in_ch, width), dtype)
    for i in range(depth):
        kk = k(f"pts_{i}")
        if i == skip + 1:
            skip_x, kk = kk[:in_ch], kk[in_ch:]
        pts_w.append(kk)
        pts_b.append(b(f"pts_{i}"))

    # stack the uniform [W, W] layers for one constant-index operand
    body_w = jnp.stack(pts_w[1:], 0)                      # [depth-1, W, W]
    body_b = jnp.stack(pts_b[1:], 0)

    views_k = k("views_0")
    out_w_hv = jnp.zeros((half, LANES), dtype).at[:, :3].set(k("rgb"))
    out_w_h = jnp.zeros((width, LANES), dtype).at[:, 3:4].set(k("alpha"))
    out_b = jnp.zeros((LANES,), jnp.float32)
    out_b = out_b.at[:3].set(jnp.asarray(params["rgb"]["bias"], jnp.float32))
    out_b = out_b.at[3].set(jnp.asarray(params["alpha"]["bias"],
                                        jnp.float32)[0])

    return {
        "pts0_w": pts_w[0], "pts0_b": pts_b[0],
        "body_w": body_w, "body_b": body_b,
        "skip_x_w": skip_x,
        "feat_w": k("feature"), "feat_b": b("feature"),
        "views_h_w": views_k[:width], "views_d_w": views_k[width:],
        "views_b": b("views_0"),
        "out_w_hv": out_w_hv, "out_w_h": out_w_h, "out_b": out_b,
        "depth": depth, "skip": skip, "width": width,
        "in_ch": in_ch, "in_ch_views": in_ch_views, "half": half,
    }


def _kernel(pts_ref, dirs_ref, fp_ref, sp_ref, cp_ref, fd_ref, sd_ref, cd_ref,
            pts0_w_ref, pts0_b_ref, body_w_ref, body_b_ref, skip_x_w_ref,
            feat_w_ref, feat_b_ref, views_h_w_ref, views_d_w_ref, views_b_ref,
            out_w_hv_ref, out_w_h_ref, out_b_ref, out_ref, *,
            depth: int, skip: int, interleave: int):
    f32 = jnp.float32
    # Matmul accumulators must be 32-bit on the MXU (Mosaic rejects bf16
    # preferred_element_type); the epilogue (bias+relu) runs in the compute
    # dtype and h stays in it between layers, so each layer costs one f32
    # accumulate + in-dtype add/max. `interleave` independent sub-tile
    # chains let the scheduler overlap one chain's VPU epilogue with
    # another's MXU matmul.
    wdt = pts0_w_ref.dtype

    def embed(x, f_ref, s_ref, c_ref):
        # sin/cos args reach ~2^9 * |x|: evaluate the trig in f32 always.
        y = jnp.dot(x, f_ref[:], preferred_element_type=f32)
        e = jnp.where(s_ref[:] != 0, jnp.sin(y),
                      jnp.where(c_ref[:] != 0, jnp.cos(y), y))
        return e.astype(wdt)

    tile = pts_ref.shape[0]
    sub = tile // interleave
    K = range(interleave)

    # independent sub-tile chains advanced layer-by-layer so chain B's MXU
    # matmul is adjacent (in program order) to chain A's VPU epilogue.
    # Activations stay f32 between layers (bf16 VPU arithmetic is emulated
    # via f32 on this core — measured slower, not faster).
    xs = [embed(pts_ref[k * sub:(k + 1) * sub].astype(f32),
                fp_ref, sp_ref, cp_ref) for k in K]
    xds = [embed(dirs_ref[k * sub:(k + 1) * sub].astype(f32),
                 fd_ref, sd_ref, cd_ref) for k in K]

    def layer(x_w, h, i):
        g = jnp.dot(h.astype(wdt), body_w_ref[i - 1],
                    preferred_element_type=f32)
        if i == skip + 1:
            # post-skip layer: concat([x, h]) @ W == x @ W_x + h @ W_h
            g = g + jnp.dot(x_w, skip_x_w_ref[:], preferred_element_type=f32)
        return jnp.maximum(g + body_b_ref[i - 1].astype(f32), 0.0)

    hs = [jnp.maximum(
        jnp.dot(xs[k], pts0_w_ref[:], preferred_element_type=f32)
        + pts0_b_ref[:].astype(f32), 0.0) for k in K]
    for i in range(1, depth):
        hs = [layer(xs[k], hs[k], i) for k in K]

    for k in K:
        h, xd = hs[k].astype(wdt), xds[k]
        alpha_part = jnp.dot(h, out_w_h_ref[:], preferred_element_type=f32)
        feat = (jnp.dot(h, feat_w_ref[:], preferred_element_type=f32)
                + feat_b_ref[:].astype(f32)).astype(wdt)
        hv = (jnp.dot(feat, views_h_w_ref[:], preferred_element_type=f32)
              + jnp.dot(xd, views_d_w_ref[:], preferred_element_type=f32)
              + views_b_ref[:].astype(f32))
        hv = jnp.maximum(hv, 0.0).astype(wdt)
        rgb_part = jnp.dot(hv, out_w_hv_ref[:], preferred_element_type=f32)
        raw = alpha_part + rgb_part + out_b_ref[:]       # [sub, LANES]
        # compact channel-major output: a LANES-padded [T, 128] f32 raw
        # buffer costs 32x the useful HBM traffic (measured: it made the
        # fused frame *slower* than XLA); [4, T] rows are cheap.
        out_ref[:, k * sub:(k + 1) * sub] = raw[:, :4].T


def nerf_forward_fused(params, pts, viewdirs, L: int = 10, L_views: int = 4,
                       *, skip: int = 4, tile_p: int = 2048,
                       dtype=jnp.bfloat16, interleave: int = 1,
                       interpret: bool = False):
    """Fused teacher field evaluation.

    pts: [..., 3] sample points; viewdirs: [..., 3] per-point unit view
    directions (same leading shape). Returns raw [..., 4] f32 (pre-sigmoid
    rgb, pre-relu sigma) — identical layout to NeRFMLP.apply on
    concat([nerf_embed(pts, L), nerf_embed(viewdirs, L_views)]).
    """
    packed = pack_nerf_weights(params, skip=skip, dtype=dtype)
    lead = pts.shape[:-1]
    pts = pts.reshape(-1, 3)
    viewdirs = jnp.broadcast_to(viewdirs, lead + (3,)).reshape(-1, 3)

    Fp, sp, cp = nerf_embed_constants(L)
    Fd, sd, cd = nerf_embed_constants(L_views)
    in_ch, in_ch_views = packed["in_ch"], packed["in_ch_views"]
    assert Fp.shape[1] == in_ch and Fd.shape[1] == in_ch_views, \
        "params embed dims do not match L/L_views"

    P = pts.shape[0]
    n_tiles = -(-P // tile_p)
    pad = n_tiles * tile_p - P
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)))
        viewdirs = jnp.pad(viewdirs, ((0, pad), (0, 0)))

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    depth, width, half = packed["depth"], packed["width"], packed["half"]
    in_specs = [
        pl.BlockSpec((tile_p, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_p, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        const_spec((3, in_ch)), const_spec((1, in_ch)), const_spec((1, in_ch)),
        const_spec((3, in_ch_views)), const_spec((1, in_ch_views)),
        const_spec((1, in_ch_views)),
        const_spec((in_ch, width)), const_spec((width,)),
        const_spec((depth - 1, width, width)), const_spec((depth - 1, width)),
        const_spec((in_ch, width)),
        const_spec((width, width)), const_spec((width,)),
        const_spec((width, half)), const_spec((in_ch_views, half)),
        const_spec((half,)),
        const_spec((half, LANES)), const_spec((width, LANES)),
        const_spec((LANES,)),
    ]
    assert tile_p % interleave == 0
    out = pl.pallas_call(
        functools.partial(_kernel, depth=depth, skip=packed["skip"],
                          interleave=interleave),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, tile_p), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_tiles * tile_p), jnp.float32),
        # large tiles amortize grid-step overhead; the f32 activations of a
        # 4096-point tile exceed the default 16 MB scoped-vmem budget, so
        # raise it (v5e has 128 MB physical VMEM).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pts, viewdirs, Fp, sp, cp, Fd, sd, cd,
      packed["pts0_w"], packed["pts0_b"], packed["body_w"], packed["body_b"],
      packed["skip_x_w"], packed["feat_w"], packed["feat_b"],
      packed["views_h_w"], packed["views_d_w"], packed["views_b"],
      packed["out_w_hv"], packed["out_w_h"], packed["out_b"])

    return out[:, :P].T.reshape(lead + (4,))
