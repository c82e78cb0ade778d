"""Fused teacher-NeRF field-evaluation megakernel (Pallas/Mosaic).

One kernel evaluates a tile of rays' sample points end-to-end:

    (point, ray viewdir) -> positional encodings (63-d / 27-d)
                         -> 8-layer W256 MLP with input skip
                         -> alpha head + feature head + view layer + rgb head

entirely in VMEM: the ~0.6 MB of weights stay VMEM-resident across grid
steps (constant index maps) and activations never leave VMEM, so HBM
traffic is points in + raw out.

Two TPU-specific embedding decisions (diagnostic sweep,
scripts/tune_nerf_kernel.py — the naive sin+cos+select embed cost 26% of
the whole kernel):

  * single-pass phased trig: the encoding's cos columns are sin columns
    with a +pi/2 phase, so one `sin(y + phase)` pass replaces the
    sin-pass + cos-pass + select chain (the identity columns keep phase 0
    and are restored by one select);
  * per-ray view-dir branch: view directions are constant across a ray's
    S samples, so the kernel grid tiles RAYS (R_t rays x S points per
    step), the wrapper embeds directions once per ray (linearized jnp,
    same math), and the kernel computes the [R_t, half] view-dir
    contribution once and sublane-broadcasts it to the tile's points —
    removing 24 of the 84 per-point transcendentals and the [N, S, 3]
    HBM broadcast of directions entirely.

Like ops/pallas/r2l_forward.py, the point encoding is linearized into a
matmul plus the phased trig, reproducing core.encoding.nerf_embed's
[x, sin(f0 x), cos(f0 x), ...] layout exactly (golden-tested in interpret
mode vs the flax forward).

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
    """Linearized nerf_embed for d=3: F [3, E], phase [E], identity mask [E].

    Layout (core.encoding.nerf_embed): [x, sin(f0 x), cos(f0 x),
    sin(f1 x), cos(f1 x), ...] with f_l = 2^l; each group is 3 wide.
    cos columns become sin columns with a +pi/2 phase (one trig pass).
    """
    E = 3 * (2 * L + 1)
    F = np.zeros((3, E))
    phase = np.zeros((E,), np.float32)
    is_id = np.zeros((E,), np.int32)
    for c in range(3):
        F[c, c] = 1.0
        is_id[c] = 1
    for l in range(L):
        f = 2.0 ** l
        for c in range(3):
            F[c, 3 + 6 * l + c] = f                     # sin
            F[c, 3 + 6 * l + 3 + c] = f                 # cos = sin(+pi/2)
            phase[3 + 6 * l + 3 + c] = np.pi / 2
    return F.astype(np.float32), phase, is_id


def nerf_embed_constants(L: int):
    F, phase, is_id = _nerf_embed_constants_np(L)
    return (jnp.asarray(F), jnp.asarray(phase)[None, :],
            jnp.asarray(is_id)[None, :])


from .trig import fast_sin as _fast_sin  # noqa: E402  (see trig.py)


def _linearized_embed(x, L):
    """Plain-jnp phased embed (same math as the kernel): x [..., 3].

    HIGHEST precision: TPU XLA's default matmul truncates operands to bf16
    and the frequency columns amplify that phase error by 2^(L-1)."""
    F, phase, is_id = nerf_embed_constants(L)
    y = jnp.matmul(x, F, precision=jax.lax.Precision.HIGHEST)
    return jnp.where(is_id != 0, y, _fast_sin(y + phase))


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


def _ray_tile(S: int, tile_p: int, interleave: int = 1) -> int:
    """Rays per grid step. Mosaic block alignment (enforced as of jax 0.9):
    a block dim must be a multiple of the hardware tiling (8 on the sublane
    dim, 128 on the lane dim) unless it equals the full array dim. The
    [3, r_t*S] points block needs r_t*S % 128 == 0 and the [r_t, E_views]
    dirs block r_t % 8 == 0, so r_t is the largest multiple of
    lcm(8, 128/gcd(S, 128), interleave) that fits tile_p points (at least
    one such multiple)."""
    import math
    g = 128 // math.gcd(S, 128)
    step = 8 * g // math.gcd(8, g)
    if interleave > 1:
        step = step * interleave // math.gcd(step, interleave)
    return max(step, (tile_p // S) // step * step)


def _kernel(pts_ref, dirs_ref, fp_ref, php_ref, idp_ref,
            pts0_w_ref, pts0_b_ref, body_w_ref, body_b_ref, skip_x_w_ref,
            feat_w_ref, feat_b_ref, views_h_w_ref, views_d_w_ref, views_b_ref,
            out_w_hv_ref, out_w_h_ref, out_b_ref, out_ref, *,
            depth: int, skip: int, s_per_ray: int, interleave: int,
            t_out: bool = False, diag: str = ""):
    f32 = jnp.float32
    # Matmul accumulators must be 32-bit on the MXU (Mosaic rejects bf16
    # preferred_element_type); the epilogue (bias+relu) runs in f32 and h is
    # cast to the weight dtype per matmul. `interleave` independent
    # sub-tile chains let the scheduler overlap one chain's VPU epilogue
    # with another's MXU matmul.
    wdt = pts0_w_ref.dtype

    def embed_pts(x_cm):
        # x_cm is the channel-major [3, sub] point slice; the [3, P] HBM
        # layout pads 2.7x instead of the 42.7x XLA gives a [P, 3] row
        # tensor (measured: the padded row layout alone moved ~16 GB/frame).
        # Returns the TRANSPOSED embed e_t [E, sub]: row e = f_e * x[e % 3]
        # built exact-f32 ELEMENTWISE (fcol is the [E, 1] single-nonzero
        # column of F). This is a precision requirement: the former
        # x_cm^T @ F MXU dot truncates operands to bf16 (~2^-9 relative)
        # and the 2^l frequency columns amplify that inside sin into an
        # O(1) phase error at the top octaves (measured 0.45 max rgb error
        # vs the exact XLA embed). The consuming matmuls contract dim 0 of
        # e_t directly, so no transpose is ever materialized.
        # sin args reach ~2^9 * |x|: evaluate the trig in f32 always.
        E = fp_ref.shape[0]
        sub = x_cm.shape[1]
        xr = jnp.broadcast_to(x_cm[None], (E // 3, 3, sub)).reshape(E, sub)
        y = xr * fp_ref[:]
        if "nosincos" in diag:   # diagnostic: cost of the trig VPU pass
            return y.astype(wdt)
        sin = jnp.sin if "slowsin" in diag else _fast_sin
        e = jnp.where(idp_ref[:] != 0, y, sin(y + php_ref[:]))
        return e.astype(wdt)

    tile = pts_ref.shape[1]                       # R_t * S points
    rt = dirs_ref.shape[0]                        # R_t rays
    sub = tile // interleave
    rsub = rt // interleave
    K = range(interleave)

    # per-ray view-dir contribution, computed once per ray then sublane-
    # broadcast to the ray's S points ([R_t, half] -> [R_t*S, half])
    hv_d_ray = jnp.dot(dirs_ref[:].astype(wdt), views_d_w_ref[:],
                       preferred_element_type=f32)            # [R_t, half]

    def bcast_rays(v, rows):
        return jnp.broadcast_to(
            v[:, None, :], (rows, s_per_ray, v.shape[-1])
        ).reshape(rows * s_per_ray, v.shape[-1])

    # independent sub-tile chains advanced layer-by-layer so chain B's MXU
    # matmul is adjacent (in program order) to chain A's VPU epilogue.
    xs = [embed_pts(pts_ref[:, k * sub:(k + 1) * sub].astype(f32))
          for k in K]

    fdim = (((0,), (0,)), ((), ()))   # contract the feature-major embed

    def layer(x_w, h, i):
        g = jnp.dot(h.astype(wdt), body_w_ref[i - 1],
                    preferred_element_type=f32)
        if i == skip + 1:
            # post-skip layer: concat([x, h]) @ W == x @ W_x + h @ W_h
            g = g + jax.lax.dot_general(x_w, skip_x_w_ref[:], fdim,
                                        preferred_element_type=f32)
        return jnp.maximum(g + body_b_ref[i - 1].astype(f32), 0.0)

    hs = [jnp.maximum(
        jax.lax.dot_general(xs[k], pts0_w_ref[:], fdim,
                            preferred_element_type=f32)
        + pts0_b_ref[:].astype(f32), 0.0) for k in K]
    for i in range(1, depth):
        hs = [layer(xs[k], hs[k], i) for k in K]

    for k in K:
        h = hs[k].astype(wdt)
        if t_out:
            # transposed epilogue: run the two output matmuls with the
            # feature axis contracted against the LEFT operand so the MXU
            # itself produces [LANES, sub] — the channel-major layout the
            # output wants. The former raw[:, :4].T was a minor-dim-4
            # VPU transpose per sub-tile; here it becomes a sublane slice.
            tm = (((0,), (1,)), ((), ()))
            alpha_t = jax.lax.dot_general(out_w_h_ref[:], h, tm,
                                          preferred_element_type=f32)
            feat = (jnp.dot(h, feat_w_ref[:], preferred_element_type=f32)
                    + feat_b_ref[:].astype(f32)).astype(wdt)
            hv = (jnp.dot(feat, views_h_w_ref[:], preferred_element_type=f32)
                  + bcast_rays(hv_d_ray[k * rsub:(k + 1) * rsub], rsub)
                  + views_b_ref[:].astype(f32))
            hv = jnp.maximum(hv, 0.0).astype(wdt)
            rgb_t = jax.lax.dot_general(out_w_hv_ref[:], hv, tm,
                                        preferred_element_type=f32)
            raw_t = alpha_t + rgb_t + out_b_ref[:][:, None]  # [LANES, sub]
            out_ref[:, k * sub:(k + 1) * sub] = raw_t[:4, :]
            continue
        alpha_part = jnp.dot(h, out_w_h_ref[:], preferred_element_type=f32)
        if "noviews" in diag:   # diagnostic: cost of the whole view branch
            out_ref[:, k * sub:(k + 1) * sub] = (
                alpha_part + out_b_ref[:])[:, :4].T
            continue
        feat = (jnp.dot(h, feat_w_ref[:], preferred_element_type=f32)
                + feat_b_ref[:].astype(f32)).astype(wdt)
        hv = (jnp.dot(feat, views_h_w_ref[:], preferred_element_type=f32)
              + bcast_rays(hv_d_ray[k * rsub:(k + 1) * rsub], rsub)
              + views_b_ref[:].astype(f32))
        hv = jnp.maximum(hv, 0.0).astype(wdt)
        rgb_part = jnp.dot(hv, out_w_hv_ref[:], preferred_element_type=f32)
        raw = alpha_part + rgb_part + out_b_ref[:]       # [sub, LANES]
        if "notranspose" in diag:   # diagnostic: cost of the [T,4]->[4,T]
            out_ref[:, k * sub:(k + 1) * sub] = jnp.broadcast_to(
                jnp.sum(raw, axis=1)[None, :], (4, sub))
            continue
        # compact channel-major output: a LANES-padded [T, 128] f32 raw
        # buffer costs 32x the useful HBM traffic (measured: it made the
        # fused frame *slower* than XLA); [4, T] rows are cheap.
        out_ref[:, k * sub:(k + 1) * sub] = raw[:, :4].T


def _default_tiling(S: int):
    """(tile_p, interleave) per sample count — r5 on-chip sweep under the
    jax 0.9 Mosaic (scripts/tune_nerf_kernel_s.py + long-window sustained
    re-measurement; full writeup in docs/PERF.md r5 section).

    What replicated: at S=64 the chunk-shaped stage test improved 20.7 ->
    16.3 ms per 2.1M-point call with t2048/il2 (same-session before/after).
    What did NOT: the short-run standalone sweep's apparent 15-25% S=192
    deltas — identical configs spread 12.7-16.8 ms/2M across runs, and a
    long-window (8,24)-differenced re-measurement puts il1 and il2 both at
    ~15.3 ms/2M (~150 TF/s). The 400x400 eval frame is unchanged (381-383
    ms, <1% frame-level spread) under every tiling tried; these defaults
    are the sweep's central values, kept because the S=64 stage win is
    real and nothing regresses."""
    if S >= 96:
        return 4096, 2
    return 2048, 2


def nerf_forward_fused(params, pts, viewdirs, L: int = 10, L_views: int = 4,
                       *, skip: int = 4, tile_p: int = 0,
                       dtype=jnp.bfloat16, interleave: int = 0,
                       t_out: bool = False,
                       diag: str = "", interpret: bool = False,
                       cm: bool = False):
    # tile_p/interleave 0 = auto per S (_default_tiling). Other knobs from
    # the r2 diagnostic sweep (scripts/tune_nerf_kernel.py on v5e): t_out
    # (MXU-transposed output epilogue) measured neutral (15.81 vs 15.74
    # ms/2M pts) and stays off; nosincos/noviews diags bound the trig at
    # ~6% and the whole view branch at ~10% — proportionate to their
    # FLOPs, no outlier left.
    """Fused teacher field evaluation.

    pts: [N, S, 3] sample points (S samples per ray); viewdirs: [N, 3]
    per-RAY unit view directions. Returns raw [N, S, 4] f32 (pre-sigmoid
    rgb, pre-relu sigma) — identical layout to NeRFMLP.apply on
    concat([nerf_embed(pts, L), nerf_embed(viewdirs, L_views)]).

    cm=True is the end-to-end channel-major interface: pts is [3, N, S] and
    the return is raw [4, N, S]. The kernel is channel-major internally
    either way; cm skips BOTH boundary transposes ([N, S, 3] row tensors
    lane-pad 3 -> 128, a 42.7x relayout on megabytes of points, and the
    [P, 4] output transpose pays the same 32x on the way out). Callers that
    composite with core.volume.raw2outputs_cm never touch a minor-dim-3/4
    tensor at all.

    The grid tiles rays: R_t = max(1, tile_p // S) rays (R_t * S points)
    per step; directions are embedded per ray in the wrapper (linearized
    jnp, same math as the kernel's point embed).
    """
    packed = pack_nerf_weights(params, skip=skip, dtype=dtype)
    S_auto = pts.shape[2] if (cm and pts.ndim == 3) else (
        pts.shape[1] if pts.ndim == 3 else 0)
    auto_tp, auto_il = _default_tiling(max(1, S_auto))
    tile_p = tile_p or auto_tp
    interleave = interleave or auto_il
    if cm:
        assert pts.ndim == 3 and pts.shape[0] == 3, "cm pts must be [3, N, S]"
        N, S = pts.shape[1], pts.shape[2]
    else:
        assert pts.ndim == 3 and pts.shape[-1] == 3, "pts must be [N, S, 3]"
        N, S = pts.shape[0], pts.shape[1]
    assert viewdirs.shape == (N, 3), "viewdirs must be per-ray [N, 3]"

    in_ch, in_ch_views = packed["in_ch"], packed["in_ch_views"]
    Fp, _, _ = nerf_embed_constants(L)
    assert Fp.shape[1] == in_ch and 3 * (2 * L_views + 1) == in_ch_views, \
        "params embed dims do not match L/L_views"

    # per-ray embedded directions (f32; the kernel casts to the weight dtype)
    dirs_emb = _linearized_embed(viewdirs.astype(jnp.float32), L_views)

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
        # channel-major [3, P]: XLA lane-pads a [P, 3] tensor 42.7x (3 -> 128
        # lanes); this layout pads 2.7x and the kernel contracts dim 0 directly
        pts_cm = pts.reshape(-1, 3).T
    tile = r_t * S

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    depth, width, half = packed["depth"], packed["width"], packed["half"]
    php, idp = nerf_embed_constants(L)[1:]
    # feature-major [E, 1] columns for the transposed elementwise embed:
    # fcol[e] = the single nonzero of F column e (= F[e % 3, e])
    fcol = jnp.sum(Fp, axis=0)[:, None]
    phcol, idcol = php[0][:, None], idp[0][:, None]
    in_specs = [
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((r_t, in_ch_views), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        const_spec((in_ch, 1)), const_spec((in_ch, 1)),
        const_spec((in_ch, 1)),
        const_spec((in_ch, width)), const_spec((width,)),
        const_spec((depth - 1, width, width)), const_spec((depth - 1, width)),
        const_spec((in_ch, width)),
        const_spec((width, width)), const_spec((width,)),
        const_spec((width, half)), const_spec((in_ch_views, half)),
        const_spec((half,)),
        const_spec((half, LANES)), const_spec((width, LANES)),
        const_spec((LANES,)),
    ]
    assert tile % interleave == 0 and r_t % interleave == 0
    out = pl.pallas_call(
        functools.partial(_kernel, depth=depth, skip=packed["skip"],
                          s_per_ray=S, interleave=interleave, t_out=t_out,
                          diag=diag),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_tiles * tile), jnp.float32),
        # large tiles amortize grid-step overhead; the f32 activations of a
        # multi-thousand-point tile exceed the default 16 MB scoped-vmem
        # budget, so raise it (v5e has far more physical VMEM).
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)),
        interpret=interpret,
    )(pts_cm, dirs_emb, fcol, phcol, idcol,
      packed["pts0_w"], packed["pts0_b"], packed["body_w"], packed["body_b"],
      packed["skip_x_w"], packed["feat_w"], packed["feat_b"],
      packed["views_h_w"], packed["views_d_w"], packed["views_b"],
      packed["out_w_hv"], packed["out_w_h"], packed["out_b"])

    if cm:
        return out[:, :N * S].reshape(4, N, S)
    return out[:, :N * S].T.reshape(N, S, 4)
