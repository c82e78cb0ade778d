"""Whole-ray fused teacher renderer (Pallas/Mosaic): coarse eval ->
composite -> inverse-CDF -> z-merge -> fine eval -> composite, ONE kernel.

The reference's eval/pseudo-data hot loop (create_data.py:814-872,
main.py:189-282 of /root/reference) is the coarse+fine volumetric render:
field MLP evals dominated by matmuls, glued together by per-ray sampling
and compositing math. Even with the field-eval megakernel
(ops/pallas/nerf_forward.py), the glue stages between the two passes ran
as ~a dozen separate XLA fusions whose intermediates ([4, N, S] raw fields,
[3, N, S] points, [N, S] z/weights) round-trip HBM, and under jax 0.9 that
glue costs ~66 ms of a 409 ms 400x400 frame (scripts/
profile_teacher_stages.py). Here one grid step takes a tile of rays from
(o, d) all the way to composited per-ray outputs:

  grid step (tile_r rays):
    embed-linearize:  Fo = o @ F, Fd = d @ F  (pts embed distributes over
                      o + z*d, so points are never materialized)
    coarse field:     y = Fo[:,None,:] + z_c * Fd[:,None,:] -> phased sin
                      -> 8-layer MLP + view branch  (MXU, in VMEM)
    composite:        lane-form [R, S] alpha/transmittance/weights; the
                      exclusive cumprod is a log2(S)-stage Hillis-Steele
                      lane scan (pltpu.roll)
    inverse CDF:      the sample_pdf.py kernel's rotate-based interval
                      fori_loop (det levels, sequential CDF)
    z-merge:          flip(z_c) ++ z_fine is bitonic; one Batcher merge,
                      log2-stage roll/min/max compare-exchange on lanes
    fine field:       same field eval at the 192 merged depths
    composite:        -> rgb/disp/acc/depth (+ coarse rgb0/disp0/acc0,
                      z_std), written as one [R, 16] row block

HBM traffic per ray: o, d, embedded viewdirs in; 16 output floats out
(~0.6 KB/ray) — everything between lives in VMEM, and both MLPs' ~1.2 MB
of bf16 weights stay resident across grid steps (constant index maps).

Semantics match render_rays' deterministic eval path (perturb=False,
raw_noise_std=0, det importance levels): reference main.py:624-756 +
helpers.py:283-330, with the same two documented divergences as the
standalone kernels — the top det level u == 1.0 is pinned to the top bin
edge (see ops/pallas/sample_pdf.py), and the transmittance accumulates in
parallel-scan order (~1e-6 vs sequential; the CDF itself is sequential).
Inference only (no VJP).

jax 0.9 Mosaic note: 3D tensors appear ONLY as broadcast+reshape (data
movement). 3D elementwise COMPUTE (the original [R, S, E] embed and the
dense [R, S_f, C] CDF interpolation) makes the register allocator give
every leading index its own vreg temporaries — 215 MB of spill slots at
tile_r=32 (measured; the whole-kernel compile bisect is in scripts/
tune_nerf_frame.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nerf_forward import nerf_embed_constants, pack_nerf_weights
from .trig import fast_sin

__all__ = ["nerf_render_rays_fused"]

LANES = 128
OUT_CH = 16   # rgb(3) disp acc depth rgb0(3) disp0 acc0 z_std pad(4)

# weight operand order for one packed MLP (pack_nerf_weights keys)
_W_KEYS = ("pts0_w", "pts0_b", "body_w", "body_b", "skip_x_w",
           "feat_w", "feat_b", "views_h_w", "views_d_w", "views_b",
           "out_w_hv", "out_w_h", "out_b")


def _field_eval(x, hv_d, w, *, depth: int, skip: int, wdt):
    """Shared MLP eval: x [P, E_pts] f32 embed, hv_d [P, half] f32 per-point
    view-dir contribution, w = dict of weight refs. Returns raw [P, LANES]
    f32 (rgb at lanes 0..2, sigma at lane 3). Mirrors nerf_forward._kernel."""
    f32 = jnp.float32
    xb = x.astype(wdt)
    h = jnp.maximum(
        jnp.dot(xb, w["pts0_w"][:], preferred_element_type=f32)
        + w["pts0_b"][:].astype(f32), 0.0)
    for i in range(1, depth):
        g = jnp.dot(h.astype(wdt), w["body_w"][i - 1],
                    preferred_element_type=f32)
        if i == skip + 1:
            g = g + jnp.dot(xb, w["skip_x_w"][:], preferred_element_type=f32)
        h = jnp.maximum(g + w["body_b"][i - 1].astype(f32), 0.0)
    hb = h.astype(wdt)
    alpha_part = jnp.dot(hb, w["out_w_h"][:], preferred_element_type=f32)
    feat = (jnp.dot(hb, w["feat_w"][:], preferred_element_type=f32)
            + w["feat_b"][:].astype(f32)).astype(wdt)
    hv = jnp.maximum(
        jnp.dot(feat, w["views_h_w"][:], preferred_element_type=f32)
        + hv_d + w["views_b"][:].astype(f32), 0.0).astype(wdt)
    rgb_part = jnp.dot(hv, w["out_w_hv"][:], preferred_element_type=f32)
    return alpha_part + rgb_part + w["out_b"][:]


def _exclusive_cumprod_lanes(x):
    """Exclusive cumprod along the lane axis of [R, S] (Hillis-Steele).

    Parallel-scan association (vs jnp.cumprod's serial definition) — ~ulp
    differences only. Any S works (the fine pass calls it with
    S = n_samples + n_importance, e.g. 192): the doubling stages cover up
    to the next power of two, and the `lane >= s` mask discards wrapped
    rolls."""
    S = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < S:
        x = x * jnp.where(lane >= s, pltpu.roll(x, s, 1), 1.0)
        s *= 2
    return jnp.where(lane == 0, 1.0, pltpu.roll(x, 1, 1))


def _composite(sigma2, rgb2s, z2, dists_raw, normd, white_bkgd: bool,
               diag: str = ""):
    """Lane-form composite: sigma2 [R, S], rgb2s 3x [R, S], z2 [R or 1, S],
    dists_raw [R or 1, S] (z diffs, last = 1e10). Returns per-ray [R, 1]
    (rgb r/g/b, disp, acc, depth) and weights [R, S]."""
    dists = dists_raw * normd
    alpha = 1.0 - jnp.exp(-jnp.maximum(sigma2, 0.0) * dists)
    if "noscan" in diag:       # diagnostic: skip the transmittance scan
        trans = 1.0 - alpha
    else:
        trans = _exclusive_cumprod_lanes(1.0 - alpha + 1e-10)
    w = alpha * trans
    acc = jnp.sum(w, axis=1, keepdims=True)
    rgb = [jnp.sum(w * jax.nn.sigmoid(c), axis=1, keepdims=True)
           for c in rgb2s]
    depth = jnp.sum(w * z2, axis=1, keepdims=True)
    disp = 1.0 / jnp.maximum(1e-10, depth / acc)
    if white_bkgd:
        rgb = [c + (1.0 - acc) for c in rgb]
    return rgb, disp, acc, depth, w


def _lane_dists(z2):
    """z diffs along lanes with the reference's 1e10 final interval."""
    d = pltpu.roll(z2, z2.shape[1] - 1, 1) - z2   # z[i+1] - z[i] (wraps last)
    lane = jax.lax.broadcasted_iota(jnp.int32, z2.shape, 1)
    return jnp.where(lane == z2.shape[1] - 1, 1e10, d)


def _kernel(o_ref, d_ref, de_ref, f_ref, ph_ref, id_ref,
            zc_ref, dc_ref, zcf_ref, zc_col_ref, u2_ref, bins_ref,
            *ws, depth: int, skip: int, s_c: int,
            s_f: int, white_bkgd: bool, eval_chunks: int = 1,
            diag: str = ""):
    zf_col_ref = ws[-1]                 # VMEM scratch [R*s_all, 1]
    out_ref = ws[-2]
    wrefs = ws[:-2]
    wc = dict(zip(_W_KEYS, wrefs[:len(_W_KEYS)]))
    wf = dict(zip(_W_KEYS, wrefs[len(_W_KEYS):2 * len(_W_KEYS)]))
    f32 = jnp.float32
    wdt = wc["pts0_w"].dtype
    rc = o_ref.shape[0]
    s_all = s_c + s_f
    half = wc["views_d_w"].shape[1]

    o = o_ref[:].astype(f32)                     # [R, 3]
    d = d_ref[:].astype(f32)
    # The embed's F matrix has exactly one nonzero per column (channel =
    # column mod 3, nerf_embed's [x, sin(f0 x), cos(f0 x), ...] layout), so
    # o @ F == tile(o) * freqs — computed ELEMENTWISE. This is a precision
    # requirement, not an optimization: in-kernel f32 matmuls truncate
    # operands to bf16 on the MXU (measured 2e-2 per dot), and the
    # Fo + z * Fd formulation amplifies that through z up to `far`.
    in_ch = f_ref.shape[1]

    def tile3(v):
        # [R, 3] -> [R, E] with column e = v[:, e % 3]: three lane-broadcast
        # columns + a lane-index select (a 21-piece lane concat spilled
        # ~200 MB of vregs; this is three selects)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (rc, in_ch), 1) % 3
        vx = jnp.broadcast_to(v[:, 0:1], (rc, in_ch))
        vy = jnp.broadcast_to(v[:, 1:2], (rc, in_ch))
        vz = jnp.broadcast_to(v[:, 2:3], (rc, in_ch))
        return jnp.where(lane3 == 0, vx, jnp.where(lane3 == 1, vy, vz))

    Fo = tile3(o) * f_ref[:]                     # f_ref: [1, E] freq row
    Fd = tile3(d) * f_ref[:]
    normd = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))   # [R, 1]

    de = de_ref[:].astype(wdt)                   # [R, E_views]
    hv_dc = jnp.dot(de, wc["views_d_w"][:], preferred_element_type=f32)
    hv_df = jnp.dot(de, wf["views_d_w"][:], preferred_element_type=f32)

    def bcast(v, S):
        # [r, E] -> [r*S, E] (each ray's row repeated S times). Broadcast +
        # reshape is pure data movement — the one 3D pattern Mosaic handles
        # without per-element compute (nerf_forward's bcast_rays).
        r = v.shape[0]
        return jnp.broadcast_to(v[:, None, :], (r, S, v.shape[-1])
                                ).reshape(r * S, v.shape[-1])

    def field(zcol, S, w, hv_d, n_chunks=1):
        # zcol [R*S, 1] r-major depth column (row r*S + s = ray r, sample
        # s); embed distributes over pts = o + z*d, so y = Fo + z * Fd per
        # (ray-sample row, embed-col). ALL compute is 2D [rows, E]: 3D
        # tensors appear only as broadcast+reshape (jax 0.9's Mosaic
        # register allocator gives 3D elementwise compute per-leading-index
        # temporaries — the original [R, sc, E] formulation spilled >200 MB
        # of vregs). n_chunks > 1 slices RAYS (contiguous r-major rows) so
        # a bigger ray tile keeps the [rows, W] activations inside VMEM.
        while rc % n_chunks:
            n_chunks -= 1
        rck = rc // n_chunks
        sig_parts, rgb_parts = [], []
        for k in range(n_chunks):
            rows = rck * S
            zk = zcol[k * rows:(k + 1) * rows, :]
            rs = slice(k * rck, (k + 1) * rck)
            y = bcast(Fo[rs], S) + zk * bcast(Fd[rs], S)  # [rows, E] f32
            e = jnp.where(id_ref[:] != 0, y, fast_sin(y + ph_ref[:]))
            hvb = bcast(hv_d[rs], S)
            raw = _field_eval(e, hvb, w, depth=depth, skip=skip, wdt=wdt)
            raw3 = raw.reshape(rck, S, LANES)
            # lane-slice + squeeze: sigma/rgb land lane-form [rck, S]
            sig_parts.append(raw3[:, :, 3:4].reshape(rck, S))
            rgb_parts.append([raw3[:, :, c:c + 1].reshape(rck, S)
                              for c in range(3)])
        if n_chunks == 1:
            return sig_parts[0], rgb_parts[0]
        sig = jnp.concatenate(sig_parts, axis=0)
        rgb = [jnp.concatenate([p[c] for p in rgb_parts], axis=0)
               for c in range(3)]
        return sig, rgb

    # ---- coarse pass (z constant across rays: det eval, scalar near/far;
    # the r-major depth column is a host-precomputed constant operand)
    sig_c, rgb_c = field(zc_col_ref[:], s_c, wc, hv_dc,
                         max(1, eval_chunks * s_c // (s_c + s_f)))
    rgb0, disp0, acc0, _, w_c = _composite(
        sig_c, rgb_c, zc_ref[:], dc_ref[:], normd, white_bkgd, diag)

    # ---- det inverse CDF on the interior weights: the rotate-based
    # fori_loop from ops/pallas/sample_pdf.py (one [R, S_f] slot set reused
    # across intervals; the former [R, S_f, C] dense 3D formulation gave
    # every interval its own vreg temporaries under jax 0.9 and spilled).
    # The CDF accumulates sequentially inside the loop — same association
    # as jnp.cumsum / the reference.
    if "nopdf" in diag:        # diagnostic: skip the inverse-CDF stage
        w_c = w_c * 0.0 + 1.0 / s_c
    wmid = w_c[:, 1:s_c - 1] + 1e-5                      # [R, C-1] C = s_c-1
    pdf = wmid / jnp.sum(wmid, axis=1, keepdims=True)
    # per-row bins: a [1, 1] lane slice of the shared row would need a
    # both-axes vector.broadcast Mosaic rejects; [R, 1] -> [R, S_f] is a
    # plain lane broadcast (the standalone kernel's shapes)
    bins = jnp.broadcast_to(bins_ref[:], (rc, bins_ref.shape[1]))
    u2 = u2_ref[:]                                       # [1, S_f]
    btop = bins[:, -1:]                                  # [R, 1]
    if "nointerp" in diag:     # diagnostic: skip the interval loop
        zf = jnp.broadcast_to(u2, (rc, s_f)) * btop
        cdf_last = jnp.ones((rc, 1), f32)
    elif "rollcdf" in diag:
        # the original rotate-based loop (the standalone sample_pdf.py
        # form). Kept as a diagnostic: INSIDE this kernel the two lane
        # rotates per iteration measured ~12 us/iteration — 1.89 s of a
        # 2.24 s frame (sweep 2026-08-20, scripts/tune_nerf_frame.py
        # t64_c2 vs t64_c2_nointerp) — where the masked-reduce form below
        # runs the same sequential math at a negligible cost.
        def interp_body_roll(_, carry):
            acc, cdf_lo, pdf_r, bins_r = carry
            cdf_hi = cdf_lo + pdf_r[:, :1]
            msk = (cdf_lo <= u2) & (u2 < cdf_hi)         # [R, S_f]
            denom = cdf_hi - cdf_lo
            denom = jnp.where(denom < 1e-5, 1.0, denom)
            tt = (u2 - cdf_lo) / denom
            b_lo = bins_r[:, :1]
            val = b_lo + tt * (bins_r[:, 1:2] - b_lo)
            return (acc + jnp.where(msk, val, 0.0), cdf_hi,
                    pltpu.roll(pdf_r, pdf_r.shape[1] - 1, 1),
                    pltpu.roll(bins_r, bins_r.shape[1] - 1, 1))

        zf, cdf_last, _, _ = jax.lax.fori_loop(
            0, s_c - 2, interp_body_roll,
            (jnp.zeros((rc, s_f), f32), jnp.zeros((rc, 1), f32), pdf, bins))
    else:
        # interval c's pdf/bin edges come from masked lane-reduces against
        # a traced-index iota (no rotating carries): the CDF still
        # accumulates sequentially (same association as jnp.cumsum / the
        # reference), but the loop carries only acc + cdf_lo. K intervals
        # are processed per fori_loop iteration: Mosaic's loop-carried
        # values round-trip VMEM each iteration (measured ~5.7 us per
        # carried-iteration vs the ~0.1 us the body's VPU work costs), so
        # amortizing K bodies per carry shrinks the stage ~Kx. The trip
        # count pads to a K multiple: out-of-range intervals extract
        # pdf_i = 0 -> empty [cdf_lo, cdf_lo) mask -> no contribution.
        lane_p = jax.lax.broadcasted_iota(jnp.int32, pdf.shape, 1)
        lane_b = jax.lax.broadcasted_iota(jnp.int32, bins.shape, 1)
        K = 8
        n_iv = s_c - 2

        def interp_body(j, carry):
            acc, cdf_lo = carry
            for k in range(K):
                i = j * K + k
                pdf_i = jnp.sum(jnp.where(lane_p == i, pdf, 0.0), axis=1,
                                keepdims=True)
                b_lo = jnp.sum(jnp.where(lane_b == i, bins, 0.0), axis=1,
                               keepdims=True)
                b_hi = jnp.sum(jnp.where(lane_b == i + 1, bins, 0.0),
                               axis=1, keepdims=True)
                cdf_hi = cdf_lo + pdf_i
                msk = (cdf_lo <= u2) & (u2 < cdf_hi)     # [R, S_f]
                denom = cdf_hi - cdf_lo
                denom = jnp.where(denom < 1e-5, 1.0, denom)
                tt = (u2 - cdf_lo) / denom
                val = b_lo + tt * (b_hi - b_lo)
                acc = acc + jnp.where(msk, val, 0.0)
                cdf_lo = cdf_hi
            return acc, cdf_lo

        zf, cdf_last = jax.lax.fori_loop(
            0, -(-n_iv // K), interp_body,
            (jnp.zeros((rc, s_f), f32), jnp.zeros((rc, 1), f32)))
    zf = zf + (u2 >= cdf_last) * btop
    zf = jnp.where(jnp.broadcast_to(u2, (rc, s_f)) >= 1.0,
                   jnp.broadcast_to(btop, (rc, s_f)), zf)  # pin u == 1.0

    # z_std of the importance samples (RenderResult.z_std)
    zmean = jnp.sum(zf, axis=1, keepdims=True) / s_f
    zstd = jnp.sqrt(jnp.sum((zf - zmean) ** 2, axis=1, keepdims=True) / s_f)

    # ---- bitonic z-merge: flip(z_c) ++ z_fine (++ +inf pad) is bitonic
    if "nomerge" in diag:      # diagnostic: skip the bitonic merge
        z_all = jnp.concatenate(
            [jnp.broadcast_to(zc_ref[:], (rc, s_c)), zf], axis=1)
    else:
        big = jnp.float32(3.4e38)
        n_pad = 1 << max(1, (s_all - 1).bit_length())
        m = jnp.concatenate(
            [jnp.broadcast_to(zcf_ref[:], (rc, s_c)), zf], axis=1)
        if n_pad != s_all:
            m = jnp.concatenate(
                [m, jnp.full((rc, n_pad - s_all), big, f32)], axis=1)
        dist = n_pad // 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (rc, n_pad), 1)
        while dist >= 1:
            part_hi = (lane // dist) % 2 == 1
            up = pltpu.roll(m, n_pad - dist, 1)   # partner j+dist
            dn = pltpu.roll(m, dist, 1)           # partner j-dist
            m = jnp.where(part_hi, jnp.maximum(m, dn), jnp.minimum(m, up))
            dist //= 2
        z_all = m[:, :s_all]                              # [R, S_all]

    # ---- fine pass at the merged depths
    if "nofine" in diag:       # diagnostic: coarse-only timing/outputs
        rgb, disp, acc, dep = rgb0, disp0, acc0, acc0
    else:
        # lane-form [R, S_all] -> r-major [R*S_all, 1] depth column via
        # VMEM scratch: ONE 2D transpose, then per-ray static lane slices
        # stored at static sublane offsets (a direct reshape is a
        # lane->sublane relayout Mosaic rejects: "unsupported shape cast").
        zt = z_all.T                                     # [S_all, R]
        for r in range(rc):
            zf_col_ref[r * s_all:(r + 1) * s_all, :] = zt[:, r:r + 1]
        sig_f, rgb_f = field(zf_col_ref[:], s_all, wf, hv_df, eval_chunks)
        rgb, disp, acc, dep, _ = _composite(
            sig_f, rgb_f, z_all, _lane_dists(z_all), normd, white_bkgd, diag)

    zero = jnp.zeros((rc, 1), f32)
    # spare channels 12-15: intermediate taps for on-chip debugging
    dbg = [zero, zero, zero, zero]
    if "taps2" in diag:
        dbg = [sig_c[:, :1], sig_c[:, s_c // 2:s_c // 2 + 1],
               w_c[:, :1], w_c[:, s_c // 2:s_c // 2 + 1]]
    elif "taps" in diag:
        dbg = [zf[:, :1], zf[:, s_f // 2:s_f // 2 + 1],
               z_all[:, s_all // 2:s_all // 2 + 1],
               jnp.sum(w_c, axis=1, keepdims=True)]
    out_ref[:] = jnp.concatenate(
        rgb + [disp, acc, dep] + rgb0 + [disp0, acc0, zstd] + dbg, axis=1)


def _np_consts(near: float, far: float, s_c: int, s_f: int, L: int,
               lindisp: bool):
    t = np.linspace(0.0, 1.0, s_c)
    if lindisp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    z = z.astype(np.float32)
    dists = np.concatenate([z[1:] - z[:-1], [1e10]]).astype(np.float32)
    zmid = (0.5 * (z[1:] + z[:-1])).astype(np.float32)   # bins [s_c-1]
    u = np.linspace(0.0, 1.0, s_f, dtype=np.float32)
    return (z[None], dists[None], z[::-1][None].copy(), u[None].copy(),
            zmid[None].copy())


def nerf_render_rays_fused(params_coarse, params_fine, rays_o, rays_d,
                           viewdirs, near: float, far: float,
                           n_samples: int, n_importance: int,
                           L: int = 10, L_views: int = 4, *, skip: int = 4,
                           white_bkgd: bool = False, lindisp: bool = False,
                           dtype=jnp.bfloat16, tile_r: int = 32,
                           eval_chunks: int = 1, diag: str = "",
                           interpret: bool = False) -> Tuple[jnp.ndarray, ...]:
    """Fully-fused deterministic coarse+fine render of a ray batch.

    rays_o/rays_d/viewdirs: [N, 3] (viewdirs normalized pre-NDC). Returns
    (rgb [N,3], disp [N], acc [N], depth [N], rgb0 [N,3], disp0 [N],
    acc0 [N], z_std [N]) — the RenderResult fields, matching
    render_rays(cfg.eval_mode()) with scalar near/far.
    """
    from ..pallas.nerf_forward import _linearized_embed

    pc = pack_nerf_weights(params_coarse, skip=skip, dtype=dtype)
    pf = pack_nerf_weights(
        params_fine if params_fine is not None else params_coarse,
        skip=skip, dtype=dtype)
    depth_l, width, half = pc["depth"], pc["width"], pc["half"]
    in_ch, in_ch_views = pc["in_ch"], pc["in_ch_views"]

    F, ph, idm = nerf_embed_constants(L)
    assert F.shape[1] == in_ch and 3 * (2 * L_views + 1) == in_ch_views

    N = rays_o.shape[0]
    dirs_emb = _linearized_embed(viewdirs.astype(jnp.float32), L_views)
    n_tiles = -(-N // tile_r)
    pad = n_tiles * tile_r - N
    if pad:
        z = ((0, pad), (0, 0))
        rays_o = jnp.pad(rays_o, z)
        # zero-norm pad rays produce NaNs in disp; give them unit z dirs
        rays_d = jnp.pad(rays_d, z, constant_values=0.0).at[N:, 2].set(1.0)
        dirs_emb = jnp.pad(dirs_emb, z)

    zc, dc, zcf, u2, bins = (
        jnp.asarray(a) for a in _np_consts(
            float(near), float(far), n_samples, n_importance, L, lindisp))
    # single nonzero per embed column -> its value, as a [1, E] row
    fvec = jnp.sum(F, axis=0, keepdims=True)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    def row(cols):
        return pl.BlockSpec((tile_r, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    c = n_samples - 1
    nb = pc["body_w"].shape[0]
    for k in ("depth", "width", "half", "in_ch", "in_ch_views"):
        if pf[k] != pc[k]:
            raise ValueError(
                f"nerf_render_rays_fused requires matching coarse/fine "
                f"architectures; {k}: coarse={pc[k]} fine={pf[k]} "
                f"(the kernel shares one _field_eval body)")

    def wspecs(p):
        w, h, ic, icv = p["width"], p["half"], p["in_ch"], p["in_ch_views"]
        return [
            const((ic, w)), const((w,)),
            const((p["body_w"].shape[0], w, w)),
            const((p["body_w"].shape[0], w)),
            const((ic, w)),
            const((w, w)), const((w,)),
            const((w, h)), const((icv, h)), const((h,)),
            const((h, LANES)), const((w, LANES)), const((LANES,)),
        ]

    zc_col = jnp.tile(zc[0], (tile_r,))[:, None]         # [tile_r*s_c, 1]
    in_specs = ([row(3), row(3), row(in_ch_views),
                 const((1, in_ch)), const((1, in_ch)), const((1, in_ch)),
                 const((1, n_samples)), const((1, n_samples)),
                 const((1, n_samples)), const((tile_r * n_samples, 1)),
                 const((1, n_importance)), const((1, c))]
                + wspecs(pc) + wspecs(pf))
    operands = ([rays_o, rays_d, dirs_emb, fvec,
                 ph.reshape(1, -1), idm.reshape(1, -1),
                 zc, dc, zcf, zc_col, u2, bins]
                + [pc[k] for k in _W_KEYS] + [pf[k] for k in _W_KEYS])

    out = pl.pallas_call(
        functools.partial(_kernel, depth=depth_l, skip=skip, s_c=n_samples,
                          s_f=n_importance, white_bkgd=white_bkgd,
                          eval_chunks=eval_chunks, diag=diag),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_r, OUT_CH), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_r, OUT_CH),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM(
            (tile_r * (n_samples + n_importance), 1), jnp.float32)],
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)),
        interpret=interpret,
    )(*operands)

    out = out[:N]
    if diag:
        return out   # raw block incl. the channel 12-15 taps
    return (out[:, 0:3], out[:, 3], out[:, 4], out[:, 5],
            out[:, 6:9], out[:, 9], out[:, 10], out[:, 11])
