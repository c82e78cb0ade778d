"""Fused inverse-CDF importance sampler (Pallas, deterministic eval path).

The device-native `core.sampling.sample_pdf` already replaced the
reference's CPU round trip (helpers.py:283-330, called at main.py:722-728)
with a gather-free dense masked interpolation. Under XLA that formulation
still materializes / re-reads [N, S, C] broadcast intermediates between the
compare, interpolate and reduce stages; this kernel runs the identical math
per ray tile entirely in VMEM, so HBM traffic is weights/bins in and
samples out (~1 KB/ray), and the C-interval reduction becomes a loop of
[tile, S] FMAs on the VPU.

Deterministic levels only (u = linspace, the eval/pseudo-data path — the
training path draws random u and keeps the XLA formulation). Semantics are
bit-comparable to sample_pdf(det=True): same 1e-5 weight floor, same
denom < 1e-5 guard, same right-closed top interval handling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sample_pdf_det_fused"]


def _kernel(bins_ref, w_ref, u_ref, out_ref, *, n_bins: int,
            use_roll: bool = True):
    """bins [T, C], weights [T, C-1], u [1, S] -> samples [T, S]."""
    f32 = jnp.float32
    w = w_ref[:].astype(f32) + 1e-5                       # [T, C-1]
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    bins = bins_ref[:].astype(f32)                        # [T, C]
    u = u_ref[:].astype(f32)                              # [1, S]

    t_rows = w.shape[0]
    s = u.shape[1]

    if not use_roll:
        # masked-reduce interval fetch (no rotating carries), K intervals
        # per fori_loop iteration. Two measured Mosaic costs drive this
        # shape (chip, 160k rays x 62 intervals, scripts/
        # bench_sample_pdf.py): the rotate form pays ~2x for its two
        # carried rotating arrays (38.1 vs 13.3 ms), and every loop-carried
        # iteration round-trips its carries through VMEM (~1.4 us/iter
        # latency against ~0.1 us of VPU work), so unrolling K bodies per
        # carry amortizes it. Out-of-range intervals in the padded trip
        # count extract pdf_i = 0 -> empty mask -> no contribution; the
        # sequential CDF accumulation order is IDENTICAL to the roll form.
        lane_p = jax.lax.broadcasted_iota(jnp.int32, pdf.shape, 1)
        lane_b = jax.lax.broadcasted_iota(jnp.int32, bins.shape, 1)
        K = 8

        def body_nr(j, carry):
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
                mask = (cdf_lo <= u) & (u < cdf_hi)
                denom = cdf_hi - cdf_lo
                denom = jnp.where(denom < 1e-5, 1.0, denom)
                t = (u - cdf_lo) / denom
                val = b_lo + t * (b_hi - b_lo)
                acc = acc + jnp.where(mask, val, 0.0)
                cdf_lo = cdf_hi
            return acc, cdf_lo

        acc, cdf_lo = jax.lax.fori_loop(
            0, -(-(n_bins - 1) // K), body_nr,
            (jnp.zeros((t_rows, s), f32), jnp.zeros((t_rows, 1), f32)))
        acc = acc + (u >= cdf_lo) * bins[:, -1:]
        out_ref[:] = jnp.where(u >= 1.0, bins[:, -1:], acc)
        return
    # interval c spans [cdf_{c-1}, cdf_c) with cdf_{-1} = 0; bins_lo/hi are
    # per-ray scalars lane-broadcast against the S sample levels. The CDF is
    # accumulated sequentially inside the same loop (cumsum has no Mosaic
    # lowering, and sequential adds match jnp.cumsum's rounding to ~1e-7 —
    # the denom < 1e-5 duplicate-interval guard is rounding-sensitive, so
    # the association order is semantics here, not style). The loop is a
    # fori_loop, NOT a Python unroll: jax 0.9's Mosaic stack allocator gives
    # every unrolled iteration its own [T, S] temporary slots (62 x 3 tiles
    # blew the scoped-vmem budget at ~86 MB); the carried loop reuses one
    # set. Mosaic has no dynamic lane slice, so instead of indexing interval
    # c the carried operands are lane-ROTATED by one each iteration and the
    # body reads the (static) leading lane.
    def body(_, carry):
        acc, cdf_lo, pdf_r, bins_r = carry
        cdf_hi = cdf_lo + pdf_r[:, :1]
        mask = (cdf_lo <= u) & (u < cdf_hi)               # [T, S]
        denom = cdf_hi - cdf_lo
        denom = jnp.where(denom < 1e-5, 1.0, denom)
        t = (u - cdf_lo) / denom
        b_lo = bins_r[:, :1]
        val = b_lo + t * (bins_r[:, 1:2] - b_lo)
        # rotate left by one (pltpu.roll rejects negative shifts)
        return (acc + jnp.where(mask, val, 0.0), cdf_hi,
                pltpu.roll(pdf_r, pdf_r.shape[1] - 1, 1),
                pltpu.roll(bins_r, bins_r.shape[1] - 1, 1))

    acc, cdf_lo, _, _ = jax.lax.fori_loop(
        0, n_bins - 1, body,
        (jnp.zeros((t_rows, s), f32), jnp.zeros((t_rows, 1), f32),
         pdf, bins))
    # u >= cdf[-1] -> last bin edge
    acc = acc + (u >= cdf_lo) * bins[:, -1:]
    # The top det level u == 1.0 is rounding-ambiguous in the textbook
    # formulation: whether it takes the tail or interpolates the final
    # (possibly degenerate) interval depends on whether the accumulated
    # cdf total rounded above or below 1.0 — core/reference inherit the
    # same instability from their cumsum. Pin it: the top level IS the
    # top bin edge.
    out_ref[:] = jnp.where(u >= 1.0, bins[:, -1:], acc)


def sample_pdf_det_fused(bins, weights, n_samples: int, *, tile_n: int = 1024,
                         use_roll: bool = False, interpret: bool = False):
    """Deterministic inverse-CDF sampling: bins [N, C], weights [N, C-1]
    -> sorted samples [N, n_samples]. Same math as
    core.sampling.sample_pdf(det=True)."""
    n, c = bins.shape
    assert weights.shape == (n, c - 1)
    u = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)[None, :]

    n_tiles = -(-n // tile_n)
    pad = n_tiles * tile_n - n
    if pad:
        bins = jnp.pad(bins, ((0, pad), (0, 0)), constant_values=1.0)
        weights = jnp.pad(weights, ((0, pad), (0, 0)), constant_values=1.0)

    out = pl.pallas_call(
        functools.partial(_kernel, n_bins=c, use_roll=use_roll),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, c - 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_samples), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, n_samples), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_n, n_samples),
                                       jnp.float32),
        interpret=interpret,
    )(bins, weights, u)
    return out[:n]
