"""Positional encodings.

Two distinct layouts exist in the reference and BOTH matter for checkpoint
parity (the first linear layer of each model is laid out against them):

1. `nerf_embed` — the teacher's per-point encoding
   (reference helpers.py:24-74): for input x in R^d the output is
   [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...],
   i.e. identity block first, then per-frequency sin/cos of the whole
   vector. d=3, L=10 -> 63 dims; L=4 -> 27 dims.

2. `ray_embed` — the R2L student's flattened-ray encoding
   (reference nerf_raybased.py:191-223): for a flattened ray of K scalars,
   each scalar k expands to [sin(2^0 k..2^{L-1} k), cos(2^0 k..2^{L-1} k), k]
   and the result is flattened to [..., K*(2L+1)], e.g. 48*21 = 1008.

Both are pure broadcast math; XLA fuses them into the consuming matmul. The
Pallas fused sampler+embedder (ops/pallas) reproduces layout (2) exactly.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["nerf_embed", "nerf_embed_dim", "ray_embed", "ray_embed_dim"]


def nerf_embed_dim(d: int, L: int, include_input: bool = True) -> int:
    return d * (2 * L + int(include_input))


def _doubling_sincos(x, L: int):
    """sin/cos at octave frequencies 2^j x, j in [0, L), via double-angle
    recurrences: ONE sin/cos transcendental pair per element instead of L.

    Measured on v5e the per-frequency trig is the single largest VPU cost
    of both render paths (29% of the R2L megakernel frame before this
    optimization; the teacher evaluates ~1.85G transcendentals per 400x400
    frame). sin2x = 2 s c and cos2x = 1 - 2 s^2 replace each extra octave
    with three fused mul/adds. f32 error amplification is ~2^L ulp ~ 1e-4
    at L=10 — far below bf16 weight rounding and reconstruction error.

    Returns (sins, coss): each [..., L, d].
    """
    s = jnp.sin(x)
    c = jnp.cos(x)
    sins, coss = [s], [c]
    for _ in range(1, L):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        sins.append(s)
        coss.append(c)
    return jnp.stack(sins, axis=-2), jnp.stack(coss, axis=-2)


def nerf_embed(x, L: int, include_input: bool = True, fast: bool = False):
    """Teacher-style encoding. x: [..., d] -> [..., d*(2L+1)].

    Layout: [x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...] with
    log-spaced freqs f_i = 2^i, i in [0, L).

    fast=True uses the double-angle recurrence (_doubling_sincos): ~L x
    fewer transcendentals at ~1e-4 absolute error — the perf paths' choice
    (RenderConfig.fast_embed); exact mode is kept for the reference-parity
    gates.
    """
    if L == 0:
        return x
    if fast:
        sin, cos = _doubling_sincos(x, L)
    else:
        freqs = 2.0 ** jnp.arange(L, dtype=x.dtype)  # [L]
        xf = x[..., None, :] * freqs[:, None]  # [..., L, d]
        sin = jnp.sin(xf)
        cos = jnp.cos(xf)
    # interleave per frequency: sin(f_i * x) then cos(f_i * x)
    sc = jnp.stack([sin, cos], axis=-2)  # [..., L, 2, d]
    sc = sc.reshape(x.shape[:-1] + (2 * L * x.shape[-1],))
    if include_input:
        return jnp.concatenate([x, sc], axis=-1)
    return sc


def ray_embed_dim(K: int, L: int, include_input: bool = True) -> int:
    return K * (2 * L + int(include_input))


def ray_embed(x, L: int, include_input: bool = True, fast: bool = False):
    """R2L-style encoding. x: [..., K] -> [..., K*(2L+1)].

    Per scalar layout: [sin(f0 k)..sin(f_{L-1} k), cos(f0 k)..cos(f_{L-1} k), k].
    fast=True: double-angle recurrence (see _doubling_sincos) — used by the
    jitted train steps; the Pallas megakernel has its own fused variant.
    """
    if fast:
        # _doubling_sincos stacks octaves on axis -2: feed [..., K, 1] and
        # squeeze to get the [..., K, L] per-scalar layout
        sin, cos = _doubling_sincos(x[..., None], L)
        parts = [sin.squeeze(-1), cos.squeeze(-1)]
    else:
        freqs = 2.0 ** jnp.arange(L, dtype=x.dtype)  # [L]
        y = x[..., None] * freqs  # [..., K, L]
        parts = [jnp.sin(y), jnp.cos(y)]
    if include_input:
        parts.append(x[..., None])
    out = jnp.concatenate(parts, axis=-1)  # [..., K, 2L+1]
    return out.reshape(x.shape[:-1] + (-1,))
