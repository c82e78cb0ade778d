"""Fast polynomial sine/cosine for Pallas kernels.

Mosaic lowers jnp.sin to a long generic polynomial — measured 26% of the
whole teacher field-eval kernel (scripts/tune_nerf_kernel.py). The
positional encodings don't need that precision (their consumers are bf16
matmuls, rounding at ~4e-3): Cody-Waite two-term pi range reduction plus a
short odd minimax polynomial on [-pi/2, pi/2] is ~3x cheaper.

degree=7: max abs err ~7e-7 (+ k*3e-7 from the pi split; k <= ~1e3 at the
encodings' 2^9 max frequency) — used where the value feeds bf16 weights
directly. degree=9: ~1e-8 — used as the BASE angle of the double-angle
recurrence embeds, whose L doublings amplify base error by ~2^L.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fast_sin", "fast_cos", "fast_sincos"]

_INV_PI = 0.3183098861837907
_PI_HI = 3.140625
_PI_LO = 9.676535897932e-4

# odd minimax coefficients for sin on [-pi/2, pi/2]
_C7 = (0.9999966, -0.16664824, 0.00830629, -0.00018363)
_C9 = (0.99999998278, -0.16666651520, 8.3329640073e-3, -1.9804754584e-4,
       2.5981089066e-6)


def fast_sin(y, degree: int = 7):
    k = jnp.round(y * _INV_PI)
    r = y - k * _PI_HI - k * _PI_LO
    r2 = r * r
    if degree >= 9:
        c1, c3, c5, c7, c9 = _C9
        p = r * (c1 + r2 * (c3 + r2 * (c5 + r2 * (c7 + r2 * c9))))
    else:
        c1, c3, c5, c7 = _C7
        p = r * (c1 + r2 * (c3 + r2 * (c5 + r2 * c7)))
    sign = 1.0 - 2.0 * (k - 2.0 * jnp.floor(k * 0.5))   # (-1)^k
    return p * sign


def fast_cos(y, degree: int = 7):
    return fast_sin(y + 0.5 * jnp.pi, degree)


# even minimax coefficients for cos on [-pi/2, pi/2]
_CC8 = (0.99999996727, -0.49999926896, 4.1664091297e-2, -1.3857421328e-3,
        2.3237633547e-5)


def fast_sincos(y, degree: int = 9):
    """(sin y, cos y) sharing one range reduction — the base-angle pair of
    the double-angle recurrence embeds (both needed, and the recurrence
    amplifies base error by ~2^L, so cos gets its own even polynomial
    instead of the less-accurate phase-shifted sine)."""
    k = jnp.round(y * _INV_PI)
    r = y - k * _PI_HI - k * _PI_LO
    r2 = r * r
    if degree >= 9:
        c1, c3, c5, c7, c9 = _C9
        s = r * (c1 + r2 * (c3 + r2 * (c5 + r2 * (c7 + r2 * c9))))
    else:
        c1, c3, c5, c7 = _C7
        s = r * (c1 + r2 * (c3 + r2 * (c5 + r2 * c7)))
    d0, d2, d4, d6, d8 = _CC8
    c = d0 + r2 * (d2 + r2 * (d4 + r2 * (d6 + r2 * d8)))
    sign = 1.0 - 2.0 * (k - 2.0 * jnp.floor(k * 0.5))   # (-1)^k
    return s * sign, c * sign
