"""Mosaic capability probes for the fused-frame kernel's layout moves.

Each probe compiles + runs a tiny pallas kernel exercising one reshape /
relayout / roll pattern the planned full-frame teacher kernel
(ops/pallas/nerf_frame.py) relies on, and checks the result against numpy.
Run on the real chip: patterns that interpret-mode accepts can still be
rejected (or mis-lowered) by Mosaic.

Usage: python scripts/probe_mosaic.py [probe ...]
"""
import os
import sys
import functools

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, x, want, out_shape):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(x)
        ok = np.allclose(np.asarray(out), want, atol=1e-5)
        print(f"{name:28s} {'OK' if ok else 'WRONG RESULT'}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        print(f"{name:28s} FAIL {type(e).__name__}: {msg}")


RC, S, E = 32, 64, 63
P = RC * S


def main(names):
    rng = np.random.default_rng(0)

    probes = {}

    # 1. split lanes of [1, P] into [RC, S] (row r = contiguous lane chunk)
    xa = rng.normal(size=(1, P)).astype(np.float32)
    probes["lanes_split_1P_to_RCS"] = (
        lambda i, o: o.__setitem__(slice(None), i[:].reshape(RC, S)),
        xa, xa.reshape(RC, S), (RC, S))

    # 2. [RC, S] (S on lanes) -> [RC, S, 1] (S on sublanes)
    xb = rng.normal(size=(RC, S)).astype(np.float32)
    probes["unit_minor_append"] = (
        lambda i, o: o.__setitem__(slice(None), i[:].reshape(RC, S, 1)),
        xb, xb.reshape(RC, S, 1), (RC, S, 1))

    # 3. [RC, C] -> [RC, 1, C] (rc sublanes -> major)
    probes["unit_mid_insert"] = (
        lambda i, o: o.__setitem__(slice(None), i[:][:, None, :]),
        xb, xb[:, None, :], (RC, 1, S))

    # 4. merge leading dims [RC, S, E] -> [P, E]
    xc = rng.normal(size=(RC, S, E)).astype(np.float32)
    probes["merge_leading"] = (
        lambda i, o: o.__setitem__(slice(None), i[:].reshape(P, E)),
        xc, xc.reshape(P, E), (P, E))

    # 5. split leading dims [P, E] -> [RC, S, E]
    xd = rng.normal(size=(P, E)).astype(np.float32)
    probes["split_leading"] = (
        lambda i, o: o.__setitem__(slice(None), i[:].reshape(RC, S, E)),
        xd, xd.reshape(RC, S, E), (RC, S, E))

    # 6. lane roll (bitonic merge building block)
    probes["lane_roll"] = (
        lambda i, o: o.__setitem__(slice(None), pltpu.roll(i[:], 3, 1)),
        xb, np.roll(xb, 3, 1), (RC, S))

    # 7. sublane roll on 3D (segment scan building block)
    probes["sublane_roll_3d"] = (
        lambda i, o: o.__setitem__(slice(None),
                                   pltpu.roll(i[:], 5, 1)),
        xc, np.roll(xc, 5, 1), (RC, S, E))

    # 8. 2D broadcast [RC,1]x[1,S] style via 3D: [RC,1,E]*[RC,S,1]
    def bcast3(i, o):
        a = i[:][:, :1, :]           # [RC, 1, E]
        b = i[:][:, :, :1]           # [RC, S, 1]
        o[:] = a * b
    probes["bcast_3d"] = (
        bcast3, xc, xc[:, :1, :] * xc[:, :, :1], (RC, S, E))

    # 9. bitonic merge stage: reshape-free compare-exchange via roll+iota
    def bitonic_stage(i, o):
        x = i[:]
        d = 16
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        part_hi = (lane // d) % 2 == 1
        up = pltpu.roll(x, x.shape[1] - d, 1)    # x shifted left by d
        dn = pltpu.roll(x, d, 1)                 # x shifted right by d
        o[:] = jnp.where(part_hi, jnp.maximum(x, dn), jnp.minimum(x, up))
    w = np.sort(rng.normal(size=(RC, S)).astype(np.float32), axis=1)
    xs = w.reshape(RC, 2, 32)

    def np_stage(x, d):
        y = x.copy()
        for j in range(x.shape[1]):
            pj = j ^ d
            if pj > j:
                lo = np.minimum(x[:, j], x[:, pj])
                hi = np.maximum(x[:, j], x[:, pj])
                y[:, j], y[:, pj] = lo, hi
        return y
    probes["bitonic_stage_roll"] = (
        bitonic_stage, w, np_stage(w, 16), (RC, S))

    # 10. lane-reduce keepdims=False from 3D: [RC, S, E] -> [RC, S]
    probes["reduce_minor_3d"] = (
        lambda i, o: o.__setitem__(slice(None), jnp.sum(i[:], axis=-1)),
        xc, xc.sum(-1), (RC, S))

    # 11. MXU transpose via identity dot: [RC, S] -> [S, RC]
    def mxu_t(i, o):
        x = i[:]
        ident = (jax.lax.broadcasted_iota(jnp.int32, (RC, RC), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (RC, RC), 1)
                 ).astype(jnp.float32)
        o[:] = jax.lax.dot_general(x, ident, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    probes["mxu_transpose"] = (mxu_t, xb, xb.T, (S, RC))

    # 12. plain jnp transpose [RC, S] -> [S, RC]
    probes["jnp_transpose"] = (
        lambda i, o: o.__setitem__(slice(None), i[:].T), xb, xb.T, (S, RC))

    # 13. squeeze unit minor: [RC, S, 1] -> [RC, S] (S sublanes -> lanes)
    xe = rng.normal(size=(RC, S, 1)).astype(np.float32)
    probes["squeeze_minor"] = (
        lambda i, o: o.__setitem__(slice(None), i[:].reshape(RC, S)),
        xe, xe.reshape(RC, S), (RC, S))

    # 14. lane-slice 3D -> squeeze to 2D: raw3[:, :, 3] pattern
    xf = rng.normal(size=(RC, S, 8)).astype(np.float32)
    probes["lane_slice_squeeze"] = (
        lambda i, o: o.__setitem__(slice(None), i[:][:, :, 3:4].reshape(RC, S)),
        xf, xf[:, :, 3], (RC, S))

    # 15. concat [RC, 1] columns along lanes
    def lane_cat(i, o):
        x = i[:]
        cols = [x[:, j:j + 1] * (j + 1.0) for j in range(4)]
        o[:] = jnp.concatenate(cols, axis=1)
    want15 = np.concatenate([xb[:, j:j + 1] * (j + 1.0) for j in range(4)], 1)
    probes["lane_concat"] = (lane_cat, xb, want15, (RC, 4))

    # 16. lane concat of [RC, S] halves (merge input assembly)
    def lane_cat2(i, o):
        x = i[:]
        o[:] = jnp.concatenate([x, x * 2.0], axis=1)
    probes["lane_concat_wide"] = (
        lane_cat2, xb, np.concatenate([xb, xb * 2.0], 1), (RC, 2 * S))

    # 17. iota-masked replace of the trailing lane (dists last = 1e10)
    def last_lane(i, o):
        x = i[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        o[:] = jnp.where(lane == x.shape[1] - 1, 1e10, x)
    w17 = xb.copy()
    w17[:, -1] = 1e10
    probes["mask_last_lane"] = (last_lane, xb, w17, (RC, S))

    names = names or list(probes)
    for n in names:
        k, x, want, oshape = probes[n]
        run(n, k, jnp.asarray(x), want, oshape)


if __name__ == "__main__":
    main(sys.argv[1:])
