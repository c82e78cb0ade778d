"""Fused R2L training forward+backward (Pallas/Mosaic) behind a custom VJP.

The XLA training step round-trips every one of the 88 layers' [B, 256]
activations through HBM twice (forward store + backward read) and runs the
backward as ~260 separate fusions; at the reference batch (20x4096 + 16k
hard rays, main.py:1324-1347 of /root/reference) that leaves the step ~3x
off its MXU compute bound (docs/PERF.md). Here one Pallas kernel runs the
whole forward for a ray tile in VMEM (saving only the 44 block-input
activations as bf16 residuals), and a second kernel consumes a tile of
output cotangents and walks the 43 residual blocks in reverse — recomputing
each block's inner pre-activation (one extra matmul) instead of storing it —
while accumulating all weight gradients in VMEM-resident f32 output blocks
across the grid. HBM traffic per ray is x + 44 bf16 activations + dx instead
of ~7x that, and every matmul (including the [W, T]x[T, W] weight-gradient
contractions) lands on the MXU in bf16.

Covers the flagship scan-body profile (reference model/nerf_raybased.py:
443-544 NeRF_v3_2/ResMLP: n_learnable=2, inact relu, outact none, sigmoid
tail, optional global residual / res_scale). Gradients are returned in the
flax param-tree structure, so `jax.grad` through `r2l_train_apply` drops
into the existing optax/train-step machinery unchanged.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .r2l_forward import _doubling_head_perm_np, pack_r2l_weights
from .trig import fast_sincos

__all__ = ["r2l_train_apply"]

LANES = 128


class _Profile(NamedTuple):
    """Hashable static config for the custom_vjp nondiff argument."""
    res_scale: float
    use_global_residual: bool
    tile_b: int
    dtype: Any
    interpret: bool
    embed_L: int = 0   # >0: input is [B, K] sample coords, embed in-kernel
    # backward-kernel ray tile; 0 = same as tile_b. The two kernels have
    # different optima (r5 on-chip sweep, scripts/tune_r2l_train_kernel.py):
    # the forward is fastest at 512 while the backward — whose per-tile
    # working set adds the f32 weight-grad accumulators — is ~2-3 ms
    # faster at 1024 at the reference batch. Both tilings address the same
    # residual array (rays padded to a common multiple), so they are
    # independent knobs.
    tile_b_bwd: int = 0
    # False: skip the input-cotangent computation entirely (the [T, in_dim]
    # head backward matmul, the d(embed)/d(coords) chain, and the padded
    # [B, x_cols] HBM store). The training step's inputs are DATA (sampled
    # ray coords, stop-gradient by construction), so dx is dead there; the
    # returned x-cotangent is zeros. Leave True anywhere x genuinely
    # requires gradients.
    need_dx: bool = True


def _doubling_sincos_lists(p, L):
    """Base-pair + double-angle octaves (shared by fwd and bwd kernels)."""
    s, c = fast_sincos(p, degree=9)
    sins, coss = [s], [c]
    for _ in range(1, L):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        sins.append(s)
        coss.append(c)
    return sins, coss


def _embed_doubling(p, L):
    """[T, K] coords -> [T, K*(2L+1)] in the doubling block layout
    [sins | coss | p] (head weights are row-permuted at pack time to
    absorb it, r2l_forward._doubling_head_perm_np)."""
    sins, coss = _doubling_sincos_lists(p, L)
    return jnp.concatenate(sins + coss + [p], axis=-1)


def _fwd_kernel(x_ref, head_w_ref, head_b_ref, body_w_ref, body_b_ref,
                tail_w_ref, tail_b_ref, out_ref, hs_ref, *, n_block: int,
                res_scale: float, use_global_residual: bool,
                embed_L: int = 0):
    f32 = jnp.float32
    wdt = head_w_ref.dtype
    if embed_L:
        x = _embed_doubling(x_ref[:].astype(f32), embed_L).astype(wdt)
    else:
        x = x_ref[:].astype(wdt)
    h = jnp.maximum(
        jnp.dot(x, head_w_ref[:], preferred_element_type=f32)
        + head_b_ref[:], 0.0)
    h0 = h
    for i in range(n_block):
        hs_ref[i] = h.astype(wdt)
        g = jnp.dot(h.astype(wdt), body_w_ref[i, 0],
                    preferred_element_type=f32) + body_b_ref[i, 0]
        g = jnp.maximum(g, 0.0)
        g = jnp.dot(g.astype(wdt), body_w_ref[i, 1],
                    preferred_element_type=f32) + body_b_ref[i, 1]
        h = g * res_scale + h
    if use_global_residual:
        h = h + h0
    hs_ref[n_block] = h.astype(wdt)      # tail input (post global residual)
    t = jnp.dot(h.astype(wdt), tail_w_ref[:],
                preferred_element_type=f32) + tail_b_ref[:]
    out_ref[:] = jax.nn.sigmoid(t)


def _bwd_kernel(dout_ref, x_ref, hs_ref, head_w_ref, body_w_ref, body_b_ref,
                tail_w_ref, tail_b_ref,
                dhw_ref, dhb_ref, dw_ref, db_ref, dtw_ref, dtb_ref,
                dx_ref=None,   # absent when need_dx=False (one fewer output)
                *, n_block: int, res_scale: float,
                use_global_residual: bool, embed_L: int = 0,
                need_dx: bool = True):
    f32 = jnp.float32
    wdt = head_w_ref.dtype
    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _init():
        for ref in (dhw_ref, dhb_ref, dw_ref, db_ref, dtw_ref, dtb_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    # [T, a] x [T, b] -> [a, b] (contract the ray axis: weight gradients)
    def grad_w(a, b):
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    # [T, b] x [a, b] -> [T, a] (contract the feature axis: h @ W^T)
    def grad_h(g, w):
        return jax.lax.dot_general(g, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    # tail: t = hN @ Wt + bt, out = sigmoid(t). Padded lanes carry dout = 0
    # so they contribute nothing anywhere downstream.
    hN = hs_ref[n_block][:]
    t = jnp.dot(hN, tail_w_ref[:], preferred_element_type=f32) + tail_b_ref[:]
    out = jax.nn.sigmoid(t)
    dt = dout_ref[:] * out * (1.0 - out)
    dt_b = dt.astype(wdt)
    dtw_ref[:] += grad_w(hN, dt_b)
    dtb_ref[:] += jnp.sum(dt, axis=0)
    dh = grad_h(dt_b, tail_w_ref[:])
    dh_tail = dh                              # for the global residual

    for i in range(n_block - 1, -1, -1):
        h_in = hs_ref[i][:]
        # recompute the inner pre-activation (cheaper than storing it:
        # one matmul vs another 2.2 GB of residual HBM traffic per step)
        g1 = jnp.maximum(
            jnp.dot(h_in, body_w_ref[i, 0], preferred_element_type=f32)
            + body_b_ref[i, 0], 0.0)
        dg2 = dh * res_scale
        dg2_b = dg2.astype(wdt)
        g1_b = g1.astype(wdt)
        dw_ref[i, 1] += grad_w(g1_b, dg2_b)
        db_ref[i, 1] += jnp.sum(dg2, axis=0)
        dg1 = grad_h(dg2_b, body_w_ref[i, 1]) * (g1 > 0.0)
        dg1_b = dg1.astype(wdt)
        dw_ref[i, 0] += grad_w(h_in, dg1_b)
        db_ref[i, 0] += jnp.sum(dg1, axis=0)
        dh = dh + grad_h(dg1_b, body_w_ref[i, 0])

    if use_global_residual:
        dh = dh + dh_tail
    # head: h0 = relu(x @ Wh + bh); the relu mask is recovered from hs[0]
    # (compare in f32: the target rejects bf16 comparisons)
    dpre = jnp.where(hs_ref[0][:].astype(f32) > 0, dh, 0.0)
    dpre_b = dpre.astype(wdt)
    if embed_L:
        # recompute the embedding (cheaper than storing the [B, in_dim]
        # residual: one trig pair + doublings on [T, K])
        p = x_ref[:].astype(f32)
        sins, coss = _doubling_sincos_lists(p, embed_L)
        emb = jnp.concatenate(sins + coss + [p], axis=-1)
        dhw_ref[:] += grad_w(emb.astype(wdt), dpre_b)
        dhb_ref[:] += jnp.sum(dpre, axis=0)
        if need_dx:
            # chain through the embedding: d sin(2^j p) = 2^j cos(2^j p) dp,
            # d cos(2^j p) = -2^j sin(2^j p) dp, blocks are K columns wide
            demb = grad_h(dpre_b, head_w_ref[:])      # [T, K*(2L+1)] f32
            K = p.shape[-1]
            dp = demb[:, 2 * embed_L * K:]            # identity block
            for j in range(embed_L):
                f = float(2.0 ** j)
                dp = dp + demb[:, j * K:(j + 1) * K] * (f * coss[j])
                dp = dp - demb[:, (embed_L + j) * K:
                               (embed_L + j + 1) * K] * (f * sins[j])
            dx_ref[:] = dp
    else:
        dhw_ref[:] += grad_w(x_ref[:].astype(wdt), dpre_b)
        dhb_ref[:] += jnp.sum(dpre, axis=0)
        if need_dx:
            dx_ref[:] = grad_h(dpre_b, head_w_ref[:])


def _pad_rays(x, tile_b, pad_mult=0):
    """Pad rays to a tile_b multiple (and to pad_mult when the other
    kernel's tile is larger, so fwd and bwd tilings address one array)."""
    B = x.shape[0]
    m = max(tile_b, pad_mult)
    padded = -(-B // m) * m
    if padded != B:
        x = jnp.pad(x, ((0, padded - B), (0, 0)))
    return x, padded // tile_b


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _row_spec(tile, cols):
    return pl.BlockSpec((tile, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _compiler_params(interpret):
    if interpret:
        return None
    # resident bf16 weights (~12 MB) + f32 grad accumulators (~24 MB) +
    # the residual/activation tiles exceed the default 16 MB scoped budget
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pack(prof: _Profile, params):
    """pack_r2l_weights + the doubling-layout head-row permutation when the
    kernel embeds in-kernel (embed_L > 0)."""
    packed = pack_r2l_weights(params, prof.dtype)
    if prof.embed_L:
        in_dim = packed["head_w"].shape[0]
        K = in_dim // (2 * prof.embed_L + 1)
        perm = _doubling_head_perm_np(K // 3, prof.embed_L) if K % 3 == 0 \
            else None
        assert perm is not None, "embed_L requires K divisible by 3"
        packed["head_w"] = packed["head_w"][jnp.asarray(perm)]
    return packed


def _bwd_tile(prof: _Profile) -> int:
    return prof.tile_b_bwd or prof.tile_b


def _fwd_call(prof: _Profile, packed, x):
    n_block, width = packed["body_w"].shape[0], packed["body_w"].shape[-1]
    in_dim = packed["head_w"].shape[0]
    x_cols = x.shape[-1]
    B = x.shape[0]
    xp, n_tiles = _pad_rays(x, prof.tile_b, _bwd_tile(prof))
    kernel = functools.partial(
        _fwd_kernel, n_block=n_block, res_scale=prof.res_scale,
        use_global_residual=prof.use_global_residual,
        embed_L=prof.embed_L)
    out, hs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _row_spec(prof.tile_b, x_cols),
            _const_spec((in_dim, width)),
            _const_spec((width,)),
            _const_spec((n_block, 2, width, width)),
            _const_spec((n_block, 2, width)),
            _const_spec((width, LANES)),
            _const_spec((LANES,)),
        ],
        out_specs=[
            _row_spec(prof.tile_b, LANES),
            pl.BlockSpec((n_block + 1, prof.tile_b, width),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * prof.tile_b, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_block + 1, n_tiles * prof.tile_b, width),
                                 prof.dtype),
        ],
        compiler_params=_compiler_params(prof.interpret),
        interpret=prof.interpret,
    )(xp, packed["head_w"], packed["head_b"], packed["body_w"],
      packed["body_b"], packed["tail_w"], packed["tail_b"])
    return out[:B], hs


def _bwd_call(prof: _Profile, packed, x, hs, dout):
    n_block, width = packed["body_w"].shape[0], packed["body_w"].shape[-1]
    in_dim = packed["head_w"].shape[0]
    x_cols = x.shape[-1]
    B = x.shape[0]
    tile_b = _bwd_tile(prof)
    xp, n_tiles = _pad_rays(x, tile_b, prof.tile_b)
    doutp, _ = _pad_rays(dout, tile_b, prof.tile_b)
    kernel = functools.partial(
        _bwd_kernel, n_block=n_block, res_scale=prof.res_scale,
        use_global_residual=prof.use_global_residual,
        embed_L=prof.embed_L, need_dx=prof.need_dx)
    f32 = jnp.float32
    out_specs = [
        _const_spec((in_dim, width)),
        _const_spec((width,)),
        _const_spec((n_block, 2, width, width)),
        _const_spec((n_block, 2, width)),
        _const_spec((width, LANES)),
        _const_spec((LANES,)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((in_dim, width), f32),
        jax.ShapeDtypeStruct((width,), f32),
        jax.ShapeDtypeStruct((n_block, 2, width, width), f32),
        jax.ShapeDtypeStruct((n_block, 2, width), f32),
        jax.ShapeDtypeStruct((width, LANES), f32),
        jax.ShapeDtypeStruct((LANES,), f32),
    ]
    if prof.need_dx:
        out_specs.append(_row_spec(tile_b, x_cols))
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles * tile_b, x_cols), f32))
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _row_spec(tile_b, LANES),
            _row_spec(tile_b, x_cols),
            pl.BlockSpec((n_block + 1, tile_b, width),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            _const_spec((in_dim, width)),
            _const_spec((n_block, 2, width, width)),
            _const_spec((n_block, 2, width)),
            _const_spec((width, LANES)),
            _const_spec((LANES,)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(prof.interpret),
        interpret=prof.interpret,
    )(doutp, xp, hs, packed["head_w"], packed["body_w"], packed["body_b"],
      packed["tail_w"], packed["tail_b"])
    dhw, dhb, dw, db, dtw, dtb = outs[:6]
    dx = outs[6][:B] if prof.need_dx else jnp.zeros((B, x_cols), f32)
    return dhw, dhb, dw, db, dtw, dtb, dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _apply(prof: _Profile, params, x):
    packed = _pack(prof, params)
    out, _ = _fwd_call(prof, packed, x)
    return out[:, :packed["out_dim"]]


def _apply_fwd(prof: _Profile, params, x):
    packed = _pack(prof, params)
    out, hs = _fwd_call(prof, packed, x)
    return out[:, :packed["out_dim"]], (params, x, hs)


def _apply_bwd(prof: _Profile, res, dout):
    params, x, hs = res
    packed = _pack(prof, params)
    out_dim = packed["out_dim"]
    doutp = jnp.zeros((dout.shape[0], LANES), jnp.float32)
    doutp = doutp.at[:, :out_dim].set(dout.astype(jnp.float32))
    dhw, dhb, dw, db, dtw, dtb, dx = _bwd_call(prof, packed, x, hs, doutp)
    if prof.embed_L:
        # the kernel computed head grads in the permuted (doubling) row
        # order; scatter rows back to the ray_embed order
        import numpy as _np
        in_dim = dhw.shape[0]
        K = in_dim // (2 * prof.embed_L + 1)
        perm = _doubling_head_perm_np(K // 3, prof.embed_L)
        inv = _np.argsort(perm)
        dhw = dhw[jnp.asarray(inv)]
    grads = {
        "head": {"kernel": dhw, "bias": dhb},
        "body": {
            "lin_0": {"kernel": dw[:, 0], "bias": db[:, 0]},
            "lin_1": {"kernel": dw[:, 1], "bias": db[:, 1]},
        },
        "tail": {"kernel": dtw[:, :out_dim], "bias": dtb[:out_dim]},
    }
    # rebuild with the caller's exact tree type (dict vs FrozenDict)
    treedef = jax.tree_util.tree_structure(params)
    leaves = jax.tree_util.tree_leaves(grads)
    dparams = jax.tree_util.tree_unflatten(treedef, leaves)
    dparams = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype), dparams, params)
    return dparams, dx.astype(x.dtype)


_apply.defvjp(_apply_fwd, _apply_bwd)


def r2l_train_apply(params, x, *, res_scale: float = 1.0,
                    use_global_residual: bool = False, tile_b: int = 512,
                    tile_b_bwd: int = 1024, dtype=jnp.bfloat16,
                    embed_L: int = 0, need_dx: bool = True,
                    interpret: bool = False):
    """Differentiable fused R2L forward: x [B, in_dim] -> rgb [B, out_dim].

    Drop-in for `model.apply({'params': params}, x)` on the uniform
    scan-body R2LNet profile (n_learnable=2, relu inact, no outact, sigmoid
    tail). `jax.grad` through this uses the fused Pallas backward; gradients
    match the XLA path (parity-tested in tests/test_ops.py) and are f32.

    embed_L > 0: x is the [B, K] flattened sample coordinates and the
    kernel computes the positional encoding itself (double-angle recurrence
    + fast polynomial trig — the fast_embed semantics), removing the
    XLA-side embed and its [B, K*(2L+1)] HBM round trip; the backward
    chains d(embed)/d(coords) analytically.

    tile_b / tile_b_bwd: independent forward / backward ray tiles (see
    _Profile; the r5 sweep put the fwd optimum at 512 and the bwd at 1024).
    One must divide the other so both tilings address the same padded
    residual array.
    """
    tb, tbb = int(tile_b), int(tile_b_bwd) or int(tile_b)
    assert max(tb, tbb) % min(tb, tbb) == 0, \
        "tile_b and tile_b_bwd must divide one another"
    prof = _Profile(float(res_scale), bool(use_global_residual), tb,
                    dtype, bool(interpret), embed_L=int(embed_L),
                    tile_b_bwd=tbb, need_dx=bool(need_dx))
    return _apply(prof, params, x)
