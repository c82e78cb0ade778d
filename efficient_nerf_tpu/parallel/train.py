"""Sharded training-step builders.

The single-chip steps (train/steps.py) are pure functions; parallelism is
layered on by jitting them with explicit shardings: state replicated (or
tensor-parallel via shard_params_tp), ray batch sharded on 'data'.
XLA/GSPMD inserts the gradient all-reduce during the backward pass and the
TP collectives — the reference's DataParallel scatter/gather
(main.py:472-479) has no hand-written equivalent here.

IMPORTANT: train state / pool arguments must be COMMITTED to a sharding
before the first call (use replicate_state / shard_params_tp). Uncommitted
single-device state combined with a sharded batch has been observed to
deadlock the CPU collective runtime mid-all-reduce.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh

from ..train.steps import make_r2l_train_step, make_teacher_train_step
from .mesh import batch_sharding, replicated

__all__ = ["make_sharded_r2l_train_step", "make_sharded_teacher_train_step",
           "replicate_state"]


def replicate_state(mesh: Mesh, *trees):
    """Commit pytrees (TrainState, HardPool, ...) as replicated on mesh."""
    rep = replicated(mesh)
    out = tuple(jax.device_put(t, rep) for t in trees)
    return out if len(out) > 1 else out[0]


def make_sharded_r2l_train_step(model, optimizer, mesh: Mesh, *,
                                near: float, far: float, n_sample: int,
                                hard: Optional[Tuple[int, int]] = None,
                                donate: bool = True, **kw):
    """R2L step with the ray batch sharded over the mesh 'data' axis.

    step(state, pool, key, rays_o, rays_d, target). State/pool placement
    follows the caller's committed device_put (replicated via
    replicate_state, or TP via shard_params_tp); batch shardings are pinned
    here and GSPMD propagates the rest.

    The fused Pallas VJP kernel is per-chip (not GSPMD-partitionable), so
    the model apply is shard_map'ed over 'data' inside the step (see
    make_r2l_train_step's mesh arg) — multi-chip keeps the kernel's ~2.6x
    step win instead of falling back to the XLA apply. The fallback still
    applies automatically off-TPU or for non-uniform model profiles, and
    tensor parallelism (n_model > 1) pins the XLA path: TP shards the
    weights themselves, which the per-chip kernel cannot consume.
    """
    if mesh.shape.get("model", 1) > 1:
        kw.setdefault("fused", False)
    fun = make_r2l_train_step(model, optimizer, near=near, far=far,
                              n_sample=n_sample, hard=hard, jit=False,
                              mesh=mesh, **kw)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        fun,
        in_shardings=(None, None, rep, bs, bs, bs),
        donate_argnums=(0, 1) if donate else (),
    )


def make_sharded_teacher_train_step(model, optimizer, mesh: Mesh, cfg,
                                    hwf=None, donate: bool = True):
    fun = make_teacher_train_step(model, optimizer, cfg, hwf=hwf, jit=False)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        fun,
        in_shardings=(None, rep, bs, bs, bs),
        donate_argnums=(0,) if donate else (),
    )
