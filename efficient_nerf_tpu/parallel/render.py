"""Multi-chip inference: data-parallel R2L frame/ray rendering.

The megakernel (ops/pallas/r2l_forward.py) is a per-chip program; scaling
it is embarrassingly parallel over rays. `shard_map` over the mesh 'data'
axis gives each chip its local ray shard and runs the kernel (or the XLA
path off-TPU) with NO collectives at all — the reference's closest
analogue is torch DataParallel over batch (main.py:472-479), which
scatters/gathers through host memory every call.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..render.r2l_renderer import r2l_forward_rays

__all__ = ["make_sharded_r2l_forward"]


def make_sharded_r2l_forward(model, mesh: Mesh, *, near: float, far: float,
                             n_sample: int, L: int = 10,
                             plucker: bool = False, quant: str = ""):
    """Jitted data-parallel eval forward: (params, rays_o, rays_d) -> rgb.

    Params are replicated; rays shard over the mesh 'data' axis (the batch
    must divide it — r2l_render pads frames to chunk multiples already).
    Inside each shard the normal per-chip dispatch applies (Pallas
    megakernel / int8 kernel / XLA fallback).
    """
    from jax.experimental.shard_map import shard_map

    def local(params, rays_o, rays_d):
        return r2l_forward_rays(model, params, rays_o, rays_d, near, far,
                                n_sample, L=L, plucker=plucker,
                                perturb=False, quant=quant)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P("data"), P("data")),
                   out_specs=P("data"), check_rep=False)
    return jax.jit(fn)
