"""Device mesh + sharding for multi-chip / multi-host training.

The reference's entire distribution story is single-process
torch.nn.DataParallel (main.py:37-42, 472-479). The TPU-native design uses
a jax.sharding.Mesh with two axes:

  * 'data'  — the ray batch axis. Rays are embarrassingly parallel; batches
    shard along axis 0, gradients all-reduce (psum) over ICI, inserted and
    overlapped with the backward pass by XLA/GSPMD.
  * 'model' — optional tensor parallelism over the MLP width for very wide
    students: Dense kernels shard on their output (then input) feature
    axis; XLA inserts the reduce-scatter/all-gather pattern.

Multi-host: call `initialize_distributed()` once per process; each host
feeds its local shard of the batch (see ShardLoader + host_subset).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "shard_params_tp", "initialize_distributed", "host_subset"]


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Mesh over (data, model) axes. Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (rays) across 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with the ray axis sharded."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def _tp_spec_for_path(path: Tuple, leaf) -> P:
    """Tensor-parallel spec: the canonical paired column-then-row split.

    Each R2L residual block is two matmuls (body.lin_0 then body.lin_1,
    kernels [n_block, in, out]). Megatron-style: lin_0 splits its OUTPUT
    features on 'model' (bias too), lin_1 splits its INPUT features — the
    inner activation stays sharded between the two matmuls and the block
    costs ONE psum (of lin_1's partial products), instead of the
    all-gather-per-matmul a uniform last-axis sharding forces. The head
    splits its output (one gather into block 0); the tiny tail and lin_1
    biases replicate.
    """
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if "tail" in names:
        return P()  # tiny output layer: replicate
    if "lin_1" in names:
        if "kernel" in names:  # row split: shard the contraction (in) axis
            return P(*([None] * (leaf.ndim - 2) + ["model", None]))
        return P()             # bias adds AFTER the psum: replicate
    if leaf.ndim >= 2:       # lin_0 / head: column split (output features)
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    if leaf.ndim == 1:
        return P("model")
    return P()


def shard_params_tp(mesh: Mesh, params):
    """Apply width-axis tensor-parallel sharding to an R2L param pytree.

    With n_model == 1 this is plain replication (specs collapse to
    single-device placement).
    """
    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, _tp_spec_for_path(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host init (idempotent wrapper around jax.distributed)."""
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError:
        pass  # already initialized


def host_subset(files: Sequence[str], process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> list:
    """Deterministic per-host partition of a shard-file list (multi-host
    data loading: each host reads only its slice)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [f for i, f in enumerate(sorted(files)) if i % pc == pi]
