"""Worker for the two-process jax.distributed test (test_distributed.py).

Run as: python _distributed_worker.py <process_id> <num_processes> <port>

Exercises the REAL multi-host code path — jax.distributed init over a
localhost coordinator with Gloo CPU collectives, a global (data, model)
mesh spanning both processes, per-host data feeding through
host_local_array_to_global_array, and a sharded R2L train step whose
gradient all-reduce crosses the process boundary — unlike the in-process
virtual 8-device mesh used by test_parallel.py.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

from efficient_nerf_tpu.parallel import (host_subset, initialize_distributed,
                                         make_mesh)

initialize_distributed(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid, jax.process_index()

# host_subset: disjoint, complete per-host partition of a shard-file list
files = [f"data_{i}.npy" for i in range(7)]
mine = host_subset(files)
other = host_subset(files, process_index=1 - pid, process_count=nproc)
assert not set(mine) & set(other)
assert sorted(set(mine) | set(other)) == sorted(files)

import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import multihost_utils
from jax.sharding import PartitionSpec as P

from efficient_nerf_tpu.models import R2LNet
from efficient_nerf_tpu.parallel import make_sharded_r2l_train_step
from efficient_nerf_tpu.parallel.train import replicate_state
from efficient_nerf_tpu.train import hard_pool_init, init_train_state

mesh = make_mesh(n_data=nproc * 2, n_model=1)  # spans both processes
assert mesh.devices.size == nproc * 2

n_sample = 4
model = R2LNet(input_dim=n_sample * 3 * 21, depth=4, width=16)
params = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, n_sample * 3 * 21)))["params"]
opt = optax.adam(1e-3)
step = make_sharded_r2l_train_step(model, opt, mesh, near=2.0, far=6.0,
                                   n_sample=n_sample, perturb=False,
                                   donate=False)
state, pool = replicate_state(mesh, init_train_state(params, opt),
                              hard_pool_init(4))

# per-host local batch half -> one global sharded batch (the multi-host
# data-feeding pattern: each host loads only its shard subset)
rng = np.random.default_rng(pid)
B_local = 16


def global_batch(a):
    return multihost_utils.host_local_array_to_global_array(a, mesh,
                                                            P("data"))


# one fixed per-host batch, stepped repeatedly: loss must fall
o = global_batch(rng.normal(size=(B_local, 3)).astype(np.float32))
d = global_batch(rng.normal(size=(B_local, 3)).astype(np.float32))
t = global_batch(rng.uniform(size=(B_local, 3)).astype(np.float32))
losses = []
for i in range(5):
    state, pool, m = step(state, pool, jax.random.PRNGKey(i), o, d, t)
    losses.append(float(np.asarray(m["loss_rgb"].addressable_data(0))))

assert all(np.isfinite(losses)), losses
assert losses[-1] < losses[0], losses  # it trains across the two processes

# the replicated state must be bit-identical on both processes after the
# cross-process gradient all-reduce
head = np.asarray(state.params["head"]["kernel"].addressable_data(0))
digest = float(np.abs(head).sum())
gathered = multihost_utils.process_allgather(np.float32(digest))
assert np.allclose(gathered, gathered[0]), gathered

print(f"proc {pid}: DISTRIBUTED_OK losses={losses}", flush=True)
