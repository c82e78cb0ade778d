"""R2L W256 D88 training-step timing at the reference batch on the real chip.

Reference batch: 20 shards x 4096 rays + 16k hard rays appended
(main.py:1324-1347). Methodology: N steps chained in one jitted lax.scan
(state threaded through, so steps serialize), differenced across two scan
lengths to cancel the tunnel round trip.
"""
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import optax

from efficient_nerf_tpu.models import R2LNet
from efficient_nerf_tpu.train import (hard_pool_init, init_train_state,
                                      make_r2l_train_step)

n_sample, L = 16, 10
input_dim = n_sample * 3 * (2 * L + 1)
B = 20 * 4096
HARD = (16384, 16384)

variant = sys.argv[1] if len(sys.argv) > 1 else "bf16_fast_fused"
dtype = jnp.float32 if "f32" in variant else jnp.bfloat16
fast = "fast" in variant
fused = "fused" in variant
# ablation knobs (timing attribution, not production configs):
#   nohard — drop the hard-example pool (isolates top_k/pool cost)
#   sgd    — plain SGD instead of Adam (isolates the optimizer update)
if "nohard" in variant:
    HARD = None
opt = optax.sgd(5e-4) if "sgd" in variant else optax.adam(5e-4)

model = R2LNet(input_dim=input_dim, depth=88, width=256, dtype=dtype)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, input_dim)))["params"]
step = make_r2l_train_step(model, opt, near=2.0, far=6.0, n_sample=n_sample,
                           L=L, hard=HARD, fast_embed=fast, fused=fused,
                           jit=False, donate=False)

rng = np.random.default_rng(0)
o = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
d = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
t = jnp.asarray(rng.uniform(size=(B, 3)).astype(np.float32))


def make_scan(n):
    @jax.jit
    def run(state, pool, o, d, t):
        def body(carry, i):
            state, pool = carry
            state, pool, m = step(state, pool, jax.random.fold_in(
                jax.random.PRNGKey(0), i), o, d, t)
            return (state, pool), m["loss_rgb"]
        (state, pool), losses = jax.lax.scan(body, (state, pool),
                                             jnp.arange(n))
        return jnp.sum(losses) + jnp.sum(state.params["head"]["kernel"][0])
    return run


state = init_train_state(params, opt)
pool = hard_pool_init(B, row_dim=9)
n_lo, n_hi = 1, 4
run_lo, run_hi = make_scan(n_lo), make_scan(n_hi)
float(run_lo(state, pool, o, d, t))
float(run_hi(state, pool, o, d, t))


def timed(run, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(state, pool, o, d, t))
        ts.append(time.perf_counter() - t0)
    return min(ts)


dt = (timed(run_hi) - timed(run_lo)) / (n_hi - n_lo)
print(json.dumps({"variant": variant, "ms_per_step": round(dt * 1e3, 2),
                  "hours_1p2M_iters": round(dt * 1.2e6 / 3600, 2)}))
