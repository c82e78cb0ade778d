"""Benchmark: flagship R2L W256 D88 render throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline: the torch reference renders a 400x400 frame through the teacher in
~8.5 s on an RTX 2080 Ti and advertises ~30x for R2L (README.md:17, 87)
=> implied reference R2L throughput 400*400/8.5*30 ~= 565k rays/s. The
BASELINE.md north-star asks for >=30x rays/s/chip over the torch baseline.

The benched program is the real eval path: rays -> stratified-sample ->
positional-embed -> 88-layer ResMLP -> rgb, in bf16 on the MXU (params f32).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TORCH_BASELINE_RAYS_PER_S = 400 * 400 / 8.5 * 30  # ~565k rays/s (2080 Ti)


def main():
    from efficient_nerf_tpu.core.encoding import ray_embed
    from efficient_nerf_tpu.core.ray_sampler import sample_ray_points
    from efficient_nerf_tpu.models import R2LNet
    from efficient_nerf_tpu.ops import fused_ray_embed_available, ray_points_embed

    n_sample, L = 16, 10
    input_dim = n_sample * 3 * (2 * L + 1)
    model = R2LNet(input_dim=input_dim, depth=88, width=256,
                   dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, input_dim)))["params"]

    B = 160_000  # one 400x400 frame of rays
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))

    use_fused = fused_ray_embed_available()

    @jax.jit
    def render(params, rays_o, rays_d):
        if use_fused:
            x = ray_points_embed(rays_o, rays_d, 2.0, 6.0, n_sample, L)
        else:
            pts = sample_ray_points(rays_o, rays_d, 2.0, 6.0, n_sample)
            x = ray_embed(pts, L)
        return model.apply({"params": params}, x)

    # warmup/compile
    render(params, rays_o, rays_d).block_until_ready()
    render(params, rays_o, rays_d).block_until_ready()

    # Per-call blocking timing; median over iterations. (A lax.scan-chained
    # variant reported physically impossible numbers on the experimental
    # remote-TPU plugin, so each call is synchronized individually.)
    n_iters = 10
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        render(params, rays_o, rays_d).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    rays_per_s = B / dt
    print(json.dumps({
        "metric": "r2l_w256d88_render_throughput",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / TORCH_BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
