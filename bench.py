"""Benchmark: flagship R2L W256 D88 render throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline: the torch reference renders a 400x400 frame through the teacher in
~8.5 s on an RTX 2080 Ti and advertises ~30x for R2L (README.md:17, 87)
=> implied reference R2L throughput 400*400/8.5*30 ~= 565k rays/s. The
BASELINE.md north-star asks for >=30x rays/s/chip over the torch baseline.

The benched program is the real eval path: rays -> stratified-sample ->
positional-embed -> 88-layer ResMLP -> rgb, in bf16 on the MXU (params f32).
Timing methodology (shared with the CLI --benchmark mode):
efficient_nerf_tpu/utils/benchmark.py — varied-input scan differencing with
trimmed multi-estimate spread bars, adaptively widened until the core
spread is defensible (round-4's single 19.7% bf16 bar came from one
boost-window outlier among k=3).
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: first bench run pays the remote compile
# (~minutes over the tunnel), subsequent runs start in seconds.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TORCH_BASELINE_RAYS_PER_S = 400 * 400 / 8.5 * 30  # ~565k rays/s (2080 Ti)


def main():
    from efficient_nerf_tpu.core.encoding import ray_embed
    from efficient_nerf_tpu.core.ray_sampler import sample_ray_points
    from efficient_nerf_tpu.models import R2LNet
    from efficient_nerf_tpu.ops import fused_r2l_available, r2l_forward_fused
    from efficient_nerf_tpu.utils.benchmark import scan_frame_time

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

    use_fused = fused_r2l_available()

    def render(params, rays_o, rays_d):
        if use_fused:
            # Pallas megakernel: embed + 88 layers in VMEM (~1.5x over XLA)
            return r2l_forward_fused(params, rays_o, rays_d, 2.0, 6.0,
                                     n_sample, L, tile_b=512)
        pts = sample_ray_points(rays_o, rays_d, 2.0, 6.0, n_sample)
        x = ray_embed(pts, L)
        return model.apply({"params": params}, x)

    dt, spread = scan_frame_time(render, params, rays_o, rays_d)
    rays_per_s = B / dt

    result = {
        "metric": "r2l_w256d88_render_throughput",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / TORCH_BASELINE_RAYS_PER_S, 3),
        "noise_pct": round(spread, 2),
    }

    if use_fused:
        # int8 W8A8-body serving mode (--inference_quant int8): quality cost
        # bounded by the e2e gate (<0.5 dB on a trained student,
        # tests/test_quality_e2e.py); reported alongside, not as the
        # headline — the headline stays the quality-identical bf16 path.
        from efficient_nerf_tpu.ops.pallas.r2l_int8 import calibrate_r2l_int8
        from efficient_nerf_tpu.render.r2l_renderer import r2l_forward_rays

        # the served configuration: activation scales calibrated ONCE per
        # checkpoint (a self-calibrating call inside the frame loop would
        # re-run the calibration forward every frame — ~1 ms/frame of
        # non-serving work)
        scales = calibrate_r2l_int8(params, rays_o[:1024], rays_d[:1024],
                                    2.0, 6.0, n_sample, L)

        def render_q(params, o, d):
            return r2l_forward_rays(model, params, o, d, 2.0, 6.0,
                                    n_sample, L, quant="int8",
                                    act_scales=scales)

        try:
            dtq, spread_q = scan_frame_time(render_q, params, rays_o, rays_d)
            result["int8_rays_per_s"] = round(B / dtq, 1)
            result["int8_vs_baseline"] = round(
                B / dtq / TORCH_BASELINE_RAYS_PER_S, 3)
            result["int8_noise_pct"] = round(spread_q, 2)
        except Exception:
            pass  # serving mode unavailable: headline metric stands alone

    print(json.dumps(result))


if __name__ == "__main__":
    main()
