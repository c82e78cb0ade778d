"""Volume integration: raw (rgb, sigma) predictions -> composited ray colors.

Single implementation (the reference duplicates raw2outputs four times:
main.py:556-621, create_data.py:335-402, helpers.py:77-144,
nerf_raybased.py:226-295). Pure jnp so XLA fuses the whole chain
(sigmoid/relu/exp/cumprod/weighted sums) into the surrounding kernels.

Semantics parity (spec'd from reference main.py:556-621):
  * dists[i] = z[i+1] - z[i], last dist = 1e10 ("infinite" final interval);
  * dists are scaled by ||rays_d|| (rays_d is an unnormalized pixel ray, so
    z is in per-unit-direction parameterization);
  * alpha = 1 - exp(-relu(sigma + noise) * dists);
  * T_i = prod_{j<i}(1 - alpha_j + 1e-10)  (exclusive cumprod);
  * weights = alpha * T; rgb = sum(w * sigmoid(raw_rgb));
  * disp = 1 / max(1e-10, depth / acc); white_bkgd adds (1 - acc).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["RenderOutputs", "raw2outputs", "raw2outputs_cm",
           "exclusive_cumprod"]


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray      # [..., 3]
    disp: jnp.ndarray     # [...]
    acc: jnp.ndarray      # [...]
    weights: jnp.ndarray  # [..., S]
    depth: jnp.ndarray    # [...]


def exclusive_cumprod(x, axis: int = -1):
    """cumprod shifted right by one with a leading 1 (TF 'exclusive' mode)."""
    cp = jnp.cumprod(x, axis=axis)
    ones = jnp.ones_like(jnp.take(cp, jnp.array([0]), axis=axis))
    return jnp.concatenate(
        [ones, jax.lax.slice_in_dim(cp, 0, x.shape[axis] - 1, axis=axis)], axis=axis
    )


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    noise_key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
) -> RenderOutputs:
    """Composite per-sample (rgb, sigma) into per-ray outputs.

    Args:
      raw: [..., S, 4] raw network outputs (pre-sigmoid rgb, pre-relu sigma).
      z_vals: [..., S] sample depths.
      rays_d: [..., 3] unnormalized ray directions.
      raw_noise_std: sigma-noise regularizer strength (training only).
      noise_key: RNG key for the sigma noise (required if raw_noise_std > 0
        and `noise` not given).
      noise: pre-drawn noise [..., S] (determinism hook for tests).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])

    sigma = raw[..., 3]
    if raw_noise_std > 0.0:
        if noise is None:
            noise = jax.random.normal(noise_key, sigma.shape) * raw_noise_std
        sigma = sigma + noise

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    trans = exclusive_cumprod(1.0 - alpha + 1e-10, axis=-1)
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)


def raw2outputs_cm(
    raw_cm: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    noise_key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
) -> RenderOutputs:
    """Channel-major twin of `raw2outputs`: raw_cm is [4, N, S].

    Same math, different layout. A [N, S, 4] tensor has minor dim 4, which
    the TPU lane-pads 4 -> 128 (32x wasted VPU lanes and relayout traffic on
    every elementwise op of the composite chain). With the channel axis
    leading, every heavy op runs on [N, S] arrays whose minor dim is the
    sample count — this is the layout the fused teacher kernel
    (ops/pallas/nerf_forward.py) already produces, so the whole
    kernel -> composite chain stays channel-major with one tiny [3, N] ->
    [N, 3] transpose at the very end.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1)[..., None]

    rgb = jax.nn.sigmoid(raw_cm[:3])                       # [3, N, S]

    sigma = raw_cm[3]                                      # [N, S]
    if raw_noise_std > 0.0:
        if noise is None:
            noise = jax.random.normal(noise_key, sigma.shape) * raw_noise_std
        sigma = sigma + noise

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    trans = exclusive_cumprod(1.0 - alpha + 1e-10, axis=-1)
    weights = alpha * trans                                # [N, S]

    rgb_map = jnp.sum(weights[None] * rgb, axis=-1).T      # [N, 3]
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)
