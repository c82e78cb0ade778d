"""Fused TPU ops (Pallas kernels) with pure-jnp reference fallbacks.

Every kernel here has a jnp twin in core/ used as the numerical reference;
kernels activate only on TPU backends and can be force-disabled with
EFFICIENT_NERF_TPU_NO_PALLAS=1.
"""
from __future__ import annotations

import os

import jax

__all__ = ["fused_ray_embed_available", "ray_points_embed"]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def fused_ray_embed_available() -> bool:
    if os.environ.get("EFFICIENT_NERF_TPU_NO_PALLAS"):
        return False
    if not _on_tpu():
        return False
    try:
        from .pallas import ray_embed  # noqa: F401
        return True
    except ImportError:
        return False


def ray_points_embed(rays_o, rays_d, near, far, n_sample, L,
                     key=None, perturb=False):
    """Fused rays -> stratified points -> flattened-ray PE.

    Dispatches to the Pallas kernel on TPU, else the jnp path.
    """
    if fused_ray_embed_available():
        from .pallas.ray_embed import ray_points_embed_pallas

        return ray_points_embed_pallas(rays_o, rays_d, near, far, n_sample, L,
                                       key=key, perturb=perturb)
    from ..core.encoding import ray_embed
    from ..core.ray_sampler import sample_ray_points

    pts = sample_ray_points(rays_o, rays_d, near, far, n_sample, key=key,
                            perturb=perturb)
    return ray_embed(pts, L)
