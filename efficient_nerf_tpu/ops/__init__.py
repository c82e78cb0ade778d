"""Fused TPU ops with pure-jnp reference fallbacks.

Two tiers:
  * `ray_points_embed` — linearized sampling+embedding (y = o@P1 + d@P2 then
    a trig select). Pure jnp, numerically identical to
    core.ray_sampler+core.encoding, but avoids materializing the [B, K, L]
    broadcast intermediates; used on every backend.
  * `r2l_forward_fused` — the Pallas megakernel (ops/pallas/r2l_forward.py):
    whole R2L inference forward in VMEM. TPU only; gate with
    `fused_r2l_available()`; force-off with EFFICIENT_NERF_TPU_NO_PALLAS=1.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["ray_points_embed", "fused_r2l_available", "r2l_forward_fused",
           "fused_ray_embed_available", "fused_nerf_available",
           "nerf_forward_fused", "fused_r2l_train_available",
           "r2l_train_apply", "r2l_forward_int8",
           "sample_pdf_det_fused", "fused_nerf_frame_available",
           "nerf_render_rays_fused"]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def fused_r2l_available() -> bool:
    if os.environ.get("EFFICIENT_NERF_TPU_NO_PALLAS"):
        return False
    if not _on_tpu():
        return False
    try:
        from .pallas import r2l_forward  # noqa: F401
        return True
    except ImportError:
        return False


# back-compat alias (bench.py round-1 name)
fused_ray_embed_available = fused_r2l_available


def fused_nerf_available() -> bool:
    """Teacher field-eval megakernel (ops/pallas/nerf_forward.py) gate."""
    if os.environ.get("EFFICIENT_NERF_TPU_NO_PALLAS"):
        return False
    if not _on_tpu():
        return False
    try:
        from .pallas import nerf_forward  # noqa: F401
        return True
    except ImportError:
        return False


def nerf_forward_fused(*args, **kwargs):
    from .pallas.nerf_forward import nerf_forward_fused as impl

    return impl(*args, **kwargs)


def fused_nerf_frame_available() -> bool:
    """Whole-ray teacher megakernel (ops/pallas/nerf_frame.py) gate:
    coarse->CDF->merge->fine in one VMEM program. Force-off independently
    of the field-eval kernel with EFFICIENT_NERF_TPU_NO_FRAME_KERNEL=1."""
    if os.environ.get("EFFICIENT_NERF_TPU_NO_FRAME_KERNEL"):
        return False
    if not fused_nerf_available():
        return False
    try:
        from .pallas import nerf_frame  # noqa: F401
        return True
    except ImportError:
        return False


def nerf_render_rays_fused(*args, **kwargs):
    from .pallas.nerf_frame import nerf_render_rays_fused as impl

    return impl(*args, **kwargs)


def ray_points_embed(rays_o, rays_d, near, far, n_sample, L,
                     key=None, perturb=False):
    """rays -> flattened stratified points -> R2L positional encoding.

    Deterministic path uses the linearized formulation; the perturbed
    (training) path falls back to the explicit sample+embed chain.
    """
    if perturb:
        from ..core.encoding import ray_embed
        from ..core.ray_sampler import sample_ray_points

        pts = sample_ray_points(rays_o, rays_d, near, far, n_sample, key=key,
                                perturb=True)
        return ray_embed(pts, L)

    from .pallas.r2l_forward import embed_constants

    P1, P2, mode = embed_constants(n_sample, L, near, far)
    # HIGHEST: TPU XLA's default matmul truncates operands to bf16; the
    # 2^j-scaled P columns amplify that into O(1) sin-phase error
    hi = jax.lax.Precision.HIGHEST
    y = (jnp.matmul(rays_o, P1, precision=hi)
         + jnp.matmul(rays_d, P2, precision=hi))
    return jnp.where(mode == 0, jnp.sin(y),
                     jnp.where(mode == 1, jnp.cos(y), y))


def r2l_forward_fused(*args, **kwargs):
    from .pallas.r2l_forward import r2l_forward_fused as impl

    return impl(*args, **kwargs)


def fused_r2l_train_available() -> bool:
    """Fused training fwd+bwd custom-VJP kernel (ops/pallas/r2l_train.py).

    Single-process only: the kernel is not GSPMD-partitionable, so sharded
    steps (parallel/train.py) keep the XLA path.
    """
    if os.environ.get("EFFICIENT_NERF_TPU_NO_PALLAS"):
        return False
    if not _on_tpu():
        return False
    try:
        from .pallas import r2l_train  # noqa: F401
        return True
    except ImportError:
        return False


def r2l_train_apply(*args, **kwargs):
    from .pallas.r2l_train import r2l_train_apply as impl

    return impl(*args, **kwargs)


def r2l_forward_int8(*args, **kwargs):
    """W8A8 serving kernel (ops/pallas/r2l_int8.py); gate with
    fused_r2l_available()."""
    from .pallas.r2l_int8 import r2l_forward_int8 as impl

    return impl(*args, **kwargs)


def sample_pdf_det_fused(*args, **kwargs):
    """Fused deterministic inverse-CDF sampler (ops/pallas/sample_pdf.py);
    gate with fused_nerf_available() — it rides the teacher eval path."""
    from .pallas.sample_pdf import sample_pdf_det_fused as impl

    return impl(*args, **kwargs)
