"""Ray generation and NDC projection (pure jnp, static shapes).

Behavioral parity with the reference ray stack
(/root/reference/utils/run_nerf_raybased_helpers.py:231-279): pixel (x, y)
maps to a camera-space direction ((x - W/2)/f, -(y - H/2)/f, -1) which is
rotated by the camera-to-world matrix; ray origins are the camera position.
Unlike the reference (which rebuilds the meshgrid per call on host), the
pixel-direction grid here is a pure function of static (H, W, focal) so XLA
constant-folds it inside jit, and a cached variant is provided for reuse.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "pixel_dirs",
    "get_rays",
    "get_rays_np",
    "ndc_rays",
    "translate_origin_fixed",
    "plucker_rays",
]


@functools.lru_cache(maxsize=32)
def _pixel_dirs_np(H: int, W: int, focal: float) -> np.ndarray:
    """Camera-frame unit-plane directions for every pixel, as [H, W, 3]."""
    x = np.arange(W, dtype=np.float32)
    y = np.arange(H, dtype=np.float32)
    xs, ys = np.meshgrid(x, y, indexing="xy")  # each [H, W]
    dirs = np.stack(
        [(xs - W * 0.5) / focal, -(ys - H * 0.5) / focal, -np.ones_like(xs)],
        axis=-1,
    )
    return dirs


def pixel_dirs(H: int, W: int, focal: float) -> jnp.ndarray:
    """[H, W, 3] camera-frame direction for each pixel (z = -1 plane)."""
    return jnp.asarray(_pixel_dirs_np(H, W, float(focal)))


def get_rays(H, W, focal, c2w, focal_scale: float = 1.0):
    """World-space rays for every pixel of a pinhole camera.

    Args:
      c2w: [3, 4] (or [4, 4]; only the top 3x4 is used) camera-to-world.
      focal_scale: multiplies focal (used by the pseudo-data generator's
        random-focal augmentation, reference create_data.py:816-818).

    Returns:
      (rays_o, rays_d), each [H, W, 3]. rays_d is NOT normalized (parity with
      the reference; the volume integrator rescales dists by ||rays_d||).

    focal_scale may be a traced jnp scalar (the pseudo-data generator draws
    it randomly per frame under jit); the pixel grid stays a compile-time
    constant and only the x/y components are rescaled.
    """
    c2w = jnp.asarray(c2w)
    if isinstance(focal_scale, (int, float)):
        dirs = pixel_dirs(H, W, float(focal) * float(focal_scale))
    else:
        dirs = pixel_dirs(H, W, float(focal))
        dirs = jnp.concatenate(
            [dirs[..., :2] / focal_scale, dirs[..., 2:]], axis=-1)
    # Rotate camera-frame dirs into the world frame: d_w = R @ d_c.
    # Elementwise mul + sum (VPU) instead of einsum: a 3x3 contraction gains
    # nothing from the MXU and the TPU default matmul precision (bf16) would
    # corrupt ray directions.
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H, W, focal, c2w):
    """Numpy twin of get_rays (host-side data prep / converters)."""
    c2w = np.asarray(c2w)
    dirs = _pixel_dirs_np(H, W, float(focal))
    rays_d = np.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H, W, focal, near, rays_o, rays_d):
    """Shift ray origins to the near plane and project to NDC.

    For forward-facing (LLFF) scenes. Parity with reference
    run_nerf_raybased_helpers.py:260-279.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    fx = W / (2.0 * focal)
    fy = H / (2.0 * focal)
    o0 = -1.0 / fx * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / fy * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / fx * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / fy * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def translate_origin_fixed(rays_o, rays_d, scale: float):
    """Slide ray origins `scale` units along the (normalized) direction.

    Reference helpers.py:214-227 ('fixed' trans_origin mode; hand-tuned for
    blender). The reference's 'adapative' mode calls an undefined function
    (helpers.py:249-250, a latent NameError) and is deliberately not ported.
    """
    rd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o + scale * rd


def translate_origin_to_sphere(rays_o, rays_d, radius: float = 3.6):
    """Slide each origin along its ray onto the |o'| = radius sphere.

    Vectorized analytic version of the reference's per-ray python loop
    (helpers.py:186-200, translate_origin_v2): solve
    |o + t*u|^2 = r^2 for unit direction u and pick the root closest to the
    camera (the reference's min-|root| / sign logic).
    """
    u = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    m2 = jnp.sum(rays_o * rays_o, axis=-1)
    b = jnp.sum(rays_o * u, axis=-1)  # = -m*cos(theta) in the reference
    disc = jnp.maximum(b * b - m2 + radius * radius, 0.0)
    sq = jnp.sqrt(disc)
    d1 = -b + sq
    d2 = -b - sq
    opposite = d1 * d2 < 0
    min_abs = jnp.where(jnp.abs(d1) <= jnp.abs(d2), d1, d2)
    t = jnp.where(opposite, jnp.maximum(d1, d2),
                  jnp.sign(d1) * jnp.abs(min_abs))
    return rays_o + t[..., None] * u


def apply_trans_origin(rays_o, rays_d, trans_origin: str):
    """Dispatch the --trans_origin modes (reference option.py:253, applied to
    every get_rays in data generation via functools.partial,
    create_data.py:34-37):

      ''           no-op
      'fixed'      translate 30 units along the ray (helpers.py:249-255)
      '<float>'    translate that many units
      'adapative' / 'adaptive' / 'to_sphere'
                   project origins onto the |o|=3.6 sphere. The reference's
                   'adapative' branch calls an undefined function (a latent
                   NameError, helpers.py:249-250); translate_origin_v2 is its
                   evident intent, so we map it there instead of crashing.
    """
    if not trans_origin:
        return rays_o
    if trans_origin in ("adapative", "adaptive", "to_sphere"):
        return translate_origin_to_sphere(rays_o, rays_d)
    scale = 30.0 if trans_origin == "fixed" else float(trans_origin)
    return translate_origin_fixed(rays_o, rays_d, scale)


def plucker_rays(rays_o, rays_d):
    """Plucker-coordinate ray representation [..., 6] = (d, o x d).

    Reference nerf_raybased.py:170-188.
    """
    m = jnp.cross(rays_o, rays_d)
    return jnp.concatenate([rays_d, m], axis=-1)
