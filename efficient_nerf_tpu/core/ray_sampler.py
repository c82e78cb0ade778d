"""R2L ray -> flattened network-input sampling.

The R2L student consumes an entire ray as ONE network input: n_sample points
along the ray are flattened into the feature dimension ([B, n_sample*3]),
deliberately removing the per-sample axis (reference
model/nerf_raybased.py:76-188, PointSampler). This module is the functional
TPU equivalent: static shapes, explicit RNG, no cached device tensors —
the pixel grid and base z-values are constant-folded by XLA under jit.

Stratified perturbation is ON during training (an augmentation: the student
sees jittered sample positions, reference main.py:1367-1373) and OFF at test.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .rays import get_rays, plucker_rays
from .sampling import linear_zvals, stratify_zvals

__all__ = ["sample_ray_points", "sample_image_points",
           "sample_patch_points"]


def sample_ray_points(rays_o, rays_d, near: float, far: float, n_sample: int,
                      key: Optional[jax.Array] = None, perturb: bool = False,
                      t_rand=None):
    """Flatten rays into R2L inputs.

    Args:
      rays_o, rays_d: [B, 3].
      perturb: stratified jitter of the fixed linspace depths (train-time).

    Returns [B, n_sample*3] flattened sample coordinates.
    """
    z = linear_zvals(near, far, n_sample)  # [S]
    z = jnp.broadcast_to(z, rays_o.shape[:-1] + (n_sample,))
    if perturb:
        z = stratify_zvals(key, z, t_rand)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z[..., :, None]
    return pts.reshape(pts.shape[:-2] + (n_sample * 3,))


def sample_patch_points(rays_o, rays_d, near: float, far: float,
                        n_sample: int, key: Optional[jax.Array] = None,
                        perturb: bool = False, t_rand=None):
    """CNN-style patch sampling: rays [N, ph, pw, 3] -> [N, ph, pw, S*3].

    Parity with reference PointSampler.sample_train2 / sample_train_cnnstyle
    (nerf_raybased.py:129-173): the stratified jitter draws ONE uniform per
    patch/image (t_rand [N]) broadcast over all pixels and samples — the
    whole patch shifts coherently — unlike the per-ray-per-sample jitter of
    sample_ray_points. The flattened per-pixel layout matches
    PositionalEmbedder.embed_cnnstyle composed with a reshape.
    """
    N = rays_o.shape[0]
    z = linear_zvals(near, far, n_sample)  # [S]
    z = jnp.broadcast_to(z, rays_o.shape[:-1] + (n_sample,))
    if perturb:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        if t_rand is None:
            t_rand = jax.random.uniform(key, (N,))
        t = t_rand.reshape((N,) + (1,) * (z.ndim - 1))
        z = lower + (upper - lower) * t
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z[..., :, None]
    return pts.reshape(pts.shape[:-2] + (n_sample * 3,))


def sample_image_points(c2w, H: int, W: int, focal: float, near: float,
                        far: float, n_sample: int, plucker: bool = False):
    """Full-image R2L inputs for one camera: [H*W, n_sample*3] (or [H*W, 6]
    in Plucker mode)."""
    rays_o, rays_d = get_rays(H, W, focal, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    if plucker:
        return plucker_rays(rays_o, rays_d)
    return sample_ray_points(rays_o, rays_d, near, far, n_sample, perturb=False)
