"""Real-data -> ray-shard converters.

Parity with reference utils/convert_original_data_to_rays_{blender,llff}.py:
every training image becomes H*W rows of [rays_o, rays_d, rgb], all rows are
double-shuffled and written as 4096-row train_{k}.npy shards (the `train_`
prefix marks REAL data for RayShardDataset's pseudo/real mixing).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..core.rays import get_rays_np, ndc_rays
from .blender import composite_white, load_blender_data
from .llff import load_llff_data

__all__ = ["rays_to_shards", "convert_blender_to_rays", "convert_llff_to_rays"]

SHARD_ROWS = 4096


def rays_to_shards(rows: np.ndarray, outdir: str, prefix: str = "train_",
                   rng: Optional[np.random.Generator] = None,
                   start_index: int = 1) -> int:
    """Double-shuffle rows [N, D] and write ceil-less full 4096-row shards.

    Returns the number of shards written.
    """
    rng = rng or np.random.default_rng(0)
    rows = rows[rng.permutation(rows.shape[0])]
    rows = rows[rng.permutation(rows.shape[0])]
    os.makedirs(outdir, exist_ok=True)
    num = rows.shape[0] // SHARD_ROWS
    for k in range(num):
        np.save(os.path.join(outdir, f"{prefix}{start_index + k}.npy"),
                rows[k * SHARD_ROWS:(k + 1) * SHARD_ROWS].astype(np.float32))
    return num


def _pack_image_rays(H, W, focal, pose, img, ndc: bool = False):
    rays_o, rays_d = get_rays_np(H, W, focal, pose)
    if ndc:
        import jax.numpy as jnp

        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, jnp.asarray(rays_o),
                                  jnp.asarray(rays_d))
        rays_o, rays_d = np.asarray(rays_o), np.asarray(rays_d)
    return np.concatenate(
        [rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), img.reshape(-1, img.shape[-1])],
        axis=-1,
    ).astype(np.float32)


def convert_blender_to_rays(datadir: str, outdir: str, half_res: bool = True,
                            white_bkgd: bool = True,
                            splits=("train",), seed: int = 0) -> int:
    data = load_blender_data(datadir, half_res=half_res, testskip=1,
                             splits=list(splits))
    H, W, focal = data.hwf
    imgs = composite_white(data.images, white_bkgd)
    rows = np.concatenate(
        [_pack_image_rays(H, W, focal, p[:3, :4], im)
         for p, im in zip(data.poses, imgs)], 0)
    return rays_to_shards(rows, outdir, rng=np.random.default_rng(seed))


def convert_llff_to_rays(datadir: str, outdir: str, factor: int = 8,
                         llffhold: int = 8, ndc: bool = True,
                         seed: int = 0) -> int:
    data = load_llff_data(datadir, factor=factor)
    H, W, focal = data.poses[0, :3, -1]
    H, W, focal = int(H), int(W), float(focal)
    i_test = (np.arange(data.images.shape[0])[::llffhold] if llffhold > 0
              else np.array([data.i_test]))
    i_train = np.array([i for i in range(data.images.shape[0])
                        if i not in i_test])
    rows = np.concatenate(
        [_pack_image_rays(H, W, focal, data.poses[i, :3, :4], data.images[i],
                          ndc=ndc) for i in i_train], 0)
    return rays_to_shards(rows, outdir, rng=np.random.default_rng(seed))
