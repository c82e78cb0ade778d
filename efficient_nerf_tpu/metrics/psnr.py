"""MSE / PSNR (reference helpers.py:19-20)."""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["img2mse", "mse2psnr", "psnr"]


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse):
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def psnr(x, y):
    return mse2psnr(img2mse(x, y))
