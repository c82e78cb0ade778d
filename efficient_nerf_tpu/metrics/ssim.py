"""SSIM with an 11x11 sigma-1.5 gaussian window.

Parity with reference utils/ssim_torch.py (zero padding window//2,
C1=0.01^2, C2=0.03^2, biased variance estimates). Layout is NHWC
(TPU-native); a helper accepts single [H, W, C] images.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ssim", "ssim_image"]


@functools.lru_cache(maxsize=8)
def _window_np(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


def _depthwise_filter(img, window, channels):
    """NHWC depthwise conv with zero 'same' padding."""
    k = window.shape[0]
    filt = jnp.asarray(window).reshape(k, k, 1, 1)
    filt = jnp.tile(filt, (1, 1, 1, channels))  # HWIO with I=1, O=C groups
    return jax.lax.conv_general_dilated(
        img, filt, window_strides=(1, 1), padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
    )


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5,
         size_average: bool = True):
    """img1/img2: [N, H, W, C] in [0, 1]. Returns scalar (or per-image [N])."""
    C = img1.shape[-1]
    w = _window_np(window_size, sigma)

    mu1 = _depthwise_filter(img1, w, C)
    mu2 = _depthwise_filter(img2, w, C)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2

    sigma1_sq = _depthwise_filter(img1 * img1, w, C) - mu1_sq
    sigma2_sq = _depthwise_filter(img2 * img2, w, C) - mu2_sq
    sigma12 = _depthwise_filter(img1 * img2, w, C) - mu1_mu2

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))

    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def ssim_image(img1, img2, **kw):
    """[H, W, C] convenience wrapper."""
    return ssim(img1[None], img2[None], **kw)
