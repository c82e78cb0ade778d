"""Metric tests: SSIM vs an independent torch twin, FLIP invariants, PSNR."""
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_nerf_tpu.metrics import (flip, flip_error_map, img2mse,
                                        mse2psnr, psnr, ssim)


def test_psnr_known_values():
    a = jnp.zeros((4, 4, 3))
    b = jnp.full((4, 4, 3), 0.1)
    np.testing.assert_allclose(float(img2mse(a, b)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(mse2psnr(jnp.asarray(0.01))), 20.0, rtol=1e-5)
    assert float(psnr(a, a)) == np.inf


def test_ssim_identity_and_range(rng):
    img = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    assert float(ssim(jnp.asarray(img), jnp.asarray(img))) == pytest.approx(1.0, abs=1e-5)
    noisy = np.clip(img + rng.normal(size=img.shape) * 0.2, 0, 1).astype(np.float32)
    s = float(ssim(jnp.asarray(img), jnp.asarray(noisy)))
    assert 0.0 < s < 1.0


def test_ssim_matches_torch_twin(rng):
    """Independent torch implementation of windowed SSIM as the golden."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    img1 = rng.uniform(size=(2, 12, 12, 3)).astype(np.float32)
    img2 = rng.uniform(size=(2, 12, 12, 3)).astype(np.float32)

    # torch twin (NCHW, zero pad 5, window 11 sigma 1.5)
    x = np.arange(11) - 5
    g = np.exp(-(x ** 2) / (2 * 1.5 ** 2))
    g = (g / g.sum()).astype(np.float32)
    w2 = np.outer(g, g)
    win = torch.from_numpy(np.tile(w2[None, None], (3, 1, 1, 1)))
    t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
    t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))

    def filt(t):
        return F.conv2d(t, win, padding=5, groups=3)

    mu1, mu2 = filt(t1), filt(t2)
    s1 = filt(t1 * t1) - mu1 ** 2
    s2 = filt(t2 * t2) - mu2 ** 2
    s12 = filt(t1 * t2) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    want = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) /
            ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))).mean().item()

    got = float(ssim(jnp.asarray(img1), jnp.asarray(img2)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_flip_identity_is_zero(rng):
    img = rng.uniform(size=(1, 24, 24, 3)).astype(np.float32)
    e = float(flip(jnp.asarray(img), jnp.asarray(img)))
    assert e == pytest.approx(0.0, abs=1e-5)


def test_flip_monotone_and_bounded(rng):
    ref = rng.uniform(size=(1, 24, 24, 3)).astype(np.float32)
    small = np.clip(ref + rng.normal(size=ref.shape) * 0.02, 0, 1).astype(np.float32)
    big = np.clip(ref + rng.normal(size=ref.shape) * 0.4, 0, 1).astype(np.float32)
    e_small = float(flip(jnp.asarray(ref), jnp.asarray(small)))
    e_big = float(flip(jnp.asarray(ref), jnp.asarray(big)))
    assert 0.0 <= e_small < e_big <= 1.0
    m = flip_error_map(jnp.asarray(ref), jnp.asarray(big))
    assert m.shape == (1, 24, 24, 1)
    assert (np.asarray(m) >= 0).all() and (np.asarray(m) <= 1).all()


def test_flip_opposite_colors_large():
    """Green vs blue patches should be near the error ceiling."""
    g = np.zeros((1, 16, 16, 3), np.float32); g[..., 1] = 1
    b = np.zeros((1, 16, 16, 3), np.float32); b[..., 2] = 1
    e = float(flip(jnp.asarray(g), jnp.asarray(b)))
    assert e > 0.6


def test_lpips_gated():
    from efficient_nerf_tpu.metrics import lpips_available
    # weights are not shipped in this environment; the gate must be honest
    assert lpips_available("/nonexistent/p.npz") is False
