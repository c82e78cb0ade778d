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


def _random_lpips_weights(rng):
    """Tiny random AlexNet-LPIPS weights in our .npz key format. Channel
    counts come from the weight shapes (only stride/pad are hardcoded), so
    small channels keep the test fast. lin weights are drawn non-negative,
    matching the LPIPS training constraint (the graph clamps at 0 anyway)."""
    chans = [(3, 8, 11), (8, 12, 5), (12, 16, 3), (16, 16, 3), (16, 16, 3)]
    w = {}
    for i, (cin, cout, k) in enumerate(chans):
        w[f"conv{i}_w"] = (rng.normal(size=(cout, cin, k, k)) * 0.1).astype(
            np.float32)
        w[f"conv{i}_b"] = (rng.normal(size=(cout,)) * 0.1).astype(np.float32)
        w[f"lin{i}_w"] = rng.uniform(0, 1, size=(cout,)).astype(np.float32)
    w["shift"] = np.array([-0.030, -0.088, -0.188], np.float32)
    w["scale"] = np.array([0.458, 0.448, 0.450], np.float32)
    return w


def test_lpips_graph_matches_torch_twin(rng):
    """Numeric validation of the jnp LPIPS pipeline (metrics/lpips.py:47-98)
    against a torch twin of the pip-lpips computation (scaling layer ->
    AlexNet conv/relu features with pools after slices 1 and 2 -> channel
    unit-normalize -> squared diff -> non-negative 1x1 lin -> spatial mean,
    summed over the 5 feature levels) with matched random weights."""
    import torch
    import torch.nn.functional as F

    from efficient_nerf_tpu.metrics import lpips

    w = _random_lpips_weights(rng)
    img0 = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    img1 = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)

    def torch_feats(x):
        shift = torch.tensor(w["shift"]).view(1, 3, 1, 1)
        scale = torch.tensor(w["scale"]).view(1, 3, 1, 1)
        h = (x - shift) / scale
        out = []
        strides_pads = [(4, 2), (1, 2), (1, 1), (1, 1), (1, 1)]
        for i, (s, p) in enumerate(strides_pads):
            h = F.conv2d(h, torch.tensor(w[f"conv{i}_w"]),
                         torch.tensor(w[f"conv{i}_b"]), stride=s, padding=p)
            h = F.relu(h)
            out.append(h)
            if i in (0, 1):
                h = F.max_pool2d(h, 3, 2)
        return out

    t0 = torch.from_numpy(img0).permute(0, 3, 1, 2)
    t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
    with torch.no_grad():
        total = torch.zeros(2)
        for i, (a, b) in enumerate(zip(torch_feats(t0), torch_feats(t1))):
            na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb) ** 2
            lin = torch.tensor(w[f"lin{i}_w"]).view(1, -1, 1, 1)
            total = total + (lin * d).sum(1).mean((1, 2))

    got = lpips(jnp.asarray(img0), jnp.asarray(img1), weights=w)
    np.testing.assert_allclose(np.asarray(got), total.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_lpips_weights_npz_roundtrip(tmp_path, rng):
    """load_lpips_weights + the lpips_available gate over a real .npz file
    in the converter's output format."""
    from efficient_nerf_tpu.metrics import lpips_available
    from efficient_nerf_tpu.metrics.lpips import load_lpips_weights, lpips

    w = _random_lpips_weights(rng)
    path = str(tmp_path / "lpips_alex.npz")
    np.savez(path, **w)
    assert lpips_available(path)
    loaded = load_lpips_weights(path)
    assert set(loaded) == set(w)
    img = rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32)
    d_same = lpips(jnp.asarray(img), jnp.asarray(img), weights_path=path)
    assert float(d_same[0]) < 1e-8  # identical images -> zero distance
