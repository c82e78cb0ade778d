"""Golden tests for stratified/hierarchical sampling, encodings and the
volume integrator, against independent numpy implementations."""
import jax
import jax.numpy as jnp
import numpy as np

from efficient_nerf_tpu.core import (linear_zvals, nerf_embed, raw2outputs,
                                     ray_embed, sample_pdf, sample_ray_points,
                                     stratified_sample, exclusive_cumprod)


def test_linear_zvals():
    z = np.asarray(linear_zvals(2.0, 6.0, 5))
    np.testing.assert_allclose(z, [2, 3, 4, 5, 6], atol=1e-6)
    zl = np.asarray(linear_zvals(2.0, 6.0, 3, lindisp=True))
    np.testing.assert_allclose(zl, 1.0 / np.array([1 / 2.0, (1 / 2.0 + 1 / 6.0) / 2, 1 / 6.0]), atol=1e-6)


def test_stratified_jitter_within_intervals(rng):
    n_rays, S = 16, 8
    rays_o = jnp.zeros((n_rays, 3))
    rays_d = jnp.asarray(rng.normal(size=(n_rays, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    pts, z = stratified_sample(key, rays_o, rays_d, 2.0, 6.0, S, perturb=True)
    z = np.asarray(z)
    base = np.asarray(linear_zvals(2.0, 6.0, S))
    mids = 0.5 * (base[1:] + base[:-1])
    lower = np.concatenate([[base[0]], mids])
    upper = np.concatenate([mids, [base[-1]]])
    assert (z >= lower - 1e-6).all() and (z <= upper + 1e-6).all()
    # deterministic t_rand hook
    t = np.full((n_rays, S), 0.5, np.float32)
    _, z2 = stratified_sample(key, rays_o, rays_d, 2.0, 6.0, S, perturb=True,
                              t_rand=jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(z2),
        np.broadcast_to(lower + (upper - lower) * 0.5, (n_rays, S)),
        atol=1e-5,
    )
    # points lie on rays
    pts = np.asarray(pts)
    expect = np.asarray(rays_o)[:, None, :] + np.asarray(rays_d)[:, None, :] * np.asarray(z)[:, :, None]
    np.testing.assert_allclose(pts, expect, atol=1e-5)


def _ref_sample_pdf(bins, weights, u):
    """Independent numpy inverse-CDF sampler."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros_like(pdf[..., :1]), np.cumsum(pdf, -1)], -1)
    out = np.empty_like(u)
    for r in range(u.shape[0]):
        for s in range(u.shape[1]):
            idx = np.searchsorted(cdf[r], u[r, s], side="right")
            below = max(0, idx - 1)
            above = min(cdf.shape[-1] - 1, idx)
            cb, ca = cdf[r, below], cdf[r, above]
            bb = bins[r, min(below, bins.shape[-1] - 1)]
            ba = bins[r, min(above, bins.shape[-1] - 1)]
            denom = ca - cb
            if denom < 1e-5:
                denom = 1.0
            t = (u[r, s] - cb) / denom
            out[r, s] = bb + t * (ba - bb)
    return out


def test_sample_pdf_matches_numpy(rng):
    n_rays, B, S = 6, 10, 7
    bins = np.sort(rng.uniform(2, 6, size=(n_rays, B)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, size=(n_rays, B - 1)).astype(np.float32)
    u = rng.uniform(0, 1, size=(n_rays, S)).astype(np.float32)
    got = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights), S,
                                u=jnp.asarray(u)))
    want = _ref_sample_pdf(bins, weights, u)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_pdf_det_and_random():
    key = jax.random.PRNGKey(3)
    bins = jnp.linspace(2.0, 6.0, 11)[None].repeat(4, 0)
    weights = jnp.ones((4, 10))
    det = np.asarray(sample_pdf(key, bins, weights, 5, det=True))
    # uniform weights + det levels -> evenly spaced depths
    np.testing.assert_allclose(det, np.linspace(2.0, 6.0, 5)[None].repeat(4, 0), atol=1e-4)
    rnd = np.asarray(sample_pdf(key, bins, weights, 64))
    assert ((rnd >= 2.0) & (rnd <= 6.0)).all()


def test_sample_pdf_concentrates_mass():
    key = jax.random.PRNGKey(4)
    bins = jnp.linspace(0.0, 1.0, 11)[None]
    weights = jnp.zeros((1, 10)).at[0, 5].set(100.0)
    s = np.asarray(sample_pdf(key, bins, weights, 256))
    frac = ((s >= 0.5) & (s <= 0.6)).mean()
    assert frac > 0.95


def test_nerf_embed_layout():
    x = jnp.asarray(np.array([[0.1, -0.2, 0.3]], np.float32))
    L = 4
    e = np.asarray(nerf_embed(x, L))
    assert e.shape == (1, 3 * (2 * L + 1))
    np.testing.assert_allclose(e[0, :3], [0.1, -0.2, 0.3], atol=1e-6)
    xv = np.array([0.1, -0.2, 0.3])
    # layout: x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...
    for i in range(L):
        np.testing.assert_allclose(e[0, 3 + 6 * i:3 + 6 * i + 3], np.sin(xv * 2.0**i), atol=1e-6)
        np.testing.assert_allclose(e[0, 3 + 6 * i + 3:3 + 6 * i + 6], np.cos(xv * 2.0**i), atol=1e-6)


def test_ray_embed_layout():
    K, L = 6, 3
    x = np.linspace(-1, 1, K).astype(np.float32)[None]
    e = np.asarray(ray_embed(jnp.asarray(x), L))
    assert e.shape == (1, K * (2 * L + 1))
    # per-scalar layout: sin(f0 k..fL-1 k), cos(...), k
    stride = 2 * L + 1
    for k in range(K):
        blk = e[0, k * stride:(k + 1) * stride]
        np.testing.assert_allclose(blk[:L], np.sin(x[0, k] * 2.0 ** np.arange(L)), atol=1e-6)
        np.testing.assert_allclose(blk[L:2 * L], np.cos(x[0, k] * 2.0 ** np.arange(L)), atol=1e-6)
        np.testing.assert_allclose(blk[-1], x[0, k], atol=1e-6)


def test_exclusive_cumprod():
    x = jnp.asarray(np.array([[2.0, 3.0, 4.0]]))
    got = np.asarray(exclusive_cumprod(x))
    np.testing.assert_allclose(got, [[1.0, 2.0, 6.0]])


def _ref_raw2outputs(raw, z_vals, rays_d, white_bkgd):
    """Independent numpy compositor."""
    N, S, _ = raw.shape
    dists = np.concatenate([z_vals[:, 1:] - z_vals[:, :-1],
                            np.full((N, 1), 1e10, np.float64)], -1)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    alpha = 1.0 - np.exp(-np.maximum(raw[..., 3], 0.0) * dists)
    T = np.ones((N, S))
    for i in range(1, S):
        T[:, i] = T[:, i - 1] * (1.0 - alpha[:, i - 1] + 1e-10)
    w = alpha * T
    rgb_map = (w[..., None] * rgb).sum(1)
    depth = (w * z_vals).sum(1)
    acc = w.sum(1)
    disp = 1.0 / np.maximum(1e-10, depth / acc)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[:, None])
    return rgb_map, disp, acc, w, depth


def test_raw2outputs_matches_numpy(rng):
    N, S = 12, 9
    raw = rng.normal(size=(N, S, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, size=(N, S)).astype(np.float32), -1)
    rays_d = rng.normal(size=(N, 3)).astype(np.float32)
    for wb in (False, True):
        out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d),
                          white_bkgd=wb)
        rgb, disp, acc, w, depth = _ref_raw2outputs(raw.astype(np.float64), z, rays_d, wb)
        np.testing.assert_allclose(np.asarray(out.rgb), rgb, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.weights), w, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.depth), depth, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.acc), acc, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.disp), disp, rtol=1e-3)


def test_raw2outputs_opaque_surface():
    """A single fully opaque sample should dominate the ray color."""
    N, S = 2, 5
    raw = np.zeros((N, S, 4), np.float32)
    raw[:, 2, 3] = 1e6  # huge density at sample 2
    raw[:, :, :3] = np.array([10.0, -10.0, 0.0])  # sigmoid -> (1, 0, 0.5)
    z = np.broadcast_to(np.linspace(2, 6, S, dtype=np.float32), (N, S)).copy()
    rays_d = np.tile(np.array([[0, 0, -1.0]], np.float32), (N, 1))
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d))
    np.testing.assert_allclose(np.asarray(out.rgb), [[1, 0, 0.5]] * N, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth), [z[0, 2]] * N, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc), [1.0] * N, atol=1e-5)


def test_sample_ray_points_flatten():
    rays_o = jnp.asarray(np.array([[0, 0, 0]], np.float32))
    rays_d = jnp.asarray(np.array([[0, 0, -1.0]], np.float32))
    pts = np.asarray(sample_ray_points(rays_o, rays_d, 2.0, 6.0, 4))
    assert pts.shape == (1, 12)
    np.testing.assert_allclose(
        pts[0], [0, 0, -2, 0, 0, -10 / 3, 0, 0, -14 / 3, 0, 0, -6.0], atol=1e-5
    )


def test_merge_sorted_equals_sort(rng):
    from efficient_nerf_tpu.core.sampling import merge_sorted

    for m, n in [(64, 128), (5, 7), (1, 1), (16, 3)]:
        a = np.sort(rng.normal(size=(17, m)).astype(np.float32), -1)
        b = np.sort(rng.normal(size=(17, n)).astype(np.float32), -1)
        got = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
        want = np.sort(np.concatenate([a, b], -1), -1)
        np.testing.assert_array_equal(got, want)


def test_sorted_uniform_is_sorted_and_uniform():
    from efficient_nerf_tpu.core.sampling import sorted_uniform

    u = np.asarray(sorted_uniform(jax.random.PRNGKey(0), (50000, 8)))
    assert (np.diff(u, axis=-1) >= 0).all()
    assert u.min() > 0.0 and u.max() < 1.0
    # k-th of n=8 order statistics has mean k/(n+1)
    np.testing.assert_allclose(u.mean(0), np.arange(1, 9) / 9.0, atol=7e-3)


def test_sample_pdf_sorted_u_output_is_sorted(rng):
    from efficient_nerf_tpu.core.sampling import sample_pdf

    bins = np.sort(rng.uniform(2.0, 6.0, size=(11, 9)).astype(np.float32), -1)
    w = rng.uniform(size=(11, 8)).astype(np.float32)
    z = np.asarray(sample_pdf(jax.random.PRNGKey(1), jnp.asarray(bins),
                              jnp.asarray(w), 32, det=False, sorted_u=True))
    assert (np.diff(z, axis=-1) >= 0).all()
