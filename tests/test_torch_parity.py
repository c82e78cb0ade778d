"""End-to-end numerical parity vs a torch reference pipeline.

BASELINE.md gate: rendered pixels AND pixel gradients must allclose the
PyTorch reference. The torch pipeline here is written from the documented
math (stratified sampling, NeRF positional encoding, MLP, dist*||d||
alpha compositing, det inverse-CDF resampling) using the same architecture
twins as test_models.py; weights transfer through models.torch_import.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from test_models import TorchNeRF, TorchR2L  # noqa: E402

from efficient_nerf_tpu.models import NeRFMLP, R2LNet  # noqa: E402
from efficient_nerf_tpu.models.torch_import import (  # noqa: E402
    nerf_params_from_state_dict, r2l_params_from_state_dict)
from efficient_nerf_tpu.render import RenderConfig, render_rays  # noqa: E402
from efficient_nerf_tpu.render.r2l_renderer import r2l_forward_rays  # noqa: E402


def _torch_nerf_embed(x, L):
    out = [x]
    for i in range(L):
        out += [torch.sin(x * 2.0 ** i), torch.cos(x * 2.0 ** i)]
    return torch.cat(out, -1)


def _torch_raw2outputs(raw, z_vals, rays_d):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
    rgb = torch.sigmoid(raw[..., :3])
    alpha = 1.0 - torch.exp(-torch.relu(raw[..., 3]) * dists)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1),
        -1)[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(-2)
    return rgb_map, weights


def _torch_sample_pdf_det(bins, weights, n):
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.0, 1.0, n).expand(list(cdf.shape[:-1]) + [n])
    inds = torch.searchsorted(cdf.contiguous(), u.contiguous(), right=True)
    below = (inds - 1).clamp(min=0)
    above = inds.clamp(max=cdf.shape[-1] - 1)
    cdf_b = torch.gather(cdf, -1, below)
    cdf_a = torch.gather(cdf, -1, above)
    bins_b = torch.gather(bins, -1, below.clamp(max=bins.shape[-1] - 1))
    bins_a = torch.gather(bins, -1, above.clamp(max=bins.shape[-1] - 1))
    denom = cdf_a - cdf_b
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def _torch_render(tm_coarse, tm_fine, rays_o, rays_d, cfg: RenderConfig,
                  L=10, Lv=4):
    N, S = rays_o.shape[0], cfg.n_samples
    t = torch.linspace(0.0, 1.0, S)
    z = (cfg.near * (1 - t) + cfg.far * t).expand(N, S)
    viewdirs = rays_d / torch.norm(rays_d, dim=-1, keepdim=True)

    def query(model, pts, zv):
        emb = _torch_nerf_embed(pts, L)
        d = _torch_nerf_embed(viewdirs, Lv)[:, None, :].expand(
            pts.shape[0], pts.shape[1], -1)
        return model(torch.cat([emb, d], -1))

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    raw = query(tm_coarse, pts, z)
    rgb0, weights = _torch_raw2outputs(raw, z, rays_d)

    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
    z_samp = _torch_sample_pdf_det(z_mid, weights[..., 1:-1].detach(),
                                   cfg.n_importance).detach()
    z_all, _ = torch.sort(torch.cat([z, z_samp], -1), -1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]
    raw = query(tm_fine, pts, z_all)
    rgb, _ = _torch_raw2outputs(raw, z_all, rays_d)
    return rgb, rgb0


@pytest.fixture
def teacher_pair(rng):
    D, W = 3, 32
    cfg = RenderConfig(n_samples=6, n_importance=5, perturb=False,
                       use_viewdirs=True, near=2.0, far=6.0,
                       fast_embed=False)  # bit-strict parity gate
    # Seed: unseeded init weights depend on how many torch RNG draws earlier
    # tests made, which made the atol here order-dependent (flaky).
    torch.manual_seed(0)
    tm_c = TorchNeRF(D=D, W=W, skips=(1,))
    tm_f = TorchNeRF(D=D, W=W, skips=(1,))
    model = NeRFMLP(depth=D, width=W, skips=(1,), use_viewdirs=True)
    params = {
        "coarse": nerf_params_from_state_dict(tm_c.state_dict(), depth=D),
        "fine": nerf_params_from_state_dict(tm_f.state_dict(), depth=D),
    }
    N = 24
    rays_o = rng.normal(size=(N, 3)).astype(np.float32)
    rays_d = rng.normal(size=(N, 3)).astype(np.float32)
    return cfg, tm_c, tm_f, model, params, rays_o, rays_d


def test_teacher_pixels_allclose_torch(teacher_pair):
    cfg, tm_c, tm_f, model, params, rays_o, rays_d = teacher_pair
    with torch.no_grad():
        want, want0 = _torch_render(tm_c, tm_f, torch.from_numpy(rays_o),
                                    torch.from_numpy(rays_d), cfg)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    res = render_rays(model, params["coarse"], params["fine"],
                      jnp.asarray(rays_o), jnp.asarray(rays_d),
                      jnp.asarray(viewdirs), None, cfg)
    np.testing.assert_allclose(np.asarray(res.rgb), want.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(res.rgb0), want0.numpy(), atol=2e-5)


def test_teacher_pixel_gradients_allclose_torch(teacher_pair):
    """d(sum of rendered pixels)/d(coarse params): torch autograd vs
    jax.grad through the full coarse+fine chain."""
    cfg, tm_c, tm_f, model, params, rays_o, rays_d = teacher_pair
    to, td = torch.from_numpy(rays_o), torch.from_numpy(rays_d)
    rgb, rgb0 = _torch_render(tm_c, tm_f, to, td, cfg)
    (rgb.sum() + rgb0.sum()).backward()

    def loss_fn(p):
        viewdirs = jnp.asarray(
            rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True))
        res = render_rays(model, p["coarse"], p["fine"],
                          jnp.asarray(rays_o), jnp.asarray(rays_d),
                          viewdirs, None, cfg)
        return jnp.sum(res.rgb) + jnp.sum(res.rgb0)

    grads = jax.grad(loss_fn)(params)

    # compare a representative set of coarse/fine leaves
    for which, tm in (("coarse", tm_c), ("fine", tm_f)):
        tg = {k: v.grad.numpy() for k, v in tm.named_parameters()}
        for ours, theirs in [("pts_0", "pts_linears.0"), ("rgb", "rgb_linear"),
                             ("alpha", "alpha_linear")]:
            got_k = np.asarray(grads[which][ours]["kernel"])
            want_k = tg[f"{theirs}.weight"].T
            # f32 reduction-order differences across frameworks make the
            # worst-case leaf grads land within ~1e-3 of each other
            np.testing.assert_allclose(got_k, want_k, atol=1.5e-3,
                                       err_msg=f"{which}/{ours} kernel grad")
            got_b = np.asarray(grads[which][ours]["bias"])
            np.testing.assert_allclose(got_b, tg[f"{theirs}.bias"],
                                       atol=1.5e-3,
                                       err_msg=f"{which}/{ours} bias grad")


def test_r2l_pixels_and_gradients_allclose_torch(rng):
    n_sample, L = 4, 10
    input_dim = n_sample * 3 * (2 * L + 1)
    D, W = 6, 32
    torch.manual_seed(0)
    tm = TorchR2L(input_dim, D, W, n_block=(D - 2) // 2)
    params = r2l_params_from_state_dict(tm.state_dict(), n_block=(D - 2) // 2)
    model = R2LNet(input_dim=input_dim, depth=D, width=W)

    N = 32
    rays_o = rng.normal(size=(N, 3)).astype(np.float32)
    rays_d = rng.normal(size=(N, 3)).astype(np.float32)

    # torch forward: fixed linspace z, flatten, PE layout (sin,cos,id)
    to, td = torch.from_numpy(rays_o), torch.from_numpy(rays_d)
    t = torch.linspace(0, 1, n_sample)
    z = 2.0 * (1 - t) + 6.0 * t
    pts = (to[:, None, :] + td[:, None, :] * z[:, None]).reshape(N, -1)
    freqs = 2.0 ** torch.arange(L)
    y = pts[..., None] * freqs
    emb = torch.cat([torch.sin(y), torch.cos(y), pts[..., None]], -1)
    emb = emb.reshape(N, -1)
    want = tm(emb)
    want.sum().backward()

    got = r2l_forward_rays(model, params, jnp.asarray(rays_o),
                           jnp.asarray(rays_d), 2.0, 6.0, n_sample, L,
                           allow_fused=False)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=2e-5)

    grads = jax.grad(lambda p: jnp.sum(r2l_forward_rays(
        model, p, jnp.asarray(rays_o), jnp.asarray(rays_d), 2.0, 6.0,
        n_sample, L, allow_fused=False)))(params)
    tg = {k: v.grad.numpy() for k, v in tm.named_parameters()}
    np.testing.assert_allclose(np.asarray(grads["head"]["kernel"]),
                               tg["head.0.weight"].T, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads["tail"]["kernel"]),
                               tg["tail.0.weight"].T, atol=1e-4)
    # stacked scan-body gradient vs per-block torch grads
    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(grads["body"]["lin_0"]["kernel"])[b],
            tg[f"body.{b}.body.0.weight"].T, atol=1e-4)
