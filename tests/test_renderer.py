"""End-to-end renderer tests (composition of the individually-golden pieces)."""
import jax
import jax.numpy as jnp
import numpy as np

from efficient_nerf_tpu.core import nerf_embed, raw2outputs, sample_pdf
from efficient_nerf_tpu.core.sampling import linear_zvals
from efficient_nerf_tpu.models import NeRFMLP, R2LNet
from efficient_nerf_tpu.render import (RenderConfig, make_r2l_forward,
                                       r2l_render_image, render_image,
                                       render_rays)


def _setup(use_viewdirs=True, n_importance=4):
    cfg = RenderConfig(n_samples=5, n_importance=n_importance, perturb=False,
                       use_viewdirs=use_viewdirs, near=2.0, far=6.0,
                       white_bkgd=False, chunk=16)
    ic = 63
    icv = 27 if use_viewdirs else 0
    model = NeRFMLP(depth=2, width=16, input_ch=ic, input_ch_views=icv,
                    use_viewdirs=use_viewdirs)
    p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, ic + icv)))["params"]
    return model, p, cfg


def test_render_rays_matches_manual_composition(rng):
    """Deterministic render must equal manually chaining the golden pieces."""
    model, p, cfg = _setup(use_viewdirs=False, n_importance=0)
    N = 8
    rays_o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))

    res = render_rays(model, p, None, rays_o, rays_d, None, None, cfg)

    z = jnp.broadcast_to(linear_zvals(2.0, 6.0, cfg.n_samples), (N, cfg.n_samples))
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    raw = model.apply({"params": p},
                      nerf_embed(pts, 10, fast=cfg.fast_embed))
    manual = raw2outputs(raw, z, rays_d)
    np.testing.assert_allclose(np.asarray(res.rgb), np.asarray(manual.rgb),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.depth), np.asarray(manual.depth),
                               atol=1e-5)


def test_render_rays_fine_pass_deterministic(rng):
    """With perturb=False the fine pass is det sample_pdf; verify the full
    coarse+fine chain manually."""
    model, p, cfg = _setup(use_viewdirs=True, n_importance=4)
    N = 4
    rays_o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    res = render_rays(model, p, p, rays_o, rays_d, viewdirs, None, cfg)

    z = jnp.broadcast_to(linear_zvals(2.0, 6.0, cfg.n_samples), (N, cfg.n_samples))

    def query(pts):
        emb = nerf_embed(pts, 10, fast=cfg.fast_embed)
        d = jnp.broadcast_to(
            nerf_embed(viewdirs, 4, fast=cfg.fast_embed)[:, None, :],
                             pts.shape[:-1] + (27,))
        return model.apply({"params": p}, jnp.concatenate([emb, d], -1))

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    coarse = raw2outputs(query(pts), z, rays_d)
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
    z_samp = sample_pdf(None, z_mid, coarse.weights[:, 1:-1], 4, det=True)
    z_all = jnp.sort(jnp.concatenate([z, z_samp], -1), -1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]
    fine = raw2outputs(query(pts), z_all, rays_d)

    np.testing.assert_allclose(np.asarray(res.rgb), np.asarray(fine.rgb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.rgb0), np.asarray(coarse.rgb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.z_std),
                               np.asarray(jnp.std(z_samp, axis=-1)), atol=1e-6)


def test_render_image_chunking_invariance():
    """Chunk size must not change the image."""
    model, p, cfg = _setup(use_viewdirs=True)
    from efficient_nerf_tpu.core.poses import pose_spherical
    c2w = jnp.asarray(pose_spherical(10.0, -20.0, 4.0)[:3, :4])
    img_small = render_image(model, p, p, 6, 5, 7.0, c2w, cfg)
    import dataclasses
    cfg_big = dataclasses.replace(cfg, chunk=1024)
    img_big = render_image(model, p, p, 6, 5, 7.0, c2w, cfg_big)
    np.testing.assert_allclose(np.asarray(img_small.rgb),
                               np.asarray(img_big.rgb), atol=1e-6)
    assert img_small.rgb.shape == (6, 5, 3)


def test_r2l_image_chunking_invariance():
    model = R2LNet(input_dim=4 * 3 * 21, depth=4, width=16)
    p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4 * 3 * 21)))["params"]
    from efficient_nerf_tpu.core.poses import pose_spherical
    c2w = jnp.asarray(pose_spherical(0.0, -30.0, 4.0)[:3, :4])
    a = r2l_render_image(model, p, c2w, 5, 7, 6.0, 2.0, 6.0, 4)
    b = r2l_render_image(model, p, c2w, 5, 7, 6.0, 2.0, 6.0, 4, chunk=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # jitted ray forward agrees with the image path
    fwd = make_r2l_forward(model, 2.0, 6.0, 4)
    from efficient_nerf_tpu.core.rays import get_rays
    o, d = get_rays(5, 7, 6.0, c2w)
    rgb = fwd(p, o.reshape(-1, 3), d.reshape(-1, 3))
    np.testing.assert_allclose(np.asarray(rgb).reshape(5, 7, 3),
                               np.asarray(a), atol=1e-4)


def test_render_rays_dispatches_frame_kernel(rng, monkeypatch):
    """render_rays routes the deterministic eval profile to the whole-ray
    megakernel (interpret mode on CPU) and matches the XLA path; hook/
    perturb/near-override profiles stay on the XLA path."""
    from efficient_nerf_tpu.render import renderer as R

    L, Lv, N, Sc, Sf = 4, 2, 11, 16, 32
    model = NeRFMLP(depth=4, width=32, skips=(1,), input_ch=3 * (2 * L + 1),
                    input_ch_views=3 * (2 * Lv + 1), dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3 * (2 * L + 1) + 3 * (2 * Lv + 1))))["params"]
    o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    d = jnp.asarray((rng.normal(size=(N, 3)) * 0.3
                     + np.array([0, 0, -1.0])).astype(np.float32))
    vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    cfg = RenderConfig(n_samples=Sc, n_importance=Sf, perturb=False,
                       white_bkgd=True, multires=L, multires_views=Lv,
                       near=2.0, far=6.0, fast_embed=False,
                       fused_teacher=True, frame_fused=True, frame_tile_r=8)
    assert not R._frame_fused_eligible(model, cfg, None, None, None, None,
                                       None)  # no TPU, interpret off
    monkeypatch.setattr(R, "_FRAME_INTERPRET", True)
    assert R._frame_fused_eligible(model, cfg, None, None, None, None, None)
    # negatives: perturb, noise hook, near override, n_importance=0
    assert not R._frame_fused_eligible(
        model, dataclasses_replace(cfg, perturb=True),
        None, None, None, None, None)
    assert not R._frame_fused_eligible(model, cfg, 2.5, None, None, None,
                                       None)
    assert not R._frame_fused_eligible(model, cfg, None, None, None, None,
                                       jnp.zeros((N, Sc)))
    assert not R._frame_fused_eligible(
        model, dataclasses_replace(cfg, n_importance=0),
        None, None, None, None, None)

    got = render_rays(model, params, None, o, d, vd, None, cfg)
    want = render_rays(model, params, None, o, d, vd, None,
                       dataclasses_replace(cfg, frame_fused=False))
    for name, a, b in zip(want._fields, want, got):
        a, b = np.asarray(a), np.asarray(b)
        nan = np.isnan(a)
        assert np.array_equal(nan, np.isnan(b)), name
        np.testing.assert_allclose(np.where(nan, 0, b), np.where(nan, 0, a),
                                   atol=2e-4, err_msg=name)


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)
