"""Training-subsystem tests: schedules, hard mining, train steps, ckpts."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from efficient_nerf_tpu.models import NeRFMLP, R2LNet
from efficient_nerf_tpu.render import RenderConfig
from efficient_nerf_tpu.train import (HardPool, TrainState, hard_pool_init,
                                      init_train_state, load_checkpoint,
                                      make_lr_schedule, make_r2l_train_step,
                                      make_teacher_train_step, parse_warmup,
                                      restore_train_state, save_checkpoint)


def test_lr_schedule_exp_decay():
    s = make_lr_schedule(5e-4, 250)
    np.testing.assert_allclose(float(s(0)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(250_000)), 5e-5, rtol=1e-5)
    np.testing.assert_allclose(float(s(500_000)), 5e-6, rtol=1e-5)


def test_lr_schedule_warmup():
    assert parse_warmup("") is None
    w = parse_warmup("0.0001,2000")
    s = make_lr_schedule(5e-4, 250, warmup=w)
    np.testing.assert_allclose(float(s(0)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(1000)), (5e-4 - 1e-4) / 2 + 1e-4, rtol=1e-5)
    # decay clock starts at warmup end
    np.testing.assert_allclose(float(s(2000)), 5e-4, rtol=1e-4)


def _make_batch(rng, B):
    rays_o = rng.normal(size=(B, 3)).astype(np.float32)
    rays_d = rng.normal(size=(B, 3)).astype(np.float32)
    target = rng.uniform(size=(B, 3)).astype(np.float32)
    return jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(target)


def test_r2l_train_step_learns(rng):
    model = R2LNet(input_dim=8 * 3 * 21, depth=6, width=32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8 * 3 * 21)))["params"]
    opt = optax.adam(1e-3)
    state = init_train_state(params, opt)
    step = make_r2l_train_step(model, opt, near=2.0, far=6.0, n_sample=8,
                               donate=False)
    pool = hard_pool_init(4)
    o, d, t = _make_batch(rng, 64)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        state, pool, m = step(state, pool, jax.random.fold_in(key, i), o, d, t)
        losses.append(float(m["loss_rgb"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    assert int(state.step) == 30
    assert np.isfinite(float(m["psnr"]))


def test_r2l_train_step_hard_mining(rng):
    B, n_in, n_out = 32, 8, 8
    model = R2LNet(input_dim=4 * 3 * 21, depth=4, width=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4 * 3 * 21)))["params"]
    opt = optax.adam(1e-3)
    state = init_train_state(params, opt)
    step = make_r2l_train_step(model, opt, near=2.0, far=6.0, n_sample=4,
                               hard=(n_in, n_out), donate=False)
    pool = hard_pool_init(B * 2)  # hard_mul = 2
    o, d, t = _make_batch(rng, B)
    key = jax.random.PRNGKey(2)
    for i in range(10):
        state, pool, m = step(state, pool, jax.random.fold_in(key, i), o, d, t)
    # pool fills by n_in per step until full
    assert int(pool.count) == min(10 * n_in, B * 2)
    # pool rows are real rays from the batch (match some original row)
    rows = np.asarray(pool.rays[: int(pool.count)])
    full = np.concatenate([np.asarray(o), np.asarray(d), np.asarray(t)], -1)
    for r in rows[:5]:
        assert (np.abs(full - r).sum(axis=-1) < 1e-5).any()


def test_hard_pool_replacement_when_full(rng):
    from efficient_nerf_tpu.train import pick_hard_rays, update_hard_pool

    P, D = 8, 9
    pool = HardPool(jnp.asarray(rng.normal(size=(P, D)).astype(np.float32)),
                    jnp.asarray(P, jnp.int32))
    batch = jnp.asarray(rng.normal(size=(16, D)).astype(np.float32))
    picked, idx_out = pick_hard_rays(pool, jax.random.PRNGKey(0), batch, 4)
    # picked rows come from the pool when full
    np.testing.assert_allclose(np.asarray(picked),
                               np.asarray(pool.rays)[np.asarray(idx_out)])
    mse = jnp.arange(16.0)
    new = update_hard_pool(pool, batch, mse, idx_out, 2, 16)
    # replaced rows are the 2 hardest batch rows (mse 15, 14)
    got = np.asarray(new.rays)[np.asarray(idx_out[:2])]
    want = np.asarray(batch)[np.array([15, 14])]
    np.testing.assert_allclose(np.sort(got, 0), np.sort(want, 0), atol=1e-6)
    assert int(new.count) == P


def test_teacher_train_step_learns(rng):
    cfg = RenderConfig(n_samples=8, n_importance=4, perturb=True,
                       use_viewdirs=False, near=2.0, far=6.0)
    model = NeRFMLP(depth=2, width=16, input_ch=63, input_ch_views=0,
                    use_viewdirs=False)
    key = jax.random.PRNGKey(0)
    p = model.init(key, jnp.zeros((1, 63)))["params"]
    params = {"coarse": p, "fine": p}
    opt = optax.adam(5e-3)
    state = init_train_state(params, opt)
    step = make_teacher_train_step(model, opt, cfg, donate=False)
    o, d, t = _make_batch(rng, 32)
    losses = []
    for i in range(20):
        state, m = step(state, jax.random.fold_in(key, i), o, d, t)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_teacher_step_applies_ndc_with_pre_ndc_viewdirs(rng):
    """cfg.ndc: the step takes RAW world rays, normalizes viewdirs from the
    PRE-NDC dirs, then projects o/d before sampling z in [0, 1] — the
    order the reference render() uses on every training call
    (main.py:148-162). The step's loss must equal that manual composition
    and differ from both wrong orderings (viewdirs from post-NDC dirs; no
    projection at all), so the test discriminates the round-4 defects."""
    from efficient_nerf_tpu.core.rays import get_rays_np, ndc_rays
    from efficient_nerf_tpu.render import render_rays

    H, W, focal = 10, 12, 14.0
    cfg = RenderConfig(n_samples=8, n_importance=4, perturb=False,
                       use_viewdirs=True, ndc=True, near=0.0, far=1.0,
                       multires=10, multires_views=4)
    model = NeRFMLP(depth=2, width=16, input_ch=63, input_ch_views=27,
                    use_viewdirs=True)
    key = jax.random.PRNGKey(5)
    p = model.init(key, jnp.zeros((1, 63 + 27)))["params"]
    params = {"coarse": p, "fine": p}
    opt = optax.adam(5e-3)
    state = init_train_state(params, opt)

    with pytest.raises(ValueError):
        make_teacher_train_step(model, opt, cfg, donate=False)  # no hwf

    step = make_teacher_train_step(model, opt, cfg, hwf=(H, W, focal),
                                   donate=False)
    c2w = np.concatenate([np.eye(3, dtype=np.float32),
                          np.array([[0.1], [0.2], [0.3]], np.float32)], 1)
    ro, rd = get_rays_np(H, W, focal, c2w)
    ro = jnp.asarray(ro.reshape(-1, 3)[:32])
    rd = jnp.asarray(rd.reshape(-1, 3)[:32])
    t = jnp.asarray(rng.uniform(size=(32, 3)).astype(np.float32))
    k = jax.random.PRNGKey(9)
    _, m = step(state, k, ro, rd, t)

    def manual_loss(o2, d2, viewdir_src):
        vd = viewdir_src / jnp.linalg.norm(viewdir_src, axis=-1,
                                           keepdims=True)
        res = render_rays(model, params["coarse"], params["fine"], o2, d2,
                          vd, k, cfg)
        return float(jnp.mean((res.rgb - t) ** 2)
                     + jnp.mean((res.rgb0 - t) ** 2))

    no2, nd2 = ndc_rays(H, W, focal, 1.0, ro, rd)
    correct = manual_loss(no2, nd2, rd)       # project, viewdirs pre-NDC
    wrong_post_ndc_vd = manual_loss(no2, nd2, nd2)
    wrong_unprojected = manual_loss(ro, rd, rd)
    np.testing.assert_allclose(float(m["loss"]), float(correct), rtol=1e-5)
    assert abs(float(correct) - wrong_post_ndc_vd) > 1e-6
    assert abs(float(correct) - wrong_unprojected) > 1e-6


def test_checkpoint_roundtrip(tmp_path, rng):
    model = R2LNet(input_dim=12, depth=4, width=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 12)))["params"]
    opt = optax.adam(make_lr_schedule(5e-4, 250))
    state = init_train_state(params, opt)
    state = state._replace(step=jnp.asarray(123, jnp.int32))

    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state.params, state.opt_state, step=123,
                    best_psnr=31.5, best_psnr_step=100,
                    model_config={"depth": 4})
    meta, params2, opt2 = load_checkpoint(path)
    assert meta["step"] == 123 and meta["best_psnr"] == 31.5
    assert meta["model_config"]["depth"] == 4

    # full restore into a fresh state
    fresh = init_train_state(
        model.init(jax.random.PRNGKey(9), jnp.zeros((1, 12)))["params"], opt)
    meta2, restored = restore_train_state(path, fresh)
    assert int(restored.step) == 123
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=0),
                 restored.params, state.params)


def test_import_reference_checkpoint_r2l(tmp_path):
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import TorchR2L

    tm = TorchR2L(input_dim=30, D=6, W=16, n_block=2)
    ckpt = {
        "global_step": 77,
        "best_psnr": 30.0,
        "network_fn_state_dict": tm.state_dict(),
        "network_fn": tm,  # whole-module pickle, reference quirk
    }
    path = str(tmp_path / "ref.tar")
    torch.save(ckpt, path)

    from efficient_nerf_tpu.train import import_reference_checkpoint
    meta, params = import_reference_checkpoint(path, "r2l", n_block=2)
    assert meta["step"] == 77
    model = R2LNet(input_dim=30, depth=6, width=16)
    x = jnp.ones((3, 30))
    got = np.asarray(model.apply({"params": params}, x))
    with torch.no_grad():
        want = tm(torch.ones(3, 30)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
