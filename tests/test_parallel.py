"""Sharding tests on the virtual 8-device CPU mesh (see conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from efficient_nerf_tpu.models import R2LNet, NeRFMLP
from efficient_nerf_tpu.parallel import (host_subset, make_mesh, shard_batch,
                                         shard_params_tp,
                                         make_sharded_r2l_train_step,
                                         make_sharded_teacher_train_step)
from efficient_nerf_tpu.parallel.train import replicate_state
from efficient_nerf_tpu.render import RenderConfig
from efficient_nerf_tpu.train import (hard_pool_init, init_train_state,
                                      make_r2l_train_step)


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


def _r2l_setup(n_sample=4, width=16, depth=4):
    model = R2LNet(input_dim=n_sample * 3 * 21, depth=depth, width=width)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, n_sample * 3 * 21)))["params"]
    opt = optax.adam(1e-3)
    return model, params, opt


def test_sharded_r2l_step_matches_single_device(rng):
    n_sample = 4
    model, params, opt = _r2l_setup(n_sample)
    mesh = make_mesh(n_data=8)

    B = 64
    o = rng.normal(size=(B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    t = rng.uniform(size=(B, 3)).astype(np.float32)
    key = jax.random.PRNGKey(1)

    # single-device
    step1 = make_r2l_train_step(model, opt, near=2.0, far=6.0,
                                n_sample=n_sample, perturb=False, donate=False)
    s1 = init_train_state(params, opt)
    pool1 = hard_pool_init(4)
    s1, _, m1 = step1(s1, pool1, key, jnp.asarray(o), jnp.asarray(d),
                      jnp.asarray(t))

    # 8-way data parallel
    stepN = make_sharded_r2l_train_step(model, opt, mesh, near=2.0, far=6.0,
                                        n_sample=n_sample, perturb=False)
    sN, poolN = replicate_state(mesh, init_train_state(params, opt),
                                hard_pool_init(4))
    ob, db, tb = shard_batch(mesh, o, d, t)
    sN, _, mN = stepN(sN, poolN, key, ob, db, tb)

    np.testing.assert_allclose(float(m1["loss_rgb"]), float(mN["loss_rgb"]),
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=2e-5),
        s1.params, jax.device_get(sN.params))


def test_sharded_r2l_with_hard_mining_and_tp(rng):
    """2x4 mesh: data parallel x tensor parallel, with the hard pool."""
    n_sample = 4
    model, params, opt = _r2l_setup(n_sample, width=16)
    mesh = make_mesh(n_data=4, n_model=2)
    params_tp = shard_params_tp(mesh, params)

    step = make_sharded_r2l_train_step(model, opt, mesh, near=2.0, far=6.0,
                                       n_sample=n_sample, hard=(8, 8))
    state = init_train_state(params_tp, opt)
    pool = replicate_state(mesh, hard_pool_init(64))
    B = 32
    o, d, t = (rng.normal(size=(B, 3)).astype(np.float32) for _ in range(3))
    ob, db, tb = shard_batch(mesh, o, d, t)
    for i in range(3):
        state, pool, m = step(state, pool, jax.random.PRNGKey(i), ob, db, tb)
    assert np.isfinite(float(m["loss_rgb"]))
    assert int(pool.count) == 24


def test_sharded_teacher_step(rng):
    cfg = RenderConfig(n_samples=4, n_importance=4, use_viewdirs=False,
                       perturb=False, near=2.0, far=6.0)
    model = NeRFMLP(depth=2, width=16, input_ch=63, input_ch_views=0,
                    use_viewdirs=False)
    p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)))["params"]
    p2 = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 63)))["params"]
    params = {"coarse": p, "fine": p2}
    opt = optax.adam(1e-3)
    mesh = make_mesh(n_data=8)
    step = make_sharded_teacher_train_step(model, opt, mesh, cfg)
    state = replicate_state(mesh, init_train_state(params, opt))
    B = 64
    o, d, t = (rng.normal(size=(B, 3)).astype(np.float32) for _ in range(3))
    ob, db, tb = shard_batch(mesh, o, d, t)
    state, m = step(state, jax.random.PRNGKey(0), ob, db, tb)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_host_subset_partition():
    files = [f"s{i}.npy" for i in range(10)]
    a = host_subset(files, 0, 2)
    b = host_subset(files, 1, 2)
    assert len(a) + len(b) == 10
    assert set(a).isdisjoint(b)


def test_sharded_r2l_forward_matches_single_device():
    """Data-parallel eval forward (shard_map over 'data') == the unsharded
    per-chip forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_nerf_tpu.models import R2LNet
    from efficient_nerf_tpu.parallel import make_mesh, make_sharded_r2l_forward, shard_batch
    from efficient_nerf_tpu.render.r2l_renderer import r2l_forward_rays

    n_sample, L = 4, 4
    in_dim = n_sample * 3 * (2 * L + 1)
    model = R2LNet(input_dim=in_dim, depth=6, width=32, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, in_dim)))["params"]
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))

    mesh = make_mesh(n_data=8)
    fn = make_sharded_r2l_forward(model, mesh, near=2.0, far=6.0,
                                  n_sample=n_sample, L=L)
    got = fn(params, *shard_batch(mesh, o, d))
    want = r2l_forward_rays(model, params, o, d, 2.0, 6.0, n_sample, L=L)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sharded_fused_step_matches_single_device(rng):
    """The fused Pallas train VJP shard_map'ed over 'data' (interpret mode
    on the virtual mesh) matches the single-device fused step AND the XLA
    step: multi-chip keeps the kernel, not the fallback."""
    n_sample = 4
    model, params, opt = _r2l_setup(n_sample)
    mesh = make_mesh(n_data=8)

    B = 64
    o = rng.normal(size=(B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    t = rng.uniform(size=(B, 3)).astype(np.float32)
    key = jax.random.PRNGKey(1)

    # single-device fused (interpret)
    step1 = make_r2l_train_step(model, opt, near=2.0, far=6.0,
                                n_sample=n_sample, perturb=False,
                                donate=False, fused=True, interpret=True)
    s1 = init_train_state(params, opt)
    s1, _, m1 = step1(s1, hard_pool_init(4), key, jnp.asarray(o),
                      jnp.asarray(d), jnp.asarray(t))

    # XLA single-device (the numeric reference)
    step0 = make_r2l_train_step(model, opt, near=2.0, far=6.0,
                                n_sample=n_sample, perturb=False,
                                donate=False, fused=False)
    s0 = init_train_state(params, opt)
    s0, _, m0 = step0(s0, hard_pool_init(4), key, jnp.asarray(o),
                      jnp.asarray(d), jnp.asarray(t))

    # 8-way data-parallel fused (shard_map + interpret)
    stepN = make_sharded_r2l_train_step(model, opt, mesh, near=2.0, far=6.0,
                                        n_sample=n_sample, perturb=False,
                                        fused=True, interpret=True)
    sN, poolN = replicate_state(mesh, init_train_state(params, opt),
                                hard_pool_init(4))
    ob, db, tb = shard_batch(mesh, o, d, t)
    sN, _, mN = stepN(sN, poolN, key, ob, db, tb)

    np.testing.assert_allclose(float(m1["loss_rgb"]), float(mN["loss_rgb"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m0["loss_rgb"]), float(mN["loss_rgb"]),
                               rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=2e-5),
        s1.params, jax.device_get(sN.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=2e-4),
        s0.params, jax.device_get(sN.params))


def test_tp_step_matches_single_device(rng):
    """Pure tensor parallelism (1x8 'model' mesh, paired col/row split):
    one step matches the single-device XLA step numerically."""
    n_sample = 4
    model, params, opt = _r2l_setup(n_sample, width=16)
    mesh = make_mesh(n_data=1, n_model=8)

    B = 16
    o = rng.normal(size=(B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    t = rng.uniform(size=(B, 3)).astype(np.float32)
    key = jax.random.PRNGKey(1)

    step1 = make_r2l_train_step(model, opt, near=2.0, far=6.0,
                                n_sample=n_sample, perturb=False,
                                donate=False, fused=False)
    s1 = init_train_state(params, opt)
    s1, _, m1 = step1(s1, hard_pool_init(4), key, jnp.asarray(o),
                      jnp.asarray(d), jnp.asarray(t))

    params_tp = shard_params_tp(mesh, params)
    stepN = make_sharded_r2l_train_step(model, opt, mesh, near=2.0, far=6.0,
                                        n_sample=n_sample, perturb=False)
    sN = init_train_state(params_tp, opt)
    poolN = replicate_state(mesh, hard_pool_init(4))
    ob, db, tb = shard_batch(mesh, o, d, t)
    sN, _, mN = stepN(sN, poolN, key, ob, db, tb)

    np.testing.assert_allclose(float(m1["loss_rgb"]), float(mN["loss_rgb"]),
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=2e-5),
        s1.params, jax.device_get(sN.params))
