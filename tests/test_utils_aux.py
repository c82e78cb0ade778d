"""Auxiliary subsystem tests: profiling, debug, visualize, meters, given-rays
eval, origin translation, freeze_pretrained."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from efficient_nerf_tpu.utils import (AverageMeter, DeviceTimer, LossLine,
                                      Timer, assert_finite, compiled_cost,
                                      count_params, find_nonfinite,
                                      plot_pose_cloud, time_fn)


def test_logger_code_cache(tmp_path):
    """Logger snapshots the package source (smilelogging code-cache parity,
    reference main.py:22-33) honoring --cache_ignore substrings."""
    import argparse

    from efficient_nerf_tpu.utils.logging import Logger

    args = argparse.Namespace(project="cachetest", config=None,
                              cache_ignore="ops,data")
    logger = Logger(args, basedir=str(tmp_path))
    root = logger.code_cache_path
    assert os.path.exists(os.path.join(root, "utils", "logging.py"))
    assert os.path.exists(os.path.join(root, "models", "r2l.py"))
    assert not os.path.exists(os.path.join(root, "ops"))
    assert not os.path.exists(os.path.join(root, "data"))
    # segment-wise match: 'ops' must NOT drop files merely containing it
    assert os.path.exists(os.path.join(root, "config", "options.py"))
    # create_data.py contains 'data' as a substring but is not under data/
    assert os.path.exists(os.path.join(root, "create_data.py"))


def test_meters():
    m = AverageMeter("t", ":.2f")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and "t 3.00 (2.00)" == str(m)
    ll = LossLine()
    ll.update("psnr", 31.234, ".2f")
    ll.update("tag", "x")
    assert ll.format() == "psnr 31.23 tag x"
    t = Timer(10)
    assert isinstance(t(), str)
    assert count_params({"a": np.zeros((2, 3)), "b": np.zeros(5)}) == 11


def test_time_fn_and_device_timer():
    f = jax.jit(lambda x: x * 2.0)
    dt = time_fn(f, jnp.ones((8, 8)), reps=3, warmup=1)
    assert dt > 0
    timer = DeviceTimer()
    with timer.section("mul"):
        f(jnp.ones((4,)))
    s = timer.summary()
    assert "mul" in s and s["mul"][1] == 1


def test_compiled_cost_flops():
    a = jnp.ones((128, 64))
    b = jnp.ones((64, 32))
    cost = compiled_cost(lambda a, b: a @ b, a, b)
    if cost:  # cost analysis availability varies by backend
        assert cost.get("flops", 0) >= 2 * 128 * 64 * 32 * 0.9


def test_find_nonfinite():
    tree = {"ok": jnp.ones(3), "bad": jnp.asarray([1.0, np.nan])}
    bad = find_nonfinite(tree)
    assert len(bad) == 1 and "bad" in bad[0]
    assert_finite({"x": jnp.ones(2)})
    try:
        assert_finite(tree)
        assert False
    except FloatingPointError:
        pass


def test_visualize_3d(tmp_path):
    from efficient_nerf_tpu.core.poses import spherical_render_poses
    poses = spherical_render_poses(8)
    p = plot_pose_cloud(poses, str(tmp_path / "cloud.png"),
                        other_poses=poses[:4])
    assert os.path.exists(p)


def test_translate_origin_to_sphere(rng):
    from efficient_nerf_tpu.core.rays import translate_origin_to_sphere
    o = rng.normal(size=(32, 3)).astype(np.float32) * 5
    d = rng.normal(size=(32, 3)).astype(np.float32)
    o2 = np.asarray(translate_origin_to_sphere(jnp.asarray(o), jnp.asarray(d),
                                               radius=3.6))
    norms = np.linalg.norm(o2, axis=-1)
    # rays that geometrically intersect the sphere must land exactly on it
    u_ = d / np.linalg.norm(d, axis=-1, keepdims=True)
    b = np.einsum("nd,nd->n", o, u_)
    disc = b * b - np.sum(o * o, -1) + 3.6 ** 2
    hits = disc > 1e-3
    assert hits.any()
    np.testing.assert_allclose(norms[hits], 3.6, atol=1e-3)
    # moved along the ray direction
    u = d / np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.einsum("nd,nd->n", o2 - o, u)
    np.testing.assert_allclose(o2, o + t[:, None] * u, atol=1e-3)


def test_given_rays_eval(blender_dir, tmp_path):
    """DONeRF-style given-render-path rays through render_path."""
    from efficient_nerf_tpu.config.options import parse_args
    from efficient_nerf_tpu.evaluate import load_given_rays, render_path
    from efficient_nerf_tpu.factory import create_models
    from efficient_nerf_tpu.core.rays import get_rays_np
    from efficient_nerf_tpu.core.poses import pose_spherical

    H = W = 8
    o1, d1 = get_rays_np(H, W, 8.0, pose_spherical(0, -30, 4.0)[:3, :4])
    o2, d2 = get_rays_np(H, W, 8.0, pose_spherical(40, -30, 4.0)[:3, :4])
    gt = np.random.default_rng(0).uniform(size=(2, H, W, 3)).astype(np.float32)
    path = str(tmp_path / "rays.npz")
    np.savez(path, all_rays_o=np.stack([o1.reshape(-1, 3), o2.reshape(-1, 3)]),
             all_rays_d=np.stack([d1.reshape(-1, 3), d2.reshape(-1, 3)]),
             gt_imgs=gt)
    go, gd, ggt = load_given_rays(path)
    assert go.shape == (2, 64, 3) and ggt.shape == gt.shape

    args = parse_args(["--model_name", "R2L", "--n_sample_per_ray", "4",
                       "--netdepth", "4", "--netwidth", "16",
                       "--dataset_type", "blender"])
    bundle = create_models(args, 2.0, 6.0)
    out = render_path(bundle, [None, None], (H, W, 8.0), model_name="r2l",
                      n_sample_per_ray=4, gt_imgs=ggt, given_rays=(go, gd),
                      log=lambda *a: None)
    assert out["rgbs"].shape == (2, H, W, 3)
    assert np.isfinite(out["test_psnr"])


def test_freeze_pretrained_zero_updates(blender_dir):
    from efficient_nerf_tpu.config.options import parse_args
    from efficient_nerf_tpu.factory import create_models
    from efficient_nerf_tpu.train import (hard_pool_init, init_train_state,
                                          make_r2l_train_step)

    args = parse_args(["--model_name", "R2L", "--n_sample_per_ray", "4",
                       "--netdepth", "4", "--netwidth", "16",
                       "--freeze_pretrained", "--dataset_type", "blender"])
    bundle = create_models(args, 2.0, 6.0)
    step = make_r2l_train_step(bundle.model, bundle.optimizer, near=2.0,
                               far=6.0, n_sample=4, donate=False)
    state = init_train_state(bundle.params, bundle.optimizer)
    rng = np.random.default_rng(0)
    o, d, t = (jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
               for _ in range(3))
    new_state, _, _ = step(state, hard_pool_init(4), jax.random.PRNGKey(0),
                           o, d, t)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), state.params, new_state.params)
