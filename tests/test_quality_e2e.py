"""End-to-end quality gates on the procedural sphere scene.

The metric-based acceptance layer (SURVEY §4): a working pipeline must
actually FIT a 3D scene, not just run. Small budgets keep this CPU-friendly:
teacher reaches ~15+ dB on held-out views in ~500 iters; the streamed
student distills to within a few dB of its teacher.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from efficient_nerf_tpu.core.rays import get_rays_np, ndc_rays
from efficient_nerf_tpu.data.blender import composite_white, load_blender_data
from efficient_nerf_tpu.data.pseudo import StreamingPseudoGenerator
from efficient_nerf_tpu.data.synthetic import (make_forward_facing_scene,
                                               make_synthetic_scene)
from efficient_nerf_tpu.metrics import psnr
from efficient_nerf_tpu.models import NeRFMLP, R2LNet
from efficient_nerf_tpu.render import (RenderConfig, r2l_render_image,
                                       render_image)
from efficient_nerf_tpu.train import (hard_pool_init, init_train_state,
                                      make_r2l_train_step,
                                      make_teacher_train_step)


@pytest.fixture(scope="module")
def sphere_scene(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sphere"))
    make_synthetic_scene(out, n_train=16, n_val=1, n_test=2, H=40, W=40)
    data = load_blender_data(out, testskip=1)
    return data, composite_white(data.images, True)


@pytest.fixture(scope="module")
def trained_teacher(sphere_scene):
    data, imgs = sphere_scene
    H, W, focal = data.hwf
    i_train = data.splits[0]
    cfg = RenderConfig(n_samples=24, n_importance=24, perturb=True,
                       use_viewdirs=False, white_bkgd=True, near=2.0, far=6.0,
                       chunk=1600)
    model = NeRFMLP(depth=4, width=96, input_ch=63, input_ch_views=0,
                    use_viewdirs=False)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.zeros((1, 63)))["params"],
        "fine": model.init(jax.random.PRNGKey(1), jnp.zeros((1, 63)))["params"],
    }
    opt = optax.adam(5e-4)
    state = init_train_state(params, opt)
    step = make_teacher_train_step(model, opt, cfg, donate=False)
    rng = np.random.default_rng(0)
    ray_cache = {}
    for i in range(1, 501):
        img_i = int(rng.choice(i_train))
        if img_i not in ray_cache:
            ray_cache[img_i] = get_rays_np(H, W, focal,
                                           data.poses[img_i][:3, :4])
        ro, rd = ray_cache[img_i]
        sel = rng.choice(H * W, size=512, replace=False)
        state, m = step(state, jax.random.fold_in(key, i),
                        jnp.asarray(ro.reshape(-1, 3)[sel]),
                        jnp.asarray(rd.reshape(-1, 3)[sel]),
                        jnp.asarray(imgs[img_i].reshape(-1, 3)[sel]))
    return model, state.params, cfg


def test_teacher_fits_heldout_views(sphere_scene, trained_teacher):
    data, imgs = sphere_scene
    H, W, focal = data.hwf
    model, params, cfg = trained_teacher
    i_test = data.splits[2]
    psnrs = []
    for i in i_test:
        res = render_image(model, params["coarse"], params["fine"], H, W,
                           focal, jnp.asarray(data.poses[i][:3, :4]),
                           cfg.eval_mode())
        psnrs.append(float(psnr(res.rgb, jnp.asarray(imgs[i]))))
    assert np.mean(psnrs) > 14.0, psnrs  # random init sits around 5-8 dB


def test_ndc_teacher_fits_forward_facing_scene(tmp_path):
    """End-to-end LLFF/NDC gate: synthetic forward-facing scene -> LLFF
    loader (poses_bounds parsing, recenter, bd rescale) -> NDC ray
    parameterization (near plane 1.0, z in [0, 1]) -> teacher training ->
    held-out PSNR. Covers the second ray parameterization the blender gate
    does not (reference ndc_rays helpers.py:260-279, fern configs)."""
    from efficient_nerf_tpu.data.llff import load_llff_data

    out = str(tmp_path / "ff")
    make_forward_facing_scene(out, n_images=8, H=40, W=52)
    data = load_llff_data(out, factor=1, recenter=True, bd_factor=0.75,
                          spherify=False, n_pose_video=4)
    H, W, focal = (int(data.poses[0, 0, 4]), int(data.poses[0, 1, 4]),
                   float(data.poses[0, 2, 4]))
    i_test = 0
    i_train = [i for i in range(data.images.shape[0]) if i != i_test]

    cfg = RenderConfig(n_samples=32, n_importance=16, perturb=True,
                       use_viewdirs=False, white_bkgd=False, ndc=True,
                       near=0.0, far=1.0, chunk=1040)
    model = NeRFMLP(depth=4, width=96, input_ch=63, input_ch_views=0,
                    use_viewdirs=False)
    key = jax.random.PRNGKey(3)
    params = {
        "coarse": model.init(key, jnp.zeros((1, 63)))["params"],
        "fine": model.init(jax.random.PRNGKey(4),
                           jnp.zeros((1, 63)))["params"],
    }
    opt = optax.adam(5e-4)
    state = init_train_state(params, opt)
    step = make_teacher_train_step(model, opt, cfg, donate=False)
    rng = np.random.default_rng(0)
    ray_cache = {}
    for i in range(1, 501):
        img_i = int(rng.choice(i_train))
        if img_i not in ray_cache:
            ro, rd = get_rays_np(H, W, focal, data.poses[img_i][:3, :4])
            no, nd = ndc_rays(H, W, focal, 1.0,
                              jnp.asarray(ro.reshape(-1, 3)),
                              jnp.asarray(rd.reshape(-1, 3)))
            ray_cache[img_i] = (np.asarray(no), np.asarray(nd))
        no, nd = ray_cache[img_i]
        sel = rng.choice(H * W, size=512, replace=False)
        state, m = step(state, jax.random.fold_in(key, i),
                        jnp.asarray(no[sel]), jnp.asarray(nd[sel]),
                        jnp.asarray(
                            data.images[img_i].reshape(-1, 3)[sel]))

    res = render_image(model, state.params["coarse"], state.params["fine"],
                       H, W, focal, jnp.asarray(data.poses[i_test][:3, :4]),
                       cfg.eval_mode())
    p = float(psnr(res.rgb, jnp.asarray(data.images[i_test])))
    assert p > 16.0, f"NDC held-out psnr {p}"


def test_streaming_distillation_matches_teacher(sphere_scene, trained_teacher):
    data, imgs = sphere_scene
    H, W, focal = data.hwf
    teacher_model, teacher_params, cfg = trained_teacher

    n_sample, L = 8, 10
    student = R2LNet(input_dim=n_sample * 3 * (2 * L + 1), depth=6, width=64)
    key = jax.random.PRNGKey(7)
    sp = student.init(key, jnp.zeros((1, n_sample * 3 * 21)))["params"]
    opt = optax.adam(5e-4)
    state = init_train_state(sp, opt)
    pool = hard_pool_init(2048)
    step = make_r2l_train_step(student, opt, near=2.0, far=6.0,
                               n_sample=n_sample, hard=(128, 128),
                               donate=False)
    gen = StreamingPseudoGenerator(
        teacher_model, teacher_params["coarse"], teacher_params["fine"],
        cfg, H, W, focal, batch_rays=1024, buffer_rays=80_000,
        warmup_frames=6, frames_per_batch=0.2,
        rng=np.random.default_rng(0))
    for i in range(600):
        o, d, t = next(gen)
        state, pool, m = step(state, pool, jax.random.fold_in(key, i),
                              jnp.asarray(o), jnp.asarray(d), jnp.asarray(t))

    # student should reproduce the teacher's held-out rendering closely
    pose = jnp.asarray(data.poses[data.splits[2][0]][:3, :4])
    t_img = render_image(teacher_model, teacher_params["coarse"],
                         teacher_params["fine"], H, W, focal, pose,
                         cfg.eval_mode()).rgb
    s_img = r2l_render_image(student, state.params, pose, H, W, focal,
                             2.0, 6.0, n_sample)
    d_ts = float(psnr(jnp.asarray(s_img), t_img))
    assert d_ts > 18.0, f"student-vs-teacher psnr {d_ts}"
    # and therefore be decent against ground truth too
    gt = jnp.asarray(imgs[data.splits[2][0]])
    assert float(psnr(jnp.asarray(s_img), gt)) > 12.0

    # int8 serving path (W8A8 body, ops/pallas/r2l_int8.py): on the TRAINED
    # student the quantization must cost well under a dB vs the teacher —
    # in both scale modes (per-row dynamic, and the production
    # self-calibrated static)
    from efficient_nerf_tpu.core.rays import get_rays
    from efficient_nerf_tpu.ops.pallas.r2l_int8 import (calibrate_r2l_int8,
                                                        r2l_forward_int8_ref)

    o, d = get_rays(H, W, focal, pose)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    sc = calibrate_r2l_int8(state.params, o[:1024], d[:1024], 2.0, 6.0,
                            n_sample)
    for scales in (None, sc):
        q_img = r2l_forward_int8_ref(state.params, o, d, 2.0, 6.0, n_sample,
                                     act_scales=scales).reshape(H, W, 3)
        d_q = float(psnr(jnp.asarray(q_img), t_img))
        mode = "dynamic" if scales is None else "static"
        assert d_q > d_ts - 0.5, f"int8/{mode} psnr {d_q} vs bf16 {d_ts}"
