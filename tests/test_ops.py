"""Fused-op tests: linearized embedding golden vs core path; megakernel in
interpreter mode vs the flax forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_nerf_tpu.core.encoding import ray_embed
from efficient_nerf_tpu.core.ray_sampler import sample_ray_points
from efficient_nerf_tpu.models import R2LNet
from efficient_nerf_tpu.ops import ray_points_embed


def test_linearized_embed_matches_core(rng):
    B, n_sample, L = 13, 6, 10
    o = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    want = ray_embed(sample_ray_points(o, d, 2.0, 6.0, n_sample), L)
    got = ray_points_embed(o, d, 2.0, 6.0, n_sample, L)
    # The highest-frequency components evaluate sin/cos at ~3e3 rad where an
    # f32 ulp of the argument is ~2.4e-4 rad; the two (mathematically equal)
    # formulations may differ by a few ulps there.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_linearized_embed_perturb_path(rng):
    B, n_sample, L = 7, 4, 4
    o = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    got = ray_points_embed(o, d, 2.0, 6.0, n_sample, L, key=key, perturb=True)
    want = ray_embed(
        sample_ray_points(o, d, 2.0, 6.0, n_sample, key=key, perturb=True), L)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("use_global_residual", [False, True])
def test_megakernel_interpret_matches_flax(use_global_residual, rng):
    """Pallas megakernel (interpret mode, f32) vs the reference flax forward,
    for both the exact per-column trig embed and the double-angle recurrence
    embed (fast_embed, the production default)."""
    from efficient_nerf_tpu.ops.pallas.r2l_forward import r2l_forward_fused

    n_sample, L, depth, width = 4, 10, 6, 128
    input_dim = n_sample * 3 * (2 * L + 1)
    model = R2LNet(input_dim=input_dim, depth=depth, width=width,
                   use_residual=use_global_residual)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, input_dim)))["params"]

    B = 40  # non-multiple of tile to exercise padding
    o = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))

    x = ray_embed(sample_ray_points(o, d, 2.0, 6.0, n_sample), L)
    want = model.apply({"params": params}, x)

    for fast in (False, True):
        got = r2l_forward_fused(params, o, d, 2.0, 6.0, n_sample, L,
                                tile_b=16, dtype=jnp.float32, interpret=True,
                                use_global_residual=use_global_residual,
                                fast_embed=fast)
        assert got.shape == (B, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, err_msg=f"fast_embed={fast}")


def test_teacher_megakernel_interpret_matches_flax(rng):
    """Pallas teacher kernel (interpret mode, f32) vs the flax NeRFMLP."""
    from efficient_nerf_tpu.core.encoding import nerf_embed
    from efficient_nerf_tpu.models import NeRFMLP
    from efficient_nerf_tpu.ops.pallas.nerf_forward import nerf_forward_fused

    L, Lv = 10, 4
    model = NeRFMLP()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 90)))["params"]

    N, S = 7, 5  # 35 points: non-multiple of tile to exercise padding
    pts = jnp.asarray(rng.normal(size=(N, S, 3)).astype(np.float32))
    vd = rng.normal(size=(N, 3)).astype(np.float32)
    vd = jnp.asarray(vd / np.linalg.norm(vd, axis=-1, keepdims=True))

    emb = nerf_embed(pts, L)
    de = jnp.broadcast_to(nerf_embed(vd, Lv)[:, None, :], (N, S, 27))
    want = model.apply({"params": params}, jnp.concatenate([emb, de], -1))

    got = nerf_forward_fused(params, pts, vd, L, Lv,
                             tile_p=16, dtype=jnp.float32, interpret=True)
    assert got.shape == (N, S, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)

    # channel-major interface: pts [3, N, S] in, raw [4, N, S] out —
    # identical numbers, no boundary transposes (the production eval path,
    # renderer._query_composite_cm)
    got_cm = nerf_forward_fused(params, jnp.moveaxis(pts, -1, 0), vd, L, Lv,
                                tile_p=16, dtype=jnp.float32, interpret=True,
                                cm=True)
    assert got_cm.shape == (4, N, S)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(got_cm, 0, -1)),
                               np.asarray(got), atol=1e-6)


def test_sample_pdf_fused_matches_core(rng):
    """Fused det inverse-CDF kernel (interpret) vs core.sampling.sample_pdf,
    including degenerate rows (all-zero weights, single spike)."""
    from efficient_nerf_tpu.core.sampling import sample_pdf
    from efficient_nerf_tpu.ops.pallas.sample_pdf import sample_pdf_det_fused

    N, C, S = 37, 63, 128
    bins = jnp.asarray(np.sort(
        rng.uniform(2.0, 6.0, size=(N, C)).astype(np.float32), -1))
    w = jnp.asarray(rng.uniform(size=(N, C - 1)).astype(np.float32))
    w = w.at[0].set(0.0).at[1].set(jnp.zeros(C - 1).at[5].set(100.0))
    want = np.asarray(sample_pdf(None, bins, w, S, det=True))
    got = np.asarray(sample_pdf_det_fused(bins, w, S, tile_n=16,
                                          interpret=True))
    # levels below the top match the core formulation up to cumsum
    # association (the kernel accumulates the CDF sequentially; jnp.cumsum
    # is a parallel prefix — ~1e-7 boundary shifts amplify to ~1e-5 in z);
    # the top level u == 1.0 is pinned to the top bin edge (core/reference
    # leave it rounding-ambiguous on degenerate CDFs — see the kernel
    # docstring)
    np.testing.assert_allclose(got[:, :-1], want[:, :-1], atol=5e-5)
    np.testing.assert_allclose(got[:, -1], np.asarray(bins)[:, -1], atol=1e-6)
    # the masked-reduce interval loop (use_roll=False) is numerically
    # identical iteration by iteration — exact match against the roll form
    got_nr = np.asarray(sample_pdf_det_fused(bins, w, S, tile_n=16,
                                             use_roll=False, interpret=True))
    np.testing.assert_array_equal(got_nr, got)


def test_raw2outputs_cm_matches_row_major(rng):
    """Channel-major composite twin vs raw2outputs on the same raw field."""
    from efficient_nerf_tpu.core.volume import raw2outputs, raw2outputs_cm

    N, S = 11, 9
    raw = jnp.asarray(rng.normal(size=(N, S, 4)).astype(np.float32))
    z = jnp.sort(jnp.asarray(
        rng.uniform(2.0, 6.0, size=(N, S)).astype(np.float32)), axis=-1)
    d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(N, S)).astype(np.float32))

    for wb, std in ((False, 0.0), (True, 0.7)):
        want = raw2outputs(raw, z, d, std, wb, noise=noise)
        got = raw2outputs_cm(jnp.moveaxis(raw, -1, 0), z, d, std, wb,
                             noise=noise)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("grs,res_scale", [(False, 1.0), (True, 0.5)])
def test_train_vjp_interpret_matches_jax_grad(grs, res_scale, rng):
    """Fused training custom-VJP (interpret mode, f32) vs jax.grad through
    the flax apply: forward pixels, every weight/bias gradient, and dx."""
    from efficient_nerf_tpu.ops.pallas.r2l_train import r2l_train_apply

    in_dim, depth, width = 84, 10, 32
    model = R2LNet(input_dim=in_dim, depth=depth, width=width,
                   res_scale=res_scale, use_residual=grs, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, in_dim)))["params"]
    # 37 rays: exercises the ragged final tile (tile_b=16)
    x = jnp.asarray(rng.normal(size=(37, in_dim)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(37, 3)).astype(np.float32))

    out_ref = model.apply({"params": params}, x)
    out_f = r2l_train_apply(params, x, res_scale=res_scale,
                            use_global_residual=grs, tile_b=16,
                            dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               atol=1e-5)

    def loss_ref(p, xx):
        return jnp.mean((model.apply({"params": p}, xx) - t) ** 2)

    def loss_f(p, xx):
        o = r2l_train_apply(p, xx, res_scale=res_scale,
                            use_global_residual=grs, tile_b=16,
                            dtype=jnp.float32, interpret=True)
        return jnp.mean((o - t) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_f = jax.grad(loss_f, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_f)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5 * scale)


def test_train_step_fused_flag_gates(rng):
    """fused=None auto-resolves to False on CPU; fused=True on an
    ineligible profile raises."""
    import optax

    from efficient_nerf_tpu.train import make_r2l_train_step

    model = R2LNet(input_dim=84, depth=6, width=16, dtype=jnp.float32)
    step = make_r2l_train_step(model, optax.adam(1e-3), near=2.0, far=6.0,
                               n_sample=4, L=1, jit=False)  # auto -> XLA path
    bad = R2LNet(input_dim=84, depth=6, width=16, linear_tail=True)
    with pytest.raises(ValueError):
        make_r2l_train_step(bad, optax.adam(1e-3), near=2.0, far=6.0,
                            n_sample=4, L=1, fused=True, jit=False)
    del step


def test_int8_kernel_matches_jnp_twin(rng):
    """Int8 megakernel (interpret) vs the pure-jnp quantization twin: same
    math when the batch is one tile. Not bit-exact: the head matmul's
    1008-long contraction associates differently (feature-major dot_general
    vs row-major @), and a 1-ulp difference in the f32 row-max reduce flips
    the DYNAMIC per-row scale — one int8 level across that row (~1e-2 after
    dequant through 9 blocks); tolerance covers a few such flips. The
    static-scale path (no data-dependent scales) is held to bitwise
    interleave parity in test_int8_static_scales_interleave_parity."""
    from efficient_nerf_tpu.ops.pallas.r2l_int8 import (r2l_forward_int8,
                                                        r2l_forward_int8_ref)

    in_dim, n_sample, L = 16 * 3 * 21, 16, 10
    model = R2LNet(input_dim=in_dim, depth=10, width=32, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, in_dim)))["params"]
    o = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    got = r2l_forward_int8(params, o, d, 2.0, 6.0, n_sample, L, tile_b=32,
                           head_dtype=jnp.float32, interpret=True)
    want = r2l_forward_int8_ref(params, o, d, 2.0, 6.0, n_sample, L)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1.5e-2)


def test_int8_static_scales_interleave_parity(rng):
    """Static-calibrated int8 kernel: interleave=2 is bitwise identical to
    interleave=1 (independent row chains, same math), and both match the
    jnp twin with the same act_scales."""
    from efficient_nerf_tpu.ops.pallas.r2l_int8 import (
        calibrate_r2l_int8, r2l_forward_int8, r2l_forward_int8_ref)

    in_dim, n_sample, L = 16 * 3 * 21, 16, 10
    model = R2LNet(input_dim=in_dim, depth=10, width=32, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, in_dim)))["params"]
    o = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    scales = calibrate_r2l_int8(params, o, d, 2.0, 6.0, n_sample, L)
    kw = dict(tile_b=32, head_dtype=jnp.float32, act_scales=scales,
              interpret=True)
    got2 = r2l_forward_int8(params, o, d, 2.0, 6.0, n_sample, L,
                            interleave=2, **kw)
    got1 = r2l_forward_int8(params, o, d, 2.0, 6.0, n_sample, L,
                            interleave=1, **kw)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(got1))
    # vs twin: the kernel's channel-major embed associates the o/d matmuls
    # differently (ulp), which can flip round() ties -> one int8 level
    # (~6e-3 after dequant); tolerance covers a few such flips.
    want = r2l_forward_int8_ref(params, o, d, 2.0, 6.0, n_sample, L,
                                act_scales=scales)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), atol=1e-2)


def test_int8_quantization_error_bounded(rng):
    """W8A8 body quantization stays close to the f32 forward on random
    weights (post-sigmoid outputs; per-channel + dynamic scales)."""
    from efficient_nerf_tpu.ops.pallas.r2l_int8 import r2l_forward_int8_ref

    in_dim, n_sample, L = 16 * 3 * 21, 16, 10
    model = R2LNet(input_dim=in_dim, depth=22, width=64, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, in_dim)))["params"]
    o = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    q = r2l_forward_int8_ref(params, o, d, 2.0, 6.0, n_sample, L)
    f = model.apply({"params": params},
                    __import__("efficient_nerf_tpu.ops", fromlist=["ops"])
                    .ray_points_embed(o, d, 2.0, 6.0, n_sample, L))
    diff = np.abs(np.asarray(q) - np.asarray(f))
    # random-init weights are a pathological case (sigmoid inputs near 0 =
    # max sensitivity); the trained-model PSNR gate lives in
    # tests/test_quality_e2e.py::test_streaming_distillation_matches_teacher
    assert diff.max() < 0.12 and diff.mean() < 0.012, (diff.max(), diff.mean())


def test_train_vjp_in_kernel_embed_matches_xla(rng):
    """embed_L mode: the train kernel embeds raw sample coords itself;
    forward + all grads (incl. d/d-coords through the encoding) match the
    XLA fast-embed + flax chain to fast-trig tolerance."""
    from efficient_nerf_tpu.core.encoding import ray_embed
    from efficient_nerf_tpu.ops.pallas.r2l_train import r2l_train_apply

    n_sample, L = 4, 10
    K = n_sample * 3
    in_dim = K * (2 * L + 1)
    model = R2LNet(input_dim=in_dim, depth=10, width=32, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, in_dim)))["params"]
    pts = jnp.asarray(rng.normal(size=(37, K)).astype(np.float32)) * 3.0
    t = jnp.asarray(rng.uniform(size=(37, 3)).astype(np.float32))

    out_ref = model.apply({"params": params}, ray_embed(pts, L, fast=True))
    out_f = r2l_train_apply(params, pts, tile_b=16, dtype=jnp.float32,
                            embed_L=L, interpret=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               atol=2e-4)

    def loss_ref(p, c):
        x = ray_embed(c, L, fast=True)
        return jnp.mean((model.apply({"params": p}, x) - t) ** 2)

    def loss_f(p, c):
        o = r2l_train_apply(p, c, tile_b=16, dtype=jnp.float32, embed_L=L,
                            interpret=True)
        return jnp.mean((o - t) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, pts)
    g_f = jax.grad(loss_f, argnums=(0, 1))(params, pts)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_f)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4 * scale)


def test_teacher_ray_tile_block_alignment():
    # Mosaic (jax >= 0.9) rejects VMEM blocks whose sublane dim is not a
    # multiple of 8 or whose lane dim is not a multiple of 128 (unless equal
    # to the array dim). The teacher kernel's [3, r_t*S] points block and
    # [r_t, E] dirs block must therefore satisfy r_t % 8 == 0 and
    # (r_t * S) % 128 == 0 for every sample count the renderer produces
    # (coarse S=64, fine S=64+128=192, plus odd ablation values).
    from efficient_nerf_tpu.ops.pallas.nerf_forward import _ray_tile

    for S in (16, 32, 64, 96, 128, 191, 192, 256):
        for il in (1, 2, 4):
            r_t = _ray_tile(S, 4096, il)
            assert r_t % 8 == 0, (S, il, r_t)
            assert (r_t * S) % 128 == 0, (S, il, r_t)
            assert r_t % il == 0, (S, il, r_t)


@pytest.mark.parametrize("eval_chunks", [1, 2])
def test_nerf_frame_fused_matches_render_rays(eval_chunks, rng):
    """Whole-ray fused teacher renderer (interpret, f32) vs the XLA
    render_rays eval path: every RenderResult field, including matching
    NaN masks on disp (0/0 for empty rays under random init)."""
    from efficient_nerf_tpu.models import NeRFMLP
    from efficient_nerf_tpu.ops.pallas.nerf_frame import nerf_render_rays_fused
    from efficient_nerf_tpu.render.renderer import RenderConfig, render_rays

    L, Lv, N, Sc, Sf = 4, 2, 13, 16, 32
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
                       fused_teacher=False)
    want = render_rays(model, params, None, o, d, vd, None, cfg)
    got = nerf_render_rays_fused(params, None, o, d, vd, 2.0, 6.0, Sc, Sf,
                                 L, Lv, skip=1, white_bkgd=True,
                                 dtype=jnp.float32, tile_r=8,
                                 eval_chunks=eval_chunks, interpret=True)
    for name, a, b in zip(want._fields, want, got):
        a, b = np.asarray(a), np.asarray(b)
        nan = np.isnan(a)
        assert np.array_equal(nan, np.isnan(b)), name
        np.testing.assert_allclose(np.where(nan, 0, b), np.where(nan, 0, a),
                                   atol=2e-5, err_msg=name)


def test_nerf_int8_kernel_matches_jnp_twin(rng):
    """Int8 teacher field-eval kernel (ops/pallas/nerf_int8.py) in interpret
    mode vs the pure-jnp twin (the production off-TPU fallback), both
    interfaces, plus the dispatch error for missing scales."""
    import pytest

    from efficient_nerf_tpu.models import NeRFMLP
    from efficient_nerf_tpu.ops.pallas.nerf_int8 import (
        calibrate_nerf_int8, nerf_forward_int8, nerf_forward_int8_ref)

    model = NeRFMLP(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 90)))["params"]
    N, S = 9, 24
    pts = jnp.asarray(rng.normal(size=(N, S, 3)).astype(np.float32)) * 1.5
    dirs = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    scales = calibrate_nerf_int8(params, pts.reshape(-1, 3)[:128], 10,
                                 skip=4)
    assert scales.shape == (8,) and bool(jnp.all(scales > 0))

    kern = nerf_forward_int8(params, pts, dirs, act_scales=scales,
                             dtype=jnp.float32, interpret=True)
    ref = nerf_forward_int8_ref(params, pts, dirs, act_scales=scales,
                                dtype=jnp.float32)
    # both run identical quantization math; residual diff is the embed's
    # matmul-vs-elementwise ulps crossing an int8 rounding boundary
    np.testing.assert_allclose(np.asarray(kern), np.asarray(ref), atol=2e-2)

    pts_cm = jnp.moveaxis(pts, -1, 0)
    kern_cm = nerf_forward_int8(params, pts_cm, dirs, act_scales=scales,
                                dtype=jnp.float32, interpret=True, cm=True)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(kern_cm, 0, -1)),
                               np.asarray(kern), atol=0.0)
    ref_cm = nerf_forward_int8_ref(params, pts_cm, dirs, act_scales=scales,
                                   dtype=jnp.float32, cm=True)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(ref_cm, 0, -1)),
                               np.asarray(ref), atol=0.0)

    with pytest.raises(ValueError):
        nerf_forward_int8(params, pts, dirs, act_scales=None,
                          dtype=jnp.float32, interpret=True)


def test_nerf_int8_quantization_error_bounded(rng):
    """Int8 teacher raw outputs stay close to the f32 field on realistic
    point magnitudes (the e2e PSNR gate lives in test_quality_e2e)."""
    from efficient_nerf_tpu.models import NeRFMLP
    from efficient_nerf_tpu.ops.pallas.nerf_forward import nerf_forward_fused
    from efficient_nerf_tpu.ops.pallas.nerf_int8 import (
        calibrate_nerf_int8, nerf_forward_int8_ref)

    model = NeRFMLP(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 90)))["params"]
    N, S = 64, 16
    pts = jnp.asarray(rng.normal(size=(N, S, 3)).astype(np.float32)) * 2.0
    dirs = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    scales = calibrate_nerf_int8(params, pts.reshape(-1, 3)[:512], 10,
                                 skip=4)
    q = nerf_forward_int8_ref(params, pts, dirs, act_scales=scales,
                              dtype=jnp.float32)
    f = nerf_forward_fused(params, pts, dirs, dtype=jnp.float32,
                           interpret=True)
    err = np.abs(np.asarray(q) - np.asarray(f))
    assert err.mean() < 0.02 and err.max() < 0.2, (err.mean(), err.max())
