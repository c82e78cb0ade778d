"""End-to-end driver tests on a miniature scene (CPU, tiny shapes)."""
import json
import os

import numpy as np
import pytest

from efficient_nerf_tpu.config.options import parse_args, parse_config_file
from efficient_nerf_tpu.main import main, train
from efficient_nerf_tpu.utils.logging import Logger


def _base_args(blender_dir, tmp_path, extra=()):
    return parse_args([
        "--datadir", blender_dir,
        "--dataset_type", "blender",
        "--basedir", str(tmp_path / "logs"),
        "--expname", "minitest",
        "--white_bkgd", "--half_res", "False",
        "--N_samples", "4", "--N_importance", "4",
        "--netdepth", "2", "--netwidth", "16",
        "--netdepth_fine", "2", "--netwidth_fine", "16",
        "--N_rand", "32",
        "--chunk", "64",
        "--i_print", "2", "--i_testset", "4", "--i_video", "1000000",
        "--i_weights", "4",
        "--testskip", "1",
        "--n_pose_video", "2",
        *extra,
    ])


def test_option_parsing_and_config_file(tmp_path):
    cfg = tmp_path / "scene.txt"
    cfg.write_text("N_rand = 777\nuse_viewdirs = True # comment\n"
                   "datadir = ./data/x\n")
    args = parse_args(["--config", str(cfg), "--N_samples", "8"])
    assert args.N_rand == 777 and args.use_viewdirs is True
    assert args.N_samples == 8 and args.datadir == "./data/x"
    # CLI overrides config file
    args2 = parse_args(["--config", str(cfg), "--N_rand", "5"])
    assert args2.N_rand == 5
    # post-parse coercions
    args3 = parse_args(["--hard_ratio", "0.2,0.4", "--n_pose_video",
                        "sample:4,fix:-30,fix:4"])
    assert args3.hard_ratio == [0.2, 0.4]
    assert args3.n_pose_video == ["sample:4", "fix:-30", "fix:4"]
    assert args3.trial.body_arch == "mlp"


def test_scene_config_generation(tmp_path):
    from efficient_nerf_tpu.config.gen_scene_configs import generate
    n = generate(str(tmp_path / "scenes"))
    assert n == 57
    argv = parse_config_file(str(tmp_path / "scenes" / "lego_noview.txt"))
    args = parse_args(argv)
    assert args.dataset_type == "blender" and args.use_viewdirs is False
    assert args.N_importance == 128 and args.half_res is True


def test_train_nerf_teacher_end_to_end(blender_dir, tmp_path):
    args = _base_args(blender_dir, tmp_path,
                      ["--model_name", "nerf", "--use_viewdirs",
                       "--precrop_iters", "2", "--precrop_frac", "0.5"])
    logger = Logger(args, basedir=args.basedir)
    state = train(args, logger, max_iters=5)
    assert int(state.step) == 5
    # checkpoint written at i_weights=4
    assert os.path.exists(os.path.join(logger.weights_path, "ckpt.msgpack"))
    # testset rendered at i_testset=4
    assert any(d.startswith("testset_")
               for d in os.listdir(logger.gen_img_path))


@pytest.fixture
def shard_dir(tmp_path, blender_dir):
    """Reference-format ray shards rendered from random data."""
    from efficient_nerf_tpu.data import rays_to_shards
    rng = np.random.default_rng(0)
    rows = np.concatenate([
        rng.normal(size=(4096 * 2, 6)).astype(np.float32),
        rng.uniform(size=(4096 * 2, 3)).astype(np.float32)], -1)
    out = str(tmp_path / "kd_rays")
    rays_to_shards(rows, out, prefix="train_")
    rays_to_shards(rows, out, prefix="data_")
    return out


def test_train_r2l_rays_mode(blender_dir, shard_dir, tmp_path):
    args = _base_args(blender_dir, tmp_path, [
        "--model_name", "R2L", "--data_mode", "rays",
        "--datadir_kd", f"blender:{shard_dir}",
        "--n_sample_per_ray", "4",
        "--N_rand", "1",
        "--netdepth", "4", "--netwidth", "16",
        "--hard_ratio", "0.1", "--hard_mul", "2",
        "--use_residual",
    ])
    logger = Logger(args, basedir=args.basedir)
    state = train(args, logger, max_iters=5)
    assert int(state.step) == 5


def test_train_r2l_streaming(blender_dir, tmp_path):
    """Full distillation without files: teacher ckpt -> streaming student."""
    # 1) make a teacher checkpoint
    targs = _base_args(blender_dir, tmp_path,
                       ["--model_name", "nerf", "--i_weights", "2",
                        "--i_testset", "1000000"])
    tlogger = Logger(targs, basedir=targs.basedir)
    train(targs, tlogger, max_iters=2)
    ckpt = os.path.join(tlogger.weights_path, "ckpt.msgpack")
    assert os.path.exists(ckpt)

    # 2) student streams from it
    args = _base_args(blender_dir, tmp_path, [
        "--model_name", "R2L", "--stream_pseudo_data",
        "--teacher_ckpt", ckpt,
        "--n_sample_per_ray", "4", "--N_rand", "1",
        "--netdepth", "4", "--netwidth", "16",
        "--N_samples", "4", "--N_importance", "4", "--use_viewdirs",
        "--i_testset", "1000000", "--i_weights", "1000000",
    ])
    logger = Logger(args, basedir=args.basedir)
    state = train(args, logger, max_iters=3)
    assert int(state.step) == 3


def test_render_only_and_export(blender_dir, tmp_path):
    args = _base_args(blender_dir, tmp_path, [
        "--model_name", "R2L", "--render_only", "--render_test",
        "--n_sample_per_ray", "4", "--netdepth", "4", "--netwidth", "16",
    ])
    logger = Logger(args, basedir=args.basedir)
    misc = train(args, logger)
    assert "test_psnr" in misc and np.isfinite(misc["test_psnr"])
    pngs = [f for f in os.listdir(logger.gen_img_path) if f.endswith(".png")]
    assert len(pngs) >= 2  # pred + gt + error per test pose

    # StableHLO export replaces --convert_to_onnx
    args2 = _base_args(blender_dir, tmp_path, [
        "--model_name", "R2L", "--convert_to_onnx",
        "--n_sample_per_ray", "4", "--netdepth", "4", "--netwidth", "16",
    ])
    logger2 = Logger(args2, basedir=args2.basedir)
    path = train(args2, logger2)
    assert os.path.exists(path)
    assert "stablehlo" in path


def test_images_mode_nrand_and_precrop(blender_dir, tmp_path, monkeypatch):
    """Images-mode parity (reference main.py:1264-1302): every batch is
    exactly N_rand pixels, center-cropped while step < precrop_iters."""
    from efficient_nerf_tpu import main as main_mod
    from efficient_nerf_tpu.data.images_dataset import setup_image_datadir

    kd_dir = str(tmp_path / "kd_images")
    setup_image_datadir(blender_dir, kd_dir)
    args = _base_args(blender_dir, tmp_path, [
        "--model_name", "R2L", "--data_mode", "images",
        "--datadir_kd", f"blender:{kd_dir}",
        "--n_sample_per_ray", "4", "--N_rand", "7",
        "--precrop_iters", "10", "--precrop_frac", "0.5",
    ])
    logger = Logger(args, basedir=args.basedir)
    scene = main_mod.load_scene(args)
    rng = np.random.default_rng(0)

    seen = []
    orig = main_mod._select_coords

    def spy(rng, H, W, n_rand, mode, precrop_frac=None):
        seen.append((n_rand, precrop_frac))
        return orig(rng, H, W, n_rand, mode, precrop_frac)

    monkeypatch.setattr(main_mod, "_select_coords", spy)
    next_batch, reload = main_mod._make_r2l_data_iterator(
        args, scene, None, rng, logger)

    o, d, t = next_batch(5)            # inside the precrop warmup
    assert o.shape == (7, 3) and d.shape == (7, 3) and t.shape == (7, 3)
    assert seen[-1] == (7, args.precrop_frac)
    H = scene.hwf[0]
    sel = orig(np.random.default_rng(1), H, H, 4, "rand", args.precrop_frac)
    assert sel[:, 0].min() >= H // 4 and sel[:, 0].max() < H - H // 4

    next_batch(10)                     # warmup over: step >= precrop_iters
    assert seen[-1] == (7, None)
    assert reload(3) is False          # no schedule -> never rebuilds


def test_train_r2l_images_mode(blender_dir, tmp_path):
    from efficient_nerf_tpu.data.images_dataset import setup_image_datadir

    kd_dir = str(tmp_path / "kd_images")
    setup_image_datadir(blender_dir, kd_dir)
    args = _base_args(blender_dir, tmp_path, [
        "--model_name", "R2L", "--data_mode", "images",
        "--datadir_kd", f"blender:{kd_dir}",
        "--n_sample_per_ray", "4", "--N_rand", "16",
        "--netdepth", "4", "--netwidth", "16",
        "--precrop_iters", "2", "--precrop_frac", "0.5",
        "--i_testset", "1000000", "--i_weights", "1000000",
    ])
    logger = Logger(args, basedir=args.basedir)
    state = train(args, logger, max_iters=4)
    assert int(state.step) == 4


def test_benchmark_mode_shares_scan_differencing(blender_dir, tmp_path):
    """--benchmark now runs utils/benchmark.scan_frame_time (varied-input
    scan differencing with trimmed spread bars) instead of timing repeated
    identical calls — the recipe the repo's own PERF.md documents as wrong
    through the tunneled plugin."""
    args = _base_args(blender_dir, tmp_path, [
        "--model_name", "R2L", "--benchmark",
        "--n_sample_per_ray", "4", "--netdepth", "4", "--netwidth", "16",
    ])
    logger = Logger(args, basedir=args.basedir)
    dt = train(args, logger)
    assert np.isfinite(dt) and dt > 0
