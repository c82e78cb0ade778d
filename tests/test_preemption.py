"""Preemption-safe checkpointing: a SIGTERM mid-training saves and exits."""
import os
import signal
import threading

from efficient_nerf_tpu.config.options import parse_args
from efficient_nerf_tpu.main import train
from efficient_nerf_tpu.utils.logging import Logger


def test_preemption_saves_checkpoint(blender_dir, tmp_path):
    args = parse_args([
        "--datadir", blender_dir, "--dataset_type", "blender",
        "--basedir", str(tmp_path / "logs"), "--expname", "preempt",
        "--model_name", "nerf", "--use_viewdirs", "--white_bkgd",
        "--N_samples", "4", "--N_importance", "4",
        "--netdepth", "2", "--netwidth", "16",
        "--netdepth_fine", "2", "--netwidth_fine", "16",
        "--N_rand", "16", "--chunk", "64", "--testskip", "1",
        "--i_print", "1000000", "--i_testset", "1000000",
        "--i_video", "1000000", "--i_weights", "1000000",
    ])
    logger = Logger(args, basedir=args.basedir)

    # fire SIGTERM shortly after training starts
    timer = threading.Timer(3.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        train(args, logger, max_iters=100_000)  # would run far longer
    finally:
        timer.cancel()
    ckpt = os.path.join(logger.weights_path, "ckpt_preempt.msgpack")
    assert os.path.exists(ckpt)
