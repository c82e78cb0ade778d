"""Data-pipeline tests on synthetic miniature datasets written to tmpdirs."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_nerf_tpu.core.poses import pose_spherical
from efficient_nerf_tpu.data import (RayShardDataset, ShardLoader,
                                     ShuffleBuffer, StreamingPseudoGenerator,
                                     composite_white, convert_blender_to_rays,
                                     export_pseudo_shards, infinite_indices,
                                     load_blender_data, rays_to_shards)
from efficient_nerf_tpu.models import NeRFMLP
from efficient_nerf_tpu.render import RenderConfig


def test_load_blender(blender_dir):
    data = load_blender_data(blender_dir, half_res=False, testskip=1)
    assert data.images.shape == (7, 8, 8, 4)
    assert data.poses.shape == (7, 4, 4)
    H, W, focal = data.hwf
    assert (H, W) == (8, 8)
    np.testing.assert_allclose(focal, 0.5 * 8 / np.tan(0.345), rtol=1e-5)
    i_train, i_val, i_test = data.splits
    assert list(i_train) == [0, 1, 2]
    assert list(i_test) == [5, 6]
    # white composite
    rgb = composite_white(data.images, True)
    assert rgb.shape[-1] == 3
    assert rgb.max() <= 1.0 + 1e-6


def test_load_blender_half_res_and_testskip(blender_dir):
    data = load_blender_data(blender_dir, half_res=True, testskip=2)
    assert data.images.shape[1:3] == (4, 4)
    # testskip=2 -> 1 val + 1 test retained
    assert data.images.shape[0] == 3 + 1 + 1


def test_convert_blender_and_shard_dataset(blender_dir, tmp_path):
    out = str(tmp_path / "rays")
    # 3 train frames x 64 rays = 192 rows -> 0 full 4096 shards; use direct
    # rays_to_shards with repeat to cross the shard threshold
    data = load_blender_data(blender_dir)
    n = convert_blender_to_rays(blender_dir, out, half_res=False)
    assert n == 0  # miniature scene: fewer than 4096 rays

    rows = np.tile(np.arange(9, dtype=np.float32)[None], (4096 * 3 + 100, 1))
    rows += np.arange(rows.shape[0], dtype=np.float32)[:, None]
    n = rays_to_shards(rows, out, prefix="train_")
    assert n == 3
    # plus pseudo shards
    n2 = rays_to_shards(rows[:8192], out, prefix="data_")
    assert n2 == 2

    ds = RayShardDataset(out, pseudo_ratio=-1.0)
    assert len(ds) == 5 and ds.n_original == 3 and ds.n_pseudo == 2
    d = ds.load(0)
    assert d.shape == (4096, 9)
    o, dirs, rgb = ds.split_columns(d)
    assert o.shape == dirs.shape == rgb.shape == (4096, 3)

    # pseudo_ratio mixing: 0.5 -> ~3 pseudo picks + 3 original
    ds2 = RayShardDataset(out, pseudo_ratio=0.5,
                          rng=np.random.default_rng(0))
    assert len(ds2) == 6

    # hold_ratio
    ds3 = RayShardDataset(out, hold_ratio=0.4, rng=np.random.default_rng(0))
    assert len(ds3) == 3


def test_shard_loader_batches(tmp_path):
    out = str(tmp_path / "rays")
    rows = np.random.default_rng(0).normal(size=(4096 * 4, 9)).astype(np.float32)
    rays_to_shards(rows, out, prefix="train_")
    ds = RayShardDataset(out)
    loader = ShardLoader(ds, shards_per_batch=2, rng=np.random.default_rng(1))
    o, d, t = next(loader)
    assert o.shape == (2 * 4096, 3) and d.shape == o.shape and t.shape == o.shape
    o2, *_ = next(loader)
    assert not np.allclose(o, o2)
    loader.close()


def test_infinite_indices_covers_all():
    it = infinite_indices(5, np.random.default_rng(0))
    seen = [next(it) for _ in range(10)]
    assert sorted(seen[:5]) == list(range(5))
    assert sorted(seen[5:]) == list(range(5))


def test_shuffle_buffer():
    rng = np.random.default_rng(0)
    buf = ShuffleBuffer(100, 2, rng)
    buf.add(np.ones((60, 2), np.float32))
    assert buf.size == 60
    buf.add(np.full((60, 2), 2.0, np.float32))
    assert buf.size == 100
    s = buf.sample(50)
    assert set(np.unique(s)) <= {1.0, 2.0}


def _tiny_teacher():
    cfg = RenderConfig(n_samples=4, n_importance=4, use_viewdirs=False,
                       white_bkgd=True, chunk=32, near=2.0, far=6.0)
    model = NeRFMLP(depth=2, width=8, input_ch=63, input_ch_views=0,
                    use_viewdirs=False)
    p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)))["params"]
    return model, p, cfg


def test_streaming_pseudo_generator():
    model, p, cfg = _tiny_teacher()
    gen = StreamingPseudoGenerator(
        model, p, p, cfg, H=6, W=6, focal=8.0, batch_rays=64,
        buffer_rays=200, warmup_frames=2, frames_per_batch=0.5,
        rng=np.random.default_rng(0))
    o, d, rgb = next(gen)
    assert o.shape == (64, 3) and rgb.shape == (64, 3)
    assert np.isfinite(o).all() and np.isfinite(rgb).all()
    n0 = gen.frames_rendered
    next(gen); next(gen)
    assert gen.frames_rendered > n0  # refresh happened


def test_export_pseudo_shards_resume(tmp_path):
    model, p, cfg = _tiny_teacher()
    out = str(tmp_path / "kd")
    # 64x64 = 4096 rays/frame -> 1 shard per pose
    n = export_pseudo_shards(model, p, p, cfg, H=64, W=64, focal=60.0,
                             outdir=out, n_pose=2, i_save=1, seed=0)
    assert n == 2
    files = sorted(os.listdir(out))
    assert files == ["data_1.npy", "data_2.npy"]
    d = np.load(os.path.join(out, "data_1.npy"))
    assert d.shape == (4096, 9) and d.dtype == np.float32
    # resume: existing files counted, numbering continues
    n = export_pseudo_shards(model, p, p, cfg, H=64, W=64, focal=60.0,
                             outdir=out, n_pose=1, i_save=1, seed=1)
    assert n == 3
    assert "data_3.npy" in os.listdir(out)
    # learn_depth variants widen rows
    out2 = str(tmp_path / "kd2")
    export_pseudo_shards(model, p, p, cfg, H=64, W=64, focal=60.0,
                         outdir=out2, n_pose=1, i_save=1, learn_depth="depth")
    assert np.load(os.path.join(out2, "data_1.npy")).shape == (4096, 10)


def test_export_pseudo_shards_max_save_ring(tmp_path):
    """--max_save wraps the shard index (reference create_data.py:1110):
    4 shards with max_save=2 leave exactly data_0/data_1 on disk."""
    model, p, cfg = _tiny_teacher()
    out = str(tmp_path / "kd")
    n = export_pseudo_shards(model, p, p, cfg, H=64, W=64, focal=60.0,
                             outdir=out, n_pose=4, i_save=1, max_save=2,
                             seed=0)
    assert n == 4
    assert sorted(os.listdir(out)) == ["data_0.npy", "data_1.npy"]


def test_pseudo_trans_origin_translates_origins():
    """trans_origin='fixed' slides origins 30 units along the (normalized)
    ray; the packed rows must carry the translated origins."""
    from efficient_nerf_tpu.data.pseudo import make_pseudo_frame_renderer
    from efficient_nerf_tpu.core.poses import pose_spherical

    model, p, cfg = _tiny_teacher()
    c2w = jnp.asarray(pose_spherical(30.0, -30.0, 4.0)[:3, :4])
    base = make_pseudo_frame_renderer(model, cfg, 4, 4, 6.0)
    trans = make_pseudo_frame_renderer(model, cfg, 4, 4, 6.0,
                                       trans_origin="fixed")
    r0 = np.asarray(base(p, p, c2w, jnp.float32(1.0), None))
    r1 = np.asarray(trans(p, p, c2w, jnp.float32(1.0), None))
    d = r0[:, 3:6]
    want = r0[:, :3] + 30.0 * d / np.linalg.norm(d, axis=-1, keepdims=True)
    np.testing.assert_allclose(r1[:, :3], want, atol=1e-4)
    np.testing.assert_allclose(r1[:, 3:6], r0[:, 3:6], atol=1e-6)
