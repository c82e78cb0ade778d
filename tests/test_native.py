"""Native (C++) shard-reader tests: build, correctness vs numpy, loader
integration, throughput sanity."""
import os
import time

import numpy as np
import pytest

from efficient_nerf_tpu.data import RayShardDataset, ShardLoader, rays_to_shards
from efficient_nerf_tpu.data.native import NativeShardReader, native_available


@pytest.fixture
def shards(tmp_path):
    rng = np.random.default_rng(0)
    rows = rng.normal(size=(4096 * 6, 9)).astype(np.float32)
    out = str(tmp_path / "shards")
    rays_to_shards(rows, out, prefix="train_")
    ds = RayShardDataset(out)
    return ds


def test_native_builds_and_matches_numpy(shards):
    if not native_available():
        pytest.skip("no native toolchain")
    reader = NativeShardReader(shards.files, rows=4096, cols=9)
    got = reader.load_batch([0, 2, 1])
    want = np.concatenate([np.load(shards.files[i]) for i in (0, 2, 1)], 0)
    np.testing.assert_array_equal(got, want)
    reader.close()


def test_native_bad_index(shards):
    if not native_available():
        pytest.skip("no native toolchain")
    reader = NativeShardReader(shards.files, rows=4096, cols=9)
    with pytest.raises(IOError):
        reader.load_batch([999])
    reader.close()


def test_loader_uses_native(shards):
    if not native_available():
        pytest.skip("no native toolchain")
    loader = ShardLoader(shards, shards_per_batch=2,
                         rng=np.random.default_rng(0))
    assert loader._native is not None
    o, d, t = next(loader)
    assert o.shape == (8192, 3) and np.isfinite(o).all()
    loader.close()

    # forced-off path still works
    loader2 = ShardLoader(shards, shards_per_batch=2,
                          rng=np.random.default_rng(0), use_native=False)
    assert loader2._native is None
    o2, *_ = next(loader2)
    assert o2.shape == (8192, 3)
    loader2.close()


def test_native_throughput_not_slower(shards):
    """Native batch assembly should at least keep up with numpy."""
    if not native_available():
        pytest.skip("no native toolchain")
    reader = NativeShardReader(shards.files, rows=4096, cols=9)
    idx = [0, 1, 2, 3, 4, 5]
    reader.load_batch(idx)  # warm page cache
    t0 = time.perf_counter()
    for _ in range(20):
        reader.load_batch(idx)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        np.concatenate([np.load(shards.files[i]) for i in idx], 0)
    t_numpy = time.perf_counter() - t0
    reader.close()
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)
