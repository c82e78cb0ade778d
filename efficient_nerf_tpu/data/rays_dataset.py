"""Ray-shard dataset + infinite prefetching loader.

The R2L training corpus is a directory of .npy shards, each [4096, 9+] rows
of [rays_o, rays_d, rgb(, depth|surface)]; files named train_*.npy are
converted REAL data, everything else is teacher-generated PSEUDO data
(reference dataset/load_blender.py:257-324, BlenderDataset_v2).

TPU-first pipeline: a background thread pool reads+assembles the next
batches ([N_rand*4096, 3] x3 contiguous arrays) while the device trains on
the current one — the host/device overlap the reference gets from
DataLoader workers, without per-item torch collation.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

__all__ = ["RayShardDataset", "ShardLoader", "infinite_indices"]


class RayShardDataset:
    """File-list resolution with pseudo/real mixing.

    pseudo_ratio: -1 -> use all shards; otherwise pick pseudo shards (with
    replacement) so that pseudo/(pseudo+original) ~= pseudo_ratio, matching
    the reference's sampling. hold_ratio holds out a fraction entirely
    (ablation knob).
    """

    def __init__(self, datadir: str, dim_dir: int = 3, dim_rgb: int = 3,
                 pseudo_ratio: float = -1.0, hold_ratio: float = 0.0,
                 rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        names = [x for x in os.listdir(datadir) if x.endswith(".npy")]
        pseudo = [os.path.join(datadir, x) for x in names
                  if not x.startswith("train_")]
        original = [os.path.join(datadir, x) for x in names
                    if x.startswith("train_")]

        if not (0 <= pseudo_ratio <= 1 or pseudo_ratio == -1):
            raise ValueError("pseudo_ratio must be in [0,1] or -1")
        if pseudo_ratio == -1:
            files = pseudo + original
        else:
            num_pseudo = int(len(original) / (1.0 - pseudo_ratio)) - len(original)
            files = list(rng.choice(pseudo, num_pseudo)) + original

        if not 0 <= hold_ratio < 1:
            raise ValueError("hold_ratio must be in [0,1)")
        if hold_ratio > 0:
            keep = int(len(files) * (1 - hold_ratio))
            files = list(rng.choice(files, keep, replace=False))

        self.files: List[str] = files
        self.n_pseudo = len(pseudo)
        self.n_original = len(original)
        self.dim_dir = dim_dir
        self.dim_rgb = dim_rgb

    def __len__(self) -> int:
        return len(self.files)

    def load(self, index: int) -> np.ndarray:
        return np.load(self.files[index])

    def split_columns(self, d: np.ndarray):
        dd, dr = self.dim_dir, self.dim_rgb
        return d[..., :3], d[..., 3:3 + dd], d[..., 3 + dd:3 + dd + dr]


def infinite_indices(n: int, rng: np.random.Generator) -> Iterator[int]:
    """Endless stream of shuffled indices (reference InfiniteSampler,
    main.py:759-783): reshuffle after each full pass."""
    while True:
        for i in rng.permutation(n):
            yield int(i)


class ShardLoader:
    """Infinite batches of shards, assembled off-thread.

    Yields (rays_o, rays_d, target): [N_rand*4096, 3/dim_rgb] float32.
    """

    def __init__(self, dataset: RayShardDataset, shards_per_batch: int,
                 rng: Optional[np.random.Generator] = None,
                 prefetch: int = 2, num_threads: int = 2,
                 use_native: bool = True):
        self.ds = dataset
        self.k = shards_per_batch
        self.rng = rng or np.random.default_rng()
        self._indices = infinite_indices(len(dataset), self.rng)
        self._native = None
        if use_native and len(dataset):
            try:
                from .native import NativeShardReader, native_available

                if native_available():
                    probe = dataset.load(0)
                    self._native = NativeShardReader(
                        dataset.files, rows=probe.shape[0],
                        cols=probe.shape[-1])
            except Exception:
                self._native = None
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, num_threads))
        ]
        for t in self._threads:
            t.start()

    def _next_batch_indices(self):
        with self._lock:
            return [next(self._indices) for _ in range(self.k)]

    def _worker(self):
        while not self._stop.is_set():
            idxs = self._next_batch_indices()
            if self._native is not None:
                d = self._native.load_batch(idxs)
            else:
                parts = [self.ds.load(i) for i in idxs]
                d = np.concatenate(parts, 0).astype(np.float32)
            o, dirs, tgt = self.ds.split_columns(d)
            batch = (np.ascontiguousarray(o), np.ascontiguousarray(dirs),
                     np.ascontiguousarray(tgt))
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self._q.get()

    def close(self):
        self._stop.set()
        while not self._q.empty():
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
