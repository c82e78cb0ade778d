"""Teacher -> student pseudo-data generation.

The reference dumps ~10k teacher-rendered images to ~310k tiny .npy shard
files and trains the student from disk (create_data.py:777-872; ~24h on a
2080 Ti, README.md:87). TPU-native replacement: the teacher renders frames
ON DEVICE inside one jitted program (random pose + random focal in [1,2) x
focal), rows [rays_o, rays_d, rgb(, depth|surface)] land in a host-side
streaming shuffle buffer, and student batches are drawn directly from it —
no filesystem round-trip. The .npy shard writer is kept as an optional
export for byte-format parity with the reference pipeline.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rays import apply_trans_origin, get_rays, ndc_rays
from ..render.renderer import RenderConfig, render_rays
from ..core.poses import make_llff_pose_sampler, random_spherical_pose

__all__ = ["make_pseudo_frame_renderer", "ShuffleBuffer",
           "StreamingPseudoGenerator", "export_pseudo_shards",
           "scene_pose_sampler", "SHARD_ROWS"]

SHARD_ROWS = 4096


def scene_pose_sampler(dataset_type: str, poses=None, radius: float = 4.0):
    """Pseudo-data pose distribution per dataset family: rng -> c2w.

    blender / deepvoxels: uniform spherical orbit (reference get_rand_pose,
    load_blender.py:359-368). llff: bbox-random forward-facing poses
    derived from the capture's own cameras (reference get_rand_pose_v2,
    load_llff.py:187-218, selected at create_data.py:642) — an orbit pose
    is geometrically meaningless for a forward-facing capture.
    """
    if dataset_type == "llff":
        if poses is None:
            raise ValueError(
                "llff pseudo-data pose sampling needs the capture poses")
        return make_llff_pose_sampler(poses)
    return lambda rng: random_spherical_pose(rng, radius=radius)


def make_pseudo_frame_renderer(model, cfg: RenderConfig, H: int, W: int,
                               focal: float, learn_depth: str = "",
                               trans_origin: str = ""):
    """Jitted (params, c2w, focal_scale, key) -> [H*W, D] teacher rows.

    D = 9, or 10 with learn_depth='depth', or 12 with 'surface'
    (rows match the reference shard format, create_data.py:833-841).
    trans_origin applies the reference's origin-translation modes to every
    generated ray (create_data.py:34-37 redefines get_rays via partial).

    cfg.ndc (LLFF forward-facing scenes): every teacher call in the
    reference goes through render(), which projects the rays to NDC before
    sampling z in [0, 1] (main.py:160-162, called from create_data.py:825)
    — so the RENDER here uses NDC rays (viewdirs normalized from the
    pre-NDC world dirs first), while the PACKED rows keep the raw world
    rays exactly as the reference dumps them (create_data.py:833-841 packs
    the get_rays output, not render()'s projected rays). Note the
    projection uses the BASE focal even under random focal scaling: the
    reference generates rays with focal_ but calls render(H, W, focal, ...)
    (create_data.py:816-825).
    """
    chunk = min(cfg.chunk, H * W)
    n = H * W
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    ecfg = cfg.eval_mode()

    def fn(params_coarse, params_fine, c2w, focal_scale, key):
        rays_o, rays_d = get_rays(H, W, focal, c2w, focal_scale=focal_scale)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        rays_o = apply_trans_origin(rays_o, rays_d, trans_origin)
        viewdirs = None
        if ecfg.use_viewdirs:
            viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        if ecfg.ndc:
            render_o, render_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
        else:
            render_o, render_d = rays_o, rays_d

        def pad0(x):
            return jnp.pad(x, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)

        o_c, d_c = pad0(render_o), pad0(render_d)
        vd_c = pad0(viewdirs) if viewdirs is not None else jnp.zeros_like(o_c)

        def chunk_fn(carry, inp):
            o, d, vd = inp
            res = render_rays(model, params_coarse, params_fine, o, d,
                              vd if ecfg.use_viewdirs else None, None, ecfg)
            return carry, (res.rgb, res.depth)

        _, (rgb, depth) = jax.lax.scan(chunk_fn, None, (o_c, d_c, vd_c))
        rgb = rgb.reshape(-1, 3)[:n]
        depth = depth.reshape(-1)[:n]

        cols = [rays_o, rays_d, rgb]
        if learn_depth == "depth":
            cols.append(depth[:, None])
        elif learn_depth == "surface":
            cols.append(rays_o + rays_d * depth[:, None])
        return jnp.concatenate(cols, axis=-1)

    return jax.jit(fn)


class ShuffleBuffer:
    """Fixed-capacity streaming shuffle of rows (host-side numpy).

    add() fills until capacity, then overwrites uniformly-random rows;
    sample() draws uniform rows. Together these approximate the reference's
    global double-shuffle over all generated rays at O(capacity) memory.
    """

    def __init__(self, capacity: int, row_dim: int,
                 rng: Optional[np.random.Generator] = None):
        self.buf = np.empty((capacity, row_dim), np.float32)
        self.size = 0
        self.rng = rng or np.random.default_rng()

    def add(self, rows: np.ndarray):
        n = rows.shape[0]
        cap = self.buf.shape[0]
        if self.size < cap:
            take = min(n, cap - self.size)
            self.buf[self.size:self.size + take] = rows[:take]
            self.size += take
            rows = rows[take:]
            n = rows.shape[0]
        if n > 0:
            idx = self.rng.choice(cap, size=n, replace=False) if n <= cap \
                else self.rng.integers(0, cap, size=n)
            self.buf[idx] = rows

    def sample(self, n: int) -> np.ndarray:
        if self.size == 0:
            raise RuntimeError("empty shuffle buffer")
        idx = self.rng.integers(0, self.size, size=n)
        return self.buf[idx]


class StreamingPseudoGenerator:
    """Endless student batches straight from the on-device teacher.

    frames_per_batch controls the refresh rate: how many new teacher frames
    are rendered per emitted batch (fractional allowed, e.g. 0.25 = one new
    frame every 4 batches).
    """

    def __init__(self, model, params_coarse, params_fine, cfg: RenderConfig,
                 H: int, W: int, focal: float, *, batch_rays: int,
                 buffer_rays: int = 2_000_000, warmup_frames: int = 4,
                 frames_per_batch: float = 0.5, use_rand_focal: bool = True,
                 learn_depth: str = "", radius: float = 4.0,
                 trans_origin: str = "", pose_sampler=None,
                 rng: Optional[np.random.Generator] = None):
        self.render_frame = make_pseudo_frame_renderer(model, cfg, H, W, focal,
                                                       learn_depth,
                                                       trans_origin)
        self.params = (params_coarse, params_fine)
        self.H, self.W = H, W
        self.batch_rays = batch_rays
        self.use_rand_focal = use_rand_focal
        self.radius = radius
        # pose_sampler: rng -> [3, >=4] c2w. Default is the blender orbit
        # (reference get_rand_pose); LLFF scenes must pass
        # make_llff_pose_sampler(poses) (reference get_rand_pose_v2,
        # create_data.py:642).
        self.pose_sampler = pose_sampler or (
            lambda r: random_spherical_pose(r, radius=self.radius))
        self.rng = rng or np.random.default_rng(0)
        row_dim = {"": 9, "depth": 10, "surface": 12}[learn_depth]
        self.buffer = ShuffleBuffer(buffer_rays, row_dim, self.rng)
        self.frames_per_batch = frames_per_batch
        self._debt = 0.0
        self.frames_rendered = 0
        # one-frame pipeline: frame k+1's render is dispatched BEFORE frame
        # k's rows are fetched to the host, so the ~5.8 MB device->host
        # copy (a ~250 ms round trip through the tunneled plugin — more
        # than half a 400x400 teacher frame) overlaps the next render
        # instead of serializing after it. Measured end-to-end: 648 ->
        # ~390 ms/frame bf16 (docs/PERF.md r5).
        self._pending = None
        for _ in range(warmup_frames):
            self._render_one()

    def _render_one(self):
        pose = self.pose_sampler(self.rng)
        fs = 1.0 + self.rng.random() if self.use_rand_focal else 1.0
        rows = self.render_frame(self.params[0], self.params[1],
                                 jnp.asarray(pose[:3, :4]),
                                 jnp.float32(fs), None)  # async dispatch
        if self._pending is not None:
            self.buffer.add(np.asarray(self._pending))
        self._pending = rows
        self.frames_rendered += 1

    def _flush(self):
        if self._pending is not None:
            self.buffer.add(np.asarray(self._pending))
            self._pending = None

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        return self

    def __next__(self):
        self._debt += self.frames_per_batch
        while self._debt >= 1.0:
            self._render_one()
            self._debt -= 1.0
        if self.buffer.size == 0:
            self._flush()
        rows = self.buffer.sample(self.batch_rays)
        return rows[:, :3], rows[:, 3:6], rows[:, 6:]


def export_pseudo_shards(model, params_coarse, params_fine, cfg: RenderConfig,
                         H: int, W: int, focal: float, outdir: str,
                         n_pose: int, *, i_save: int = 100,
                         use_rand_focal: bool = True, learn_depth: str = "",
                         resume: bool = True, radius: float = 4.0,
                         trans_origin: str = "", max_save: int = 0,
                         pose_sampler=None, seed: int = 0,
                         progress=None) -> int:
    """Write reference-format pseudo shards data_{k}.npy (4096 rows each).

    Mirrors create_data.py rand mode: every i_save poses the accumulated
    rows are double-shuffled and flushed as full 4096-row shards; an
    existing directory resumes by counting existing .npy files. max_save > 0
    bounds the shard count by wrapping the index (a ring of files that newer
    shards overwrite, reference create_data.py:1110 'to maintain similar
    total size').
    """
    rng = np.random.default_rng(seed)
    pose_sampler = pose_sampler or (
        lambda r: random_spherical_pose(r, radius=radius))
    render_frame = make_pseudo_frame_renderer(model, cfg, H, W, focal,
                                              learn_depth, trans_origin)
    os.makedirs(outdir, exist_ok=True)
    split = len([x for x in os.listdir(outdir) if x.endswith(".npy")]) \
        if resume else 0

    acc = []
    pending = None  # one-frame pipeline (see StreamingPseudoGenerator)
    for i in range(1, n_pose + 1):
        pose = pose_sampler(rng)
        fs = 1.0 + rng.random() if use_rand_focal else 1.0
        rows = render_frame(params_coarse, params_fine,
                            jnp.asarray(pose[:3, :4]), jnp.float32(fs), None)
        if pending is not None:
            acc.append(np.asarray(pending))
        pending = rows
        if progress is not None:
            progress(i, n_pose)
        if i % i_save == 0 or i == n_pose:
            acc.append(np.asarray(pending))   # drain the pipeline at the
            pending = None                    # shard boundary
            data = np.concatenate(acc, 0)
            data = data[rng.permutation(data.shape[0])]
            data = data[rng.permutation(data.shape[0])]
            num = data.shape[0] // SHARD_ROWS
            for k in range(num):
                split += 1
                idx = split % max_save if max_save > 0 else split
                np.save(os.path.join(outdir, f"data_{idx}.npy"),
                        data[k * SHARD_ROWS:(k + 1) * SHARD_ROWS])
            acc = []
    return split
