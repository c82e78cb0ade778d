"""Procedural synthetic scene: an analytically ray-traced shaded sphere.

Writes a blender-format dataset (transforms_*.json + PNGs) so the ENTIRE
pipeline — teacher training, pseudo-data generation, student distillation,
evaluation — can run hermetically without downloading NeRF data. Also the
ground truth for the end-to-end quality gates (tests/test_quality_e2e.py):
the scene has real 3D structure (occlusion, shading, view consistency) that
only a working volumetric pipeline can fit.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from ..core.poses import pose_spherical
from ..core.rays import get_rays_np

__all__ = ["render_sphere_frame", "make_synthetic_scene",
           "make_forward_facing_scene", "CAMERA_ANGLE_X"]

CAMERA_ANGLE_X = 0.6911112070083618  # the classic blender-synthetic fov


def render_sphere_frame(c2w, H: int, W: int, focal: float,
                        radius: float = 1.3,
                        center=(0.0, 0.0, 0.0)) -> np.ndarray:
    """[H, W, 4] RGBA: a normal-shaded sphere on transparent background."""
    rays_o, rays_d = get_rays_np(H, W, focal, np.asarray(c2w)[:3, :4])
    o = rays_o.reshape(-1, 3) - np.asarray(center)
    d = rays_d.reshape(-1, 3)
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)

    b = np.einsum("nd,nd->n", o, dn)
    c = np.einsum("nd,nd->n", o, o) - radius ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0

    p = o + t[:, None] * dn                      # hit point (centered)
    normal = p / radius
    # color: normal-mapped base + simple lambert toward a fixed light
    light = np.array([0.5, 0.7, 0.5])
    light = light / np.linalg.norm(light)
    lambert = np.clip(normal @ light, 0.0, 1.0)
    base = 0.5 + 0.5 * normal                    # xyz -> rgb
    rgb = base * (0.35 + 0.65 * lambert[:, None])

    img = np.zeros((H * W, 4), np.float32)
    img[hit, :3] = rgb[hit]
    img[hit, 3] = 1.0
    return img.reshape(H, W, 4)


def make_synthetic_scene(outdir: str, n_train: int = 20, n_val: int = 2,
                         n_test: int = 4, H: int = 64, W: int = 64,
                         radius: float = 1.3,
                         seed: int = 0) -> Tuple[int, int, float]:
    """Write a blender-format sphere scene; returns (H, W, focal)."""
    import imageio.v2 as imageio

    rng = np.random.default_rng(seed)
    focal = 0.5 * W / np.tan(0.5 * CAMERA_ANGLE_X)
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        os.makedirs(os.path.join(outdir, split), exist_ok=True)
        frames = []
        for i in range(n):
            if split == "train":
                theta = rng.uniform(-180, 180)
                phi = rng.uniform(-75, -15)
            else:  # deterministic eval poses
                theta = -180 + 360 * i / max(1, n)
                phi = -30.0
            pose = pose_spherical(theta, phi, 4.0)
            img = render_sphere_frame(pose, H, W, focal, radius=radius)
            fname = f"./{split}/r_{i}"
            imageio.imwrite(os.path.join(outdir, fname + ".png"),
                            (img * 255).astype(np.uint8))
            frames.append({"file_path": fname,
                           "transform_matrix": pose.tolist()})
        with open(os.path.join(outdir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}, f)
    return H, W, focal


def make_forward_facing_scene(outdir: str, n_images: int = 12,
                              H: int = 48, W: int = 64,
                              sphere_z: float = -4.0, radius: float = 1.2,
                              seed: int = 0) -> Tuple[int, int, float]:
    """Write an LLFF-format forward-facing sphere scene; returns (H, W, focal).

    Layout matches what load_llff_data expects (reference
    dataset/load_llff.py:336-380): images/*.png plus poses_bounds.npy
    [N, 17] rows of a 3x5 pose (rotation columns stored in LLFF's
    [down, right, back] order, 5th column [H, W, focal]) and [near, far]
    depth bounds. Cameras sit near the origin looking down world -z with
    small x/y/z jitter — the fern-style geometry the NDC path exists for.
    """
    import imageio.v2 as imageio

    rng = np.random.default_rng(seed)
    focal = 0.9 * W
    os.makedirs(os.path.join(outdir, "images"), exist_ok=True)
    rows = []
    center = (0.0, 0.0, sphere_z)
    for i in range(n_images):
        t = np.array([rng.uniform(-0.4, 0.4), rng.uniform(-0.3, 0.3),
                      rng.uniform(0.0, 0.2)], np.float32)
        # camera axes in world frame: x=right, y=up, z=back (looks down -z)
        c2w = np.concatenate([np.eye(3, dtype=np.float32), t[:, None]], 1)
        img = render_sphere_frame(c2w, H, W, focal, radius=radius,
                                  center=center)
        rgb = img[..., :3] * img[..., 3:] + (1.0 - img[..., 3:])  # white bg
        imageio.imwrite(os.path.join(outdir, "images", f"img_{i:03d}.png"),
                        (rgb * 255).astype(np.uint8))
        # invert the loader's column swap [down,right,back]->[right,up,back]:
        # store columns [-y, x, z]
        stored = np.stack([-c2w[:, 1], c2w[:, 0], c2w[:, 2], c2w[:, 3],
                           np.array([H, W, focal], np.float32)], 1)  # [3, 5]
        near = abs(sphere_z) - radius - 0.6
        far = abs(sphere_z) + radius + 0.6
        rows.append(np.concatenate([stored.reshape(-1), [near, far]]))
    np.save(os.path.join(outdir, "poses_bounds.npy"),
            np.stack(rows, 0).astype(np.float64))
    return H, W, focal


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser("synthetic sphere scene generator")
    ap.add_argument("outdir")
    ap.add_argument("--n_train", type=int, default=40)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    a = ap.parse_args()
    H, W, focal = make_synthetic_scene(a.outdir, n_train=a.n_train,
                                       n_test=a.n_test, H=a.size, W=a.size)
    print(f"wrote sphere scene to {a.outdir} ({H}x{W}, focal {focal:.2f})")
