"""Golden-value tests for ray generation / NDC / poses.

Expected values are computed with independent numpy formulas (the reference's
documented math), not by importing the reference code.
"""
import numpy as np
import jax.numpy as jnp

from efficient_nerf_tpu.core import (get_rays, get_rays_np, ndc_rays,
                                     pixel_dirs, plucker_rays)
from efficient_nerf_tpu.core.poses import (pose_spherical, novel_pose_grid,
                                           spherical_render_poses,
                                           recenter_poses, poses_avg,
                                           viewmatrix, spherify_poses)


def _ref_rays(H, W, focal, c2w):
    """Independent reference: explicit per-pixel loop."""
    rays_o = np.empty((H, W, 3), np.float64)
    rays_d = np.empty((H, W, 3), np.float64)
    for y in range(H):
        for x in range(W):
            d = np.array([(x - W * 0.5) / focal, -(y - H * 0.5) / focal, -1.0])
            rays_d[y, x] = c2w[:3, :3] @ d
            rays_o[y, x] = c2w[:3, 3]
    return rays_o, rays_d


def test_get_rays_matches_explicit_loop(rng):
    H, W, focal = 5, 7, 11.0
    c2w = np.eye(4)[:3, :4] + rng.normal(size=(3, 4)) * 0.1
    ro_ref, rd_ref = _ref_rays(H, W, focal, c2w)
    ro, rd = get_rays(H, W, focal, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), rd_ref, atol=1e-5)
    # numpy twin agrees
    ro2, rd2 = get_rays_np(H, W, focal, c2w)
    np.testing.assert_allclose(ro2, ro_ref, atol=1e-5)
    np.testing.assert_allclose(rd2, rd_ref, atol=1e-5)


def test_pixel_dirs_corners():
    H = W = 4
    focal = 2.0
    d = np.asarray(pixel_dirs(H, W, focal))
    # pixel (0,0): x=0, y=0
    np.testing.assert_allclose(d[0, 0], [(0 - 2.0) / 2.0, -(0 - 2.0) / 2.0, -1.0])
    # pixel at (y=3, x=1)
    np.testing.assert_allclose(d[3, 1], [(1 - 2.0) / 2.0, -(3 - 2.0) / 2.0, -1.0])


def test_ndc_rays_near_plane():
    """After NDC projection, rays starting behind the near plane land on it:
    o2 = 1 + 2*near/oz with oz = -near  =>  o2 = -1."""
    H, W, focal = 8, 8, 10.0
    c2w = np.eye(4)[:3, :4].astype(np.float32)
    c2w[2, 3] = 1.0  # camera at z=1 looking down -z
    ro, rd = get_rays(H, W, focal, c2w)
    no, nd = ndc_rays(H, W, focal, 1.0, ro, rd)
    np.testing.assert_allclose(np.asarray(no[..., 2]), -1.0, atol=1e-5)
    # shifted origin must sit on z = -near in world space
    t = -(1.0 + np.asarray(ro[..., 2])) / np.asarray(rd[..., 2])
    shifted = np.asarray(ro) + t[..., None] * np.asarray(rd)
    np.testing.assert_allclose(shifted[..., 2], -1.0, atol=1e-5)


def test_plucker():
    o = np.array([[1.0, 0, 0]])
    d = np.array([[0, 1.0, 0]])
    p = np.asarray(plucker_rays(jnp.asarray(o), jnp.asarray(d)))
    np.testing.assert_allclose(p, [[0, 1, 0, 0, 0, 1]], atol=1e-6)


def test_pose_spherical_properties():
    c2w = pose_spherical(0.0, 0.0, 4.0)
    # radius-4 orbit: camera 4 units from origin
    np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 4.0, rtol=1e-6)
    # view axis (-z column = viewing dir) points at the origin
    view_dir = -c2w[:3, 2]
    np.testing.assert_allclose(
        view_dir, -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3]), atol=1e-6
    )
    # rotation block orthonormal
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)

    # theta=0, phi=0, r: camera on +y axis in blender frame (z up swap)
    np.testing.assert_allclose(c2w[:3, 3], [0.0, 4.0, 0.0], atol=1e-6)


def test_novel_pose_grid_shapes():
    assert novel_pose_grid(8).shape == (8, 4, 4)
    grid = novel_pose_grid([4, 2, 3])
    assert grid.shape == (4 * 2 * 3, 4, 4)
    fixed = novel_pose_grid(["fix:30", "sample:2", "fix:4"])
    assert fixed.shape == (2, 4, 4)
    assert spherical_render_poses(40).shape == (40, 4, 4)


def test_recenter_poses_identity_avg():
    rng = np.random.default_rng(1)
    poses = np.zeros((6, 3, 5), np.float32)
    for i in range(6):
        c2w = pose_spherical(rng.uniform(-60, 60), rng.uniform(-40, -10), 4.0)
        poses[i, :, :4] = c2w[:3, :4]
        poses[i, :, 4] = [100, 120, 50.0]
    rec = recenter_poses(poses)
    avg = poses_avg(rec)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-5)
    # hwf column preserved
    np.testing.assert_allclose(rec[:, :, 4], poses[:, :, 4])


def test_viewmatrix_orthonormal():
    m = viewmatrix(np.array([0.2, 0.3, 1.0]), np.array([0, 1.0, 0]),
                   np.array([1.0, 2, 3]))
    R = m[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(m[:, 3], [1, 2, 3])


def test_spherify_poses_unit_sphere():
    rng = np.random.default_rng(2)
    poses = np.zeros((8, 3, 5), np.float32)
    for i in range(8):
        c2w = pose_spherical(rng.uniform(-180, 180), rng.uniform(-80, -20), 4.0)
        poses[i, :, :4] = c2w[:3, :4]
        poses[i, :, 4] = [100, 120, 50.0]
    bds = np.array([[2.0, 6.0]] * 8, np.float32)
    poses_reset, render_poses, bds2 = spherify_poses(poses, bds)
    assert poses_reset.shape == (8, 3, 5)
    assert render_poses.shape == (120, 3, 5)
    # reset poses sit on a unit-ish sphere around the origin
    radii = np.linalg.norm(poses_reset[:, :3, 3], axis=-1)
    np.testing.assert_allclose(np.sqrt(np.mean(radii**2)), 1.0, rtol=1e-5)
