"""Test harness config: force CPU backend with 8 virtual devices.

The reference codebase (see SURVEY.md section 4) ships no tests; we build the
test pyramid ourselves. Multi-chip sharding is validated on a virtual 8-device
CPU mesh so tests run anywhere; the driver separately dry-runs the multi-chip
path (see __graft_entry__.dryrun_multichip).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may force a TPU platform via site config regardless of
# JAX_PLATFORMS; override it after import, before first device use.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def blender_dir(tmp_path):
    """Miniature blender-format scene: 3 train + 2 val + 2 test 8x8 frames."""
    import json, os
    import imageio.v2 as imageio
    from efficient_nerf_tpu.core.poses import pose_spherical

    rng2 = np.random.default_rng(0)
    base = tmp_path / "scene"
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        frames = []
        os.makedirs(base / split, exist_ok=True)
        for i in range(n):
            img = (rng2.uniform(size=(8, 8, 4)) * 255).astype(np.uint8)
            imageio.imwrite(base / split / f"r_{i}.png", img)
            pose = pose_spherical(30.0 * i, -30.0, 4.0)
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": pose.tolist()})
        meta = {"camera_angle_x": 0.69, "frames": frames}
        with open(base / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    return str(base)
