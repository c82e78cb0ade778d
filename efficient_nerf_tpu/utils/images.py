"""Image/video output helpers (imageio-backed; to8b parity with
reference helpers.py:18)."""
from __future__ import annotations

import numpy as np

__all__ = ["to8b", "save_image", "save_video"]


def to8b(x) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def save_image(path: str, img):
    import imageio.v2 as imageio

    imageio.imwrite(path, to8b(img))


def save_video(path: str, frames, fps: int = 30, quality: int = 8):
    import imageio.v2 as imageio

    frames = [to8b(f) for f in frames]
    try:
        imageio.mimwrite(path, frames, fps=fps, quality=quality)
    except Exception:
        # ffmpeg may be unavailable; fall back to stacked npz next to path
        np.savez_compressed(path + ".npz", frames=np.stack(frames))
