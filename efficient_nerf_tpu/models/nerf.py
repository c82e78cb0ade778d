"""Teacher model: the classic 8-layer NeRF MLP.

Architecture parity with reference model/nerf_raybased.py:337-440 (`NeRF`):
D ReLU layers of width W over the 63-d positionally-encoded point, an
input-skip concat after layer `skips`, then either a viewdir branch
(feature head + alpha head + one W/2 view layer + rgb head, outputs
[rgb, alpha]) or a single output head.

TPU notes: the MLP is evaluated over [n_rays * n_samples, 63] batches —
pure MXU matmuls. The f32/bf16 policy is owned by the caller (see
models/precision.py); parameters are stored f32.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["NeRFMLP"]


class NeRFMLP(nn.Module):
    depth: int = 8
    width: int = 256
    input_ch: int = 63
    input_ch_views: int = 27
    output_ch: int = 4
    skips: Sequence[int] = (4,)
    use_viewdirs: bool = True
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32  # computation dtype (bf16 on MXU for speed)

    @nn.compact
    def __call__(self, x):
        """x: [..., input_ch + input_ch_views] -> [..., 4] (rgb, sigma)."""
        pts = x[..., : self.input_ch]
        views = x[..., self.input_ch : self.input_ch + self.input_ch_views]

        h = pts
        for i in range(self.depth):
            h = nn.Dense(self.width, name=f"pts_{i}", dtype=self.dtype,
                         param_dtype=self.param_dtype)(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([pts, h], axis=-1)

        if self.use_viewdirs:
            alpha = nn.Dense(1, name="alpha", dtype=self.dtype,
                             param_dtype=self.param_dtype)(h)
            feature = nn.Dense(self.width, name="feature", dtype=self.dtype,
                               param_dtype=self.param_dtype)(h)
            h = jnp.concatenate([feature, views], axis=-1)
            h = nn.relu(
                nn.Dense(self.width // 2, name="views_0", dtype=self.dtype,
                         param_dtype=self.param_dtype)(h)
            )
            rgb = nn.Dense(3, name="rgb", dtype=self.dtype,
                           param_dtype=self.param_dtype)(h)
            return jnp.concatenate([rgb, alpha], axis=-1).astype(jnp.float32)
        return nn.Dense(self.output_ch, name="output", dtype=self.dtype,
                        param_dtype=self.param_dtype)(h).astype(jnp.float32)
