"""R2L student: a deep residual MLP neural light field (one ray -> one RGB).

Architecture parity with reference model/nerf_raybased.py:443-544
(`NeRF_v3_2` + `ResMLP`): head Linear+act over the [B, K*(2L+1)] embedded
ray, a body of residual blocks (x + res_scale * body(x), body = n_learnable
Linears with `inact` between them), optional global residual, and a
Linear+sigmoid tail. W256 D88 = head + 43 blocks x 2 + tail = 88 linears.

TPU-first design:
  * The body is a `lax.scan` over stacked block parameters
    ([n_block, ...] leaves): one compiled block body instead of 43 unrolled
    ones — much faster XLA compiles at identical runtime (each iteration is
    two [B,256]x[256,256] MXU matmuls).
  * `remat_body=True` rematerializes each block in the backward pass,
    bounding training activation memory at O(width) per ray instead of
    O(depth * width).
  * `dtype` selects the computation dtype (bf16 on the MXU for speed;
    params stay f32).

Non-uniform `layerwise_widths` falls back to an unrolled plain-MLP body
(reference option --layerwise_netwidths).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["R2LNet", "R2LConvNet", "ResBlock", "get_activation"]


def get_activation(name: str):
    name = (name or "none").lower()
    if name == "relu":
        return nn.relu
    if name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.01)
    if name == "none":
        return None
    raise NotImplementedError(f"activation {name!r}")


class ResBlock(nn.Module):
    """x + res_scale * (Linear [act Linear]*) with optional output act."""

    width: int
    n_learnable: int = 2
    inact: str = "relu"
    outact: str = "none"
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        inact = get_activation(self.inact)
        outact = get_activation(self.outact)
        h = x
        for i in range(self.n_learnable):
            if i > 0 and inact is not None:
                h = inact(h)
            h = nn.Dense(self.width, name=f"lin_{i}", dtype=self.dtype)(h)
        x = h * jnp.asarray(self.res_scale, h.dtype) + x
        if outact is not None:
            x = outact(x)
        return x, None


class R2LNet(nn.Module):
    """Neural light field student.

    input_dim: K*(2L+1) for flattened-ray PE inputs (1008 for 16 samples,
    L=10) or 6*(2L+1) for Plucker rays.
    depth/width: reference --netdepth/--netwidth (defaults W256 D88 profile
    comes from the config layer).
    """

    input_dim: int
    depth: int = 88
    width: int = 256
    output_dim: int = 3
    n_block: int = -1            # -1 -> (depth - 2) // 2
    n_learnable: int = 2
    body_arch: str = "resmlp"    # 'resmlp' | 'mlp'
    act: str = "relu"
    inact: str = "relu"
    outact: str = "none"
    res_scale: float = 1.0
    use_residual: bool = False   # global residual around the body
    linear_tail: bool = False    # tail without sigmoid
    layerwise_widths: Tuple[int, ...] = ()
    remat_body: bool = False
    dtype: Any = jnp.float32

    def _n_block(self) -> int:
        return self.n_block if self.n_block > 0 else (self.depth - 2) // 2

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.act)
        x = nn.Dense(self.width if not self.layerwise_widths
                     else self.layerwise_widths[0],
                     name="head", dtype=self.dtype)(x)
        if act is not None:
            x = act(x)

        if self.layerwise_widths:
            # Unrolled plain MLP with per-layer widths (rare ablation path).
            widths = list(self.layerwise_widths) + [self.output_dim]
            h = x
            for i in range(1, self.depth - 1):
                h = nn.Dense(widths[i], name=f"body_{i - 1}", dtype=self.dtype)(h)
                if act is not None:
                    h = act(h)
            x = h + x if self.use_residual else h
            tail_in_width = widths[self.depth - 2]
        elif self.body_arch == "mlp":
            h = x
            for i in range(1, self.depth - 1):
                h = nn.Dense(self.width, name=f"body_{i - 1}", dtype=self.dtype)(h)
                if act is not None:
                    h = act(h)
            x = h + x if self.use_residual else h
            tail_in_width = self.width
        else:
            block_cls = ResBlock
            if self.remat_body:
                block_cls = nn.remat(ResBlock, prevent_cse=False)
            scan_blocks = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self._n_block(),
                metadata_params={nn.meta.PARTITION_NAME: None},
            )(
                width=self.width,
                n_learnable=self.n_learnable,
                inact=self.inact,
                outact=self.outact,
                res_scale=self.res_scale,
                dtype=self.dtype,
                name="body",
            )
            h, _ = scan_blocks(x, None)
            x = h + x if self.use_residual else h
            tail_in_width = self.width

        del tail_in_width  # (documented: tail consumes the body width)
        x = nn.Dense(self.output_dim, name="tail", dtype=self.dtype)(x)
        if not self.linear_tail:
            x = nn.sigmoid(x)
        return x.astype(jnp.float32)


class R2LConvNet(nn.Module):
    """CNN-style patch student: the reference's vestigial conv ablation
    surface made trainable.

    The reference ships the pieces — patch samplers
    (PointSampler.sample_train2/sample_train_cnnstyle,
    nerf_raybased.py:129-173), an unflattened embedder (embed_cnnstyle,
    :218-223), NCHW-compat input permute (NeRF_v3_2.forward :539-541),
    16x16patches/3x3rays data-creation modes (create_data.py), and flags
    --body_arch {conv,resblock} --use_bn --kernel_size --padding
    (option.py:297-304) — but no driver consumes them. This module is that
    consumer: head 1x1 conv -> body of conv layers ('conv') or residual
    conv pairs ('resblock'), optional BatchNorm, -> 1x1 conv + sigmoid tail.

    Input [N, ph, pw, C] (NHWC — TPU-native layout; the reference's NCHW
    permute is torch-idiom, not spec). Body convs use SAME padding so patch
    geometry and residual shapes stay static (the accepted --padding int is
    documented as subsumed, docs/COMPONENTS.md): XLA maps these convs onto
    the MXU as implicit-GEMMs.
    """

    input_dim: int
    depth: int = 6
    width: int = 64
    output_dim: int = 3
    kernel_size: int = 3
    body_arch: str = "resblock"  # 'conv' | 'resblock'
    use_bn: bool = False
    act: str = "relu"
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.act) or (lambda v: v)
        k = (self.kernel_size, self.kernel_size)

        def conv(ch, name, kernel=k):
            return nn.Conv(ch, kernel, padding="SAME", name=name,
                           dtype=self.dtype)

        def maybe_bn(h, name):
            if not self.use_bn:
                return h
            return nn.BatchNorm(use_running_average=not train, name=name,
                                dtype=self.dtype)(h)

        h = act(maybe_bn(conv(self.width, "head", (1, 1))(x), "head_bn"))

        if self.body_arch == "conv":
            for i in range(1, self.depth - 1):
                h = act(maybe_bn(conv(self.width, f"body_{i - 1}")(h),
                                 f"body_bn_{i - 1}"))
        else:  # residual conv pairs (ResMLP with spatial support)
            n_block = max(1, (self.depth - 2) // 2)
            for b in range(n_block):
                g = act(maybe_bn(conv(self.width, f"block{b}_conv0")(h),
                                 f"block{b}_bn0"))
                g = maybe_bn(conv(self.width, f"block{b}_conv1")(g),
                             f"block{b}_bn1")
                h = g * jnp.asarray(self.res_scale, g.dtype) + h

        h = nn.Conv(self.output_dim, (1, 1), padding="SAME", name="tail",
                    dtype=self.dtype)(h)
        return nn.sigmoid(h).astype(jnp.float32)
