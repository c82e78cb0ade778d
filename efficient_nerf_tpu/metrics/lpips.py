"""LPIPS perceptual distance (AlexNet backbone), jnp/flax.

The reference uses the pip `lpips` package (main.py:6,47,313). Pretrained
AlexNet + linear-head weights cannot be downloaded in a hermetic
environment, so this implementation is weight-file gated: convert a torch
LPIPS state_dict once with `convert_torch_lpips` (any machine with the pip
package), ship the .npz, and `lpips_available()` flips on.

Inputs follow the reference convention: NHWC images in [-1, 1].
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lpips_available", "load_lpips_weights", "lpips",
           "convert_torch_lpips", "DEFAULT_WEIGHTS_PATH"]

DEFAULT_WEIGHTS_PATH = os.environ.get(
    "EFFICIENT_NERF_TPU_LPIPS_WEIGHTS",
    os.path.join(os.path.dirname(__file__), "lpips_alex.npz"))

# published input normalization constants (lpips ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature config: (out_ch, kernel, stride, pad), maxpool after 1st/2nd
_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
          (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}


def lpips_available(weights_path: str = None) -> bool:
    return os.path.exists(weights_path or DEFAULT_WEIGHTS_PATH)


def load_lpips_weights(weights_path: str = None) -> Dict[str, np.ndarray]:
    path = weights_path or DEFAULT_WEIGHTS_PATH
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _conv(x, w, b, stride, pad):
    """x NHWC; w torch-layout [O, I, kH, kW]."""
    w = jnp.transpose(jnp.asarray(w), (2, 3, 1, 0))  # HWIO
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(b)


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _alexnet_features(x, weights):
    feats = []
    h = x
    for i, (_, _, stride, pad) in enumerate(_CONVS):
        h = _conv(h, weights[f"conv{i}_w"], weights[f"conv{i}_b"], stride, pad)
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = _maxpool(h)
    return feats


def lpips(img0, img1, weights: Optional[Dict[str, np.ndarray]] = None,
          weights_path: str = None):
    """LPIPS distance per image pair. img0/img1: [N, H, W, 3] in [-1, 1].

    Returns [N] distances.
    """
    if weights is None:
        weights = load_lpips_weights(weights_path)
    shift = jnp.asarray(weights.get("shift", _SHIFT))
    scale = jnp.asarray(weights.get("scale", _SCALE))

    def norm_input(x):
        return (x - shift) / scale

    f0 = _alexnet_features(norm_input(img0), weights)
    f1 = _alexnet_features(norm_input(img1), weights)

    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = jnp.asarray(weights[f"lin{i}_w"]).reshape(-1)  # [C]
        d = jnp.maximum(lin, 0.0) * d  # lpips constrains lin weights >= 0
        total = total + jnp.mean(jnp.sum(d, axis=-1), axis=(1, 2))
    return total


def convert_torch_lpips(out_path: str = None) -> str:
    """Convert the pip `lpips` package's AlexNet LPIPS to our .npz format.

    Run on any machine where `pip install lpips` works; copy the file next
    to this module (or point EFFICIENT_NERF_TPU_LPIPS_WEIGHTS at it).
    """
    import lpips as lpips_pkg  # type: ignore

    net = lpips_pkg.LPIPS(net="alex")
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    out = {}
    conv_idx = [0, 3, 6, 8, 10]  # torchvision alexnet.features indices
    for i, ti in enumerate(conv_idx):
        out[f"conv{i}_w"] = sd[f"net.slice{i + 1}.{ti}.weight"]
        out[f"conv{i}_b"] = sd[f"net.slice{i + 1}.{ti}.bias"]
    for i in range(5):
        out[f"lin{i}_w"] = sd[f"lin{i}.model.1.weight"]
    out["shift"] = sd["scaling_layer.shift"].reshape(-1)
    out["scale"] = sd["scaling_layer.scale"].reshape(-1)
    path = out_path or DEFAULT_WEIGHTS_PATH
    np.savez(path, **out)
    return path
