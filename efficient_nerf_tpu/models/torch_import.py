"""Import reference PyTorch `.tar` checkpoints into flax param pytrees.

The reference saves checkpoints as torch pickles containing
`network_fn_state_dict` / `network_fine_state_dict` (and for R2L also a
pickled whole `nn.Module` under `network_fn`, reference main.py:1516-1542).
We import the state_dicts only; the pickled-module entry references the
reference's own module paths and is skipped via a tolerant unpickler.

Mapping: torch `nn.Linear.weight` is [out, in]; flax `Dense.kernel` is
[in, out] -> transpose. R2L residual blocks are stacked along axis 0 to
match the scan-based body (models/r2l.py).
"""
from __future__ import annotations

import io
import pickle
import types
from typing import Any, Dict

import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "nerf_params_from_state_dict",
    "r2l_params_from_state_dict",
    "r2l_state_dict_from_params",
    "nerf_state_dict_from_params",
]


class _Stub:
    """Placeholder for unimportable pickled classes (reference nn.Modules)."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        self.__dict__["_state"] = state

    def __call__(self, *a, **k):  # pragma: no cover
        raise RuntimeError("stubbed object from tolerant unpickling")


def _tolerant_pickle_module():
    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_Stub,), {})

    mod = types.SimpleNamespace()
    mod.__name__ = "tolerant_pickle"
    mod.Unpickler = Unpickler
    mod.load = lambda f, **kw: Unpickler(f).load()
    mod.loads = lambda b, **kw: Unpickler(io.BytesIO(b)).load()
    return mod


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .tar checkpoint; tensors come back as numpy arrays."""
    import torch  # local import: torch is a tooling dep, not a runtime dep

    ckpt = torch.load(path, map_location="cpu",
                      pickle_module=_tolerant_pickle_module(),
                      weights_only=False)
    return ckpt


def _strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                            dtype=np.float32)
    return out


def _dense(sd, prefix):
    return {
        "kernel": sd[f"{prefix}.weight"].T.copy(),
        "bias": sd[f"{prefix}.bias"].copy(),
    }


def nerf_params_from_state_dict(state_dict, depth: int = 8,
                                use_viewdirs: bool = True) -> Dict[str, Any]:
    """Reference `NeRF` state_dict -> NeRFMLP flax params (no wrapping dict)."""
    sd = _strip_module_prefix(state_dict)
    params = {f"pts_{i}": _dense(sd, f"pts_linears.{i}") for i in range(depth)}
    if use_viewdirs:
        params["feature"] = _dense(sd, "feature_linear")
        params["views_0"] = _dense(sd, "views_linears.0")
        params["rgb"] = _dense(sd, "rgb_linear")
        params["alpha"] = _dense(sd, "alpha_linear")
    else:
        params["output"] = _dense(sd, "output_linear")
    return params


def r2l_params_from_state_dict(state_dict, n_block: int, n_learnable: int = 2,
                               linear_tail: bool = False) -> Dict[str, Any]:
    """Reference `NeRF_v3_2` (resmlp body) state_dict -> R2LNet flax params.

    Torch layout: head.0, body.{b}.body.{2j} (Sequential: linears at even
    indices, activations between), tail.0 (or tail for --linear_tail).
    """
    sd = _strip_module_prefix(state_dict)
    params: Dict[str, Any] = {"head": _dense(sd, "head.0")}

    body: Dict[str, Any] = {}
    for j in range(n_learnable):
        kernels = np.stack(
            [sd[f"body.{b}.body.{2 * j}.weight"].T for b in range(n_block)], 0
        )
        biases = np.stack(
            [sd[f"body.{b}.body.{2 * j}.bias"] for b in range(n_block)], 0
        )
        body[f"lin_{j}"] = {"kernel": kernels, "bias": biases}
    params["body"] = body

    tail_prefix = "tail" if linear_tail else "tail.0"
    params["tail"] = _dense(sd, tail_prefix)
    return params


def _undense(d):
    return np.asarray(d["kernel"]).T, np.asarray(d["bias"])


def nerf_state_dict_from_params(params, depth: int = 8,
                                use_viewdirs: bool = True):
    """Inverse mapping (export for cross-checking / reference-compat)."""
    sd = {}
    for i in range(depth):
        w, b = _undense(params[f"pts_{i}"])
        sd[f"pts_linears.{i}.weight"], sd[f"pts_linears.{i}.bias"] = w, b
    if use_viewdirs:
        for ours, theirs in [("feature", "feature_linear"),
                             ("views_0", "views_linears.0"),
                             ("rgb", "rgb_linear"), ("alpha", "alpha_linear")]:
            w, b = _undense(params[ours])
            sd[f"{theirs}.weight"], sd[f"{theirs}.bias"] = w, b
    else:
        w, b = _undense(params["output"])
        sd["output_linear.weight"], sd["output_linear.bias"] = w, b
    return sd


def r2l_state_dict_from_params(params, n_learnable: int = 2,
                               linear_tail: bool = False):
    sd = {}
    w, b = _undense(params["head"])
    sd["head.0.weight"], sd["head.0.bias"] = w, b
    body = params["body"]
    n_block = np.asarray(body["lin_0"]["kernel"]).shape[0]
    for bidx in range(n_block):
        for j in range(n_learnable):
            sd[f"body.{bidx}.body.{2 * j}.weight"] = (
                np.asarray(body[f"lin_{j}"]["kernel"])[bidx].T
            )
            sd[f"body.{bidx}.body.{2 * j}.bias"] = (
                np.asarray(body[f"lin_{j}"]["bias"])[bidx]
            )
    tail_prefix = "tail" if linear_tail else "tail.0"
    w, b = _undense(params["tail"])
    sd[f"{tail_prefix}.weight"], sd[f"{tail_prefix}.bias"] = w, b
    return sd
