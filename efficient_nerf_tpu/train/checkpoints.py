"""Checkpoint save/resume.

Functional replacement for the reference's torch .tar checkpoints
(main.py:1516-1542, load at main.py:482-509): a single msgpack file holds
{step, best_psnr, best_psnr_step, params, opt_state}. The reference
additionally pickles the whole nn.Module for R2L; our equivalent of
"arch rides along" is a JSON model-config header, not executable pickle.

Reference .tar checkpoints import via models.torch_import (state_dict only).
"""
from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "restore_train_state",
           "import_reference_checkpoint"]

_MAGIC = b"ENTPUCK1"


def save_checkpoint(path: str, params, opt_state=None, step: int = 0,
                    best_psnr: float = 0.0, best_psnr_step: int = 0,
                    model_config: Optional[Dict[str, Any]] = None) -> str:
    """Write a checkpoint file (atomic rename)."""
    meta = {
        "step": int(step),
        "best_psnr": float(best_psnr),
        "best_psnr_step": int(best_psnr_step),
        "model_config": model_config or {},
        "has_opt_state": opt_state is not None,
    }
    payload = {"params": jax.device_get(params)}
    if opt_state is not None:
        payload["opt_state"] = jax.device_get(opt_state)
    blob = serialization.to_bytes(payload)
    header = json.dumps(meta).encode()

    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, params_template=None, opt_state_template=None):
    """Read a checkpoint. Templates (matching pytrees) restore exact leaf
    types; without them, raw nested dicts of numpy arrays are returned.

    Returns (meta dict, params, opt_state or None).
    """
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an efficient_nerf_tpu checkpoint")
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode())
        blob = f.read()

    template: Dict[str, Any] = {}
    if params_template is not None:
        template["params"] = params_template
        if meta["has_opt_state"] and opt_state_template is not None:
            template["opt_state"] = opt_state_template
        # byte-compat even when opt state present but no template: fall back
        if meta["has_opt_state"] and opt_state_template is None:
            payload = serialization.msgpack_restore(blob)
            params = serialization.from_state_dict(params_template,
                                                   payload["params"])
            return meta, params, payload.get("opt_state")
        payload = serialization.from_bytes(template, blob)
        return meta, payload["params"], payload.get("opt_state")

    payload = serialization.msgpack_restore(blob)
    return meta, payload["params"], payload.get("opt_state")


def restore_train_state(path: str, state):
    """Restore a TrainState (train.steps.TrainState) from a checkpoint."""
    import jax.numpy as jnp

    meta, params, opt_state = load_checkpoint(
        path, params_template=state.params,
        opt_state_template=state.opt_state)
    step = jnp.asarray(meta["step"], jnp.int32)
    new = state._replace(params=params, step=step)
    if opt_state is not None:
        new = new._replace(opt_state=opt_state)
    return meta, new


def import_reference_checkpoint(path: str, kind: str, **arch):
    """Import a reference torch .tar checkpoint into flax params.

    kind='nerf' -> {'coarse': ..., 'fine': ...} (fine present if saved);
    kind='r2l'  -> R2LNet params. arch kwargs forward to the mapping fns
    (depth/use_viewdirs for nerf; n_block/n_learnable/linear_tail for r2l).
    """
    from ..models.torch_import import (load_torch_checkpoint,
                                       nerf_params_from_state_dict,
                                       r2l_params_from_state_dict)

    ckpt = load_torch_checkpoint(path)
    meta = {
        "step": int(ckpt.get("global_step", 0)),
        "best_psnr": float(ckpt.get("best_psnr", 0.0) or 0.0),
    }
    if kind == "nerf":
        params = {"coarse": nerf_params_from_state_dict(
            ckpt["network_fn_state_dict"], **arch)}
        if "network_fine_state_dict" in ckpt:
            params["fine"] = nerf_params_from_state_dict(
                ckpt["network_fine_state_dict"], **arch)
        return meta, params
    if kind == "r2l":
        return meta, r2l_params_from_state_dict(
            ckpt["network_fn_state_dict"], **arch)
    raise ValueError(f"unknown checkpoint kind {kind!r}")
