"""Numerical-sanity tooling.

The reference's closest equivalents are a DEBUG-gated NaN/inf scan over
render outputs (main.py:752-754) and globally-enabled autograd anomaly mode
(nerf_raybased.py:4 — a real slowdown we deliberately do not copy).
Here the checks are explicit and opt-in.
"""
from __future__ import annotations

import contextlib
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["find_nonfinite", "assert_finite", "debug_nans"]


def find_nonfinite(tree: Any, prefix: str = "") -> List[str]:
    """Names of pytree leaves containing NaN/inf (host-side check)."""
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            arr = np.asarray(jax.device_get(leaf))
            if not np.isfinite(arr).all():
                bad.append(prefix + jax.tree_util.keystr(path))
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    return bad


def assert_finite(tree: Any, what: str = "outputs"):
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {what}: {bad}")


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans: recompiles ops to raise at the first NaN.
    (The functional analog of torch's anomaly mode, without paying for it
    in production runs.)"""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
