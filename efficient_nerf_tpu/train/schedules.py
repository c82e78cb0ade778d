"""Learning-rate schedule: exponential decay with optional linear warmup.

Parity with reference main.py:1181-1195: lr = lrate * 0.1^(step / (lrate_decay
* 1000)); with --warmup_lr "start,iters" the lr ramps linearly from `start`
to `lrate` over `iters` steps and the decay clock starts AT the end of
warmup (the reference uses (step - end_iter) in the exponent).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

__all__ = ["make_lr_schedule", "parse_warmup"]


def parse_warmup(spec: str) -> Optional[Tuple[float, int]]:
    """'1e-4,2000' -> (1e-4, 2000); '' -> None."""
    if not spec:
        return None
    start, iters = spec.split(",")
    return float(start), int(float(iters))


def make_lr_schedule(lrate: float, lrate_decay: int,
                     warmup: Optional[Tuple[float, int]] = None,
                     decay_rate: float = 0.1):
    decay_steps = lrate_decay * 1000

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup is None:
            return lrate * decay_rate ** (step / decay_steps)
        start_lr, end_iter = warmup
        ramp = (lrate - start_lr) / end_iter * step + start_lr
        decayed = lrate * decay_rate ** ((step - end_iter) / decay_steps)
        return jnp.where(step < end_iter, ramp, decayed)

    return schedule
