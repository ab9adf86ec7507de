"""Checkpointing with Orbax: async-capable, sharding-aware save/resume.

Mirrors the reference's directory contract — one `{step}.ckpt` directory per
save, resume from the max-numbered step or `best.ckpt`
(reference `utils.py:367-405`) — on top of `orbax.checkpoint`, which restores
arrays directly onto their mesh shardings (no host round-trip).
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_path(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"{step}.ckpt")


def save_checkpoint(root: str, state: Any, step: Optional[int] = None):
    """Write {params, ema_params, opt_state, step} under {root}/{step}.ckpt.
    The payload step is always the state's own step counter."""
    os.makedirs(root, exist_ok=True)
    state_step = int(state.step)
    path = _ckpt_path(root, state_step if step is None else step)
    with ocp.StandardCheckpointer() as ckptr:
        payload = {
            "step": np.asarray(state_step),
            "params": state.params,
            "ema_params": state.ema_params,
            "opt_state": state.opt_state,
        }
        ckptr.save(path, payload, force=True)


def load_checkpoint(path: str, abstract_state: Optional[Any] = None) -> dict:
    with ocp.StandardCheckpointer() as ckptr:
        if abstract_state is None:
            return ckptr.restore(os.path.abspath(path))
        target = {
            "step": np.asarray(0),
            "params": abstract_state.params,
            "ema_params": abstract_state.ema_params,
            "opt_state": abstract_state.opt_state,
        }
        shapes = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(os.path.abspath(path), shapes)


def latest_step(root: str) -> Optional[int]:
    """Max-numbered `{step}.ckpt` in root, or None (reference `utils.py:387-405`)."""
    if not os.path.exists(root):
        return None
    steps = []
    for name in os.listdir(root):
        m = re.fullmatch(r"(\d+)\.ckpt", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def resume(root: str, state: Any, step: Optional[int] = None):
    """Restore into `state`; returns (state, resumed: bool).  Prefers the given
    step, else the latest numbered checkpoint, else `best.ckpt`."""
    if step is None:
        step = latest_step(root)
    if step is None:
        best = os.path.join(root, "best.ckpt") if os.path.exists(root) else None
        if best and os.path.exists(best):
            payload = load_checkpoint(best, state)
        else:
            return state, False
    else:
        payload = load_checkpoint(_ckpt_path(root, step), state)
    state = state.replace(
        step=jax.numpy.asarray(payload["step"], dtype=jax.numpy.int32),
        params=payload["params"],
        ema_params=payload["ema_params"],
        opt_state=payload["opt_state"],
    )
    return state, True
