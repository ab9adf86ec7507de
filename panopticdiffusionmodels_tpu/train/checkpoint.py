"""Checkpointing with Orbax: async-capable, sharding-aware save/resume.

Mirrors the reference's directory contract — one `{step}.ckpt` directory per
save, resume from the max-numbered step or `best.ckpt`
(reference `utils.py:367-405`) — on top of `orbax.checkpoint`, which restores
arrays directly onto their mesh shardings (no host round-trip).
"""
from __future__ import annotations

import atexit
import os
import re
import threading
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPTR: Optional[ocp.StandardCheckpointer] = None
_CKPTR_LOCK = threading.Lock()


def _ckpt_path(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"{step}.ckpt")


def _checkpointer() -> ocp.StandardCheckpointer:
    """One process-lifetime StandardCheckpointer (it IS an AsyncCheckpointer:
    `save` returns once arrays are staged on host; the directory write and
    atomic commit run on a background thread).  The per-call `with` block the
    old code used forced a full wait on every save."""
    global _CKPTR
    with _CKPTR_LOCK:
        if _CKPTR is None:
            _CKPTR = ocp.StandardCheckpointer()
            atexit.register(_CKPTR.close)  # waits for any in-flight commit
    return _CKPTR


def wait_for_saves():
    """Block until every async save has committed.  Call before reading a
    just-written checkpoint, deleting checkpoint dirs (best-FID retention),
    or letting a benchmark's timing window close."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(root: str, state: Any, step: Optional[int] = None,
                    block: bool = True):
    """Write {params, ema_params, opt_state, step} under {root}/{step}.ckpt.
    The payload step is always the state's own step counter.

    `block=False` returns as soon as the arrays are staged to host — the disk
    write overlaps subsequent train steps (the reference's torch.save blocks
    the loop for the full serialization).  A second save while one is in
    flight waits for the first inside orbax, so at most one write is ever
    pending and saves can never be reordered."""
    os.makedirs(root, exist_ok=True)
    state_step = int(state.step)
    path = _ckpt_path(root, state_step if step is None else step)
    payload = {
        "step": np.asarray(state_step),
        "params": state.params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
    }
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    if block:
        ckptr.wait_until_finished()


def load_checkpoint(path: str, abstract_state: Optional[Any] = None) -> dict:
    wait_for_saves()  # never read past an uncommitted async write
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
    wait_for_saves()
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
