"""Train state: params + EMA + optimizer as one jit-donatable pytree.

TPU-native re-design of the reference TrainState/EMA machinery
(reference `utils.py:339-450`):

  * the whole state is a flax struct pytree, so `train_step(state, batch) ->
    state` jits with buffer donation (in-place update on device, no host sync),
  * EMA is a fused `tree.map` polyak update inside the same jitted step
    (reference does a Python loop over named_parameters per step,
    `utils.py:339-345`),
  * frozen subtrees (the pretrained image stream of the panoptic model,
    reference `train_t2i_discrete.py:313-319`) are handled with an optax
    multi_transform mask — zero updates, no gradient memory — instead of DDP's
    find_unused_parameters workaround.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, ema_rate: float = 0.9999):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = jax.tree.map(
            lambda e, p: e * ema_rate + (1.0 - ema_rate) * p,
            self.ema_params,
            new_params,
        )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            ema_params=new_ema,
            opt_state=new_opt_state,
        )


def make_lr_schedule(base_lr: float, name: str = "customized", warmup_steps: int = -1,
                     total_steps: Optional[int] = None):
    """LR schedules (reference `utils.py:319-336`): 'customized' = linear warmup
    then constant; 'cosine' = cosine annealing."""
    if name == "customized":
        if warmup_steps > 0:
            return lambda step: base_lr * jnp.minimum(step / warmup_steps, 1.0)
        return lambda step: base_lr
    if name == "cosine":
        assert total_steps is not None
        return optax.cosine_decay_schedule(base_lr, total_steps)
    raise NotImplementedError(name)


def make_optimizer(
    name: str = "adamw",
    lr: float = 2e-4,
    weight_decay: float = 0.03,
    betas: Sequence[float] = (0.9, 0.999),
    eps: float = 1e-8,
    lr_schedule=None,
    frozen_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Optimizer factory (reference `utils.py:308-316` + config defaults).

    frozen_mask: pytree of bools (True = frozen) matching params; frozen leaves
    receive zero updates.
    """
    schedule = lr_schedule if lr_schedule is not None else lr
    if name == "adamw":
        tx = optax.adamw(
            schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
        )
    elif name == "adam":
        tx = optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)
    else:
        raise NotImplementedError(name)
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            jax.tree.map(lambda f: "frozen" if f else "train", frozen_mask),
        )
    return tx


def frozen_mask_from_prefixes(params: Any, prefixes: Sequence[str]):
    """Bool mask marking every param whose top-level module name starts with one
    of `prefixes` as frozen."""

    def mark(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        return any(any(n.startswith(p) for p in prefixes) for n in names)

    return jax.tree_util.tree_map_with_path(mark, params)


def panoptic_image_stream_mask(params: Any):
    """Frozen mask for fine-tuning the panoptic mask stream from a pretrained
    t2i model: freeze EXACTLY the image-stream modules the reference freezes
    (`train_t2i_discrete.py:313-319`) — patch/context/time embeds and the image
    blocks — and nothing of the mask stream.  Handles both the unrolled layout
    (in_blocks_{i} / mid_block / out_blocks_{i}; note `mid_block_mask` etc. must
    stay trainable) and the scanned layout (in_blocks[_dual].block)."""
    import re

    exact = {"patch_embed", "context_embed", "time_embed", "mid_block"}
    numbered = re.compile(r"^(in|out)_blocks_\d+$")

    def mark(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        top = names[0]
        if top in exact or numbered.match(top):
            return True
        if top in ("in_blocks", "out_blocks"):  # scanned image-only stacks
            return True
        if top in ("in_blocks_dual", "out_blocks_dual"):
            return len(names) > 1 and names[1] == "block"  # image half only
        return False

    return jax.tree_util.tree_map_with_path(mark, params)


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
        tx=tx,
    )
