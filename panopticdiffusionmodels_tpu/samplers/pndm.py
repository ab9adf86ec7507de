"""PNDM / PLMS sampler for the pretrained-UNet family.

The reference samples its `use_unet=True` path with Stable Diffusion's
`PNDMScheduler` (reference `train_t2i_discrete.py:525-534`, SD-1.5 scheduler
config: 1000 train steps, scaled-linear betas 0.00085->0.012,
`skip_prk_steps=True`, `set_alpha_to_one=False`, `steps_offset=1`,
epsilon prediction).  With `skip_prk_steps=True` PNDM degenerates to PLMS: a
4th-order Adams-Bashforth linear multistep on the epsilon history with a
counter-dependent warm-up for the first three steps.

TPU-native structure: everything counter-dependent is PLANNED ON HOST into
static per-step tables (timestep pair, 4 multistep coefficients, two flags);
the device side is ONE `lax.scan` whose carry is `(x, eps_history[4],
cur_sample)` — no per-step host sync, no data-dependent control flow.

The reference's panoptic UNet loop passes a FIXED `mask_token` every NFE and
keeps the last `pred_mask` (`train_t2i_discrete.py:528-534` never updates
`mask_token`); `pndm_sample` reproduces exactly that contract when the model
returns a `(noise_pred, pred_mask)` pair.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PNDMPlan(NamedTuple):
    """Host-side static plan: one row per model evaluation."""

    timesteps: np.ndarray      # int32 (K,)   t fed to the model
    ts_used: np.ndarray        # int32 (K,)   t used in the update (counter==1 shifts it)
    prev_ts: np.ndarray        # int32 (K,)   t' of the update target
    coeffs: np.ndarray         # f64 (K, 4)   weights over eps history [e_t, e_{t-1}, ...]
    use_cur_sample: np.ndarray  # bool (K,)   step 1 restarts from the saved sample
    store_et: np.ndarray       # bool (K,)    push model output into the history


def make_pndm_plan(num_inference_steps: int, num_train_timesteps: int = 1000,
                   steps_offset: int = 1) -> PNDMPlan:
    """PLMS plan equal to diffusers' PNDMScheduler.set_timesteps +
    step_plms counter logic with skip_prk_steps=True."""
    step_ratio = num_train_timesteps // num_inference_steps
    base = (np.arange(0, num_inference_steps) * step_ratio).round().astype(np.int64)
    base = base + steps_offset
    # skip_prk_steps=True: duplicate the second-to-last timestep, reverse.
    plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()

    K = len(plms)
    ts_used = plms.copy()
    prev_ts = plms - step_ratio
    coeffs = np.zeros((K, 4))
    use_cur = np.zeros(K, bool)
    store = np.ones(K, bool)
    n_ets = 0
    for counter, t in enumerate(plms):
        if counter != 1:
            n_ets = min(n_ets, 3) + 1
        else:
            # counter==1: re-do the first interval from the saved sample with
            # the trapezoidal (Heun) average of the two epsilons.
            prev_ts[counter] = t
            ts_used[counter] = t + step_ratio
            store[counter] = False
            use_cur[counter] = True
        if n_ets == 1 and counter == 0:
            coeffs[counter] = [1.0, 0, 0, 0]
        elif n_ets == 1 and counter == 1:
            coeffs[counter] = [0.5, 0.5, 0, 0]  # (new + ets[-1]) / 2
        elif n_ets == 2:
            coeffs[counter] = [3 / 2, -1 / 2, 0, 0]
        elif n_ets == 3:
            coeffs[counter] = [23 / 12, -16 / 12, 5 / 12, 0]
        else:
            coeffs[counter] = [55 / 24, -59 / 24, 37 / 24, -9 / 24]
    return PNDMPlan(plms.astype(np.int32), ts_used.astype(np.int32),
                    prev_ts.astype(np.int32), coeffs, use_cur, store)


def pndm_sample(
    model_fn: Callable,
    x: jax.Array,
    steps: int,
    alphas_cumprod: np.ndarray,
    num_train_timesteps: int = 1000,
    steps_offset: int = 1,
    mask_token: Optional[jax.Array] = None,
):
    """Run the PLMS loop under one jit.

    model_fn(x, t_int[, mask_token]) -> eps  (or (eps, pred_mask) when
    mask_token is given).  `alphas_cumprod` is the 1000-entry training table
    (f64 host numpy; solver arithmetic stays f32 on device).
    Returns x0-domain latents x (plus the final pred_mask when panoptic).
    """
    plan = make_pndm_plan(steps, num_train_timesteps, steps_offset)
    acp = np.asarray(alphas_cumprod, np.float64)
    final_acp = acp[0]  # set_alpha_to_one=False

    def gather_acp(ts):
        out = np.empty(len(ts))
        for i, t in enumerate(ts):
            out[i] = acp[t] if t >= 0 else final_acp
        return out

    a_t = gather_acp(plan.ts_used)
    a_prev = gather_acp(plan.prev_ts)
    # diffusers _get_prev_sample, epsilon prediction:
    #   x' = sqrt(a'/a) x - (a' - a) eps / [ a sqrt(1-a') + sqrt(a (1-a) a') ]
    sample_coeff = np.sqrt(a_prev / a_t)
    denom = a_t * np.sqrt(1.0 - a_prev) + np.sqrt(a_t * (1.0 - a_t) * a_prev)
    eps_coeff = (a_prev - a_t) / denom

    xs = {
        "t": jnp.asarray(plan.timesteps, jnp.int32),
        "coeffs": jnp.asarray(plan.coeffs, jnp.float32),
        "sample_coeff": jnp.asarray(sample_coeff, jnp.float32),
        "eps_coeff": jnp.asarray(eps_coeff, jnp.float32),
        "use_cur": jnp.asarray(plan.use_cur_sample),
        "store": jnp.asarray(plan.store_et),
    }

    panoptic = mask_token is not None

    def step(carry, row):
        x, ets, cur, pm = carry
        t = jnp.full((x.shape[0],), row["t"], jnp.float32)
        if panoptic:
            eps, pm = model_fn(x, t, mask_token=mask_token)
            pm = pm.astype(jnp.float32)  # keep the scan carry f32 (bf16 nets)
        else:
            eps = model_fn(x, t)
        eps = eps.astype(jnp.float32)
        # history as seen by the update: fresh eps at slot 0, shifted past
        # behind it; it is persisted into the carry only when store=True
        # (counter==1 blends without recording, diffusers step_plms).
        hist = jnp.concatenate([eps[None], ets[:-1]], axis=0)
        new_ets = jnp.where(row["store"], hist, ets)
        model_out = jnp.tensordot(row["coeffs"], hist, axes=1)
        # On the PLMS warm-up's second half-step the update operand is the
        # SAVED cur_sample, not x (diffusers step_plms semantics); that same
        # selection doubles as the carried cur for the next step (step 0
        # stores its input x into cur).
        base = jnp.where(row["use_cur"], cur, x)
        x_next = row["sample_coeff"] * base - row["eps_coeff"] * model_out
        return (x_next.astype(x.dtype), new_ets, base, pm), None

    ets0 = jnp.zeros((4, *x.shape), jnp.float32)
    # f32 carry like eps: a bf16-compute network must not narrow the scan
    # carry (same discipline as dpm_solver._net)
    pm0 = (jnp.zeros(jnp.shape(mask_token), jnp.float32) if panoptic
           else jnp.zeros((), jnp.float32))
    (x, _, _, pm), _ = jax.lax.scan(step, (x, ets0, jnp.asarray(x, jnp.float32), pm0), xs)
    if panoptic:
        return x, pm
    return x
