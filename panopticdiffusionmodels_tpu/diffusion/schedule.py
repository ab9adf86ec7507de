"""Discrete-time diffusion schedule and panoptic co-training losses.

TPU-first re-design of the reference discrete schedule
(reference `train_t2i_discrete.py:40-224`, duplicated in
`train_ldm_discrete.py:23-91`):

  * the O(N^2) `skip_alphas`/`skip_betas` tables are precomputed ONCE on the host in
    float64 numpy (they depend only on the betas), then moved to device as float32
    constants — no per-step host work,
  * `Schedule.sample` is a pure function of a PRNG key: timestep draw, image
    noising and the 2x-std analog-bit mask noising all fuse into the training step
    under jit,
  * the losses are per-example (shape (B,)) so the caller decides how to reduce
    across the data-parallel mesh (psum/mean under pjit).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .analog_bits import ints_to_analog
from .math import stp, mos

# Std multiplier for the analog-bit mask noise: larger noise so it can flip bits
# (reference `train_t2i_discrete.py:137`).
MASK_NOISE_SCALE = 2.0


def stable_diffusion_beta_schedule(
    linear_start: float = 0.00085, linear_end: float = 0.0120, n_timestep: int = 1000
) -> np.ndarray:
    """Sqrt-linear SD beta schedule (reference `train_t2i_discrete.py:40-44`)."""
    return (
        np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep, dtype=np.float64) ** 2
    )


def get_skip(alphas: np.ndarray, betas: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Dense transition tables.

    skip_alphas[s, t] = prod(alphas[s+1 : t+1]); skip_betas[s, t] = Var[x_t | x_s].
    Host-side numpy in float64; semantics of reference `train_t2i_discrete.py:47-56`.
    """
    N = len(betas) - 1
    skip_alphas = np.ones([N + 1, N + 1], dtype=betas.dtype)
    for s in range(N + 1):
        skip_alphas[s, s + 1 :] = alphas[s + 1 :].cumprod()
    skip_betas = np.zeros([N + 1, N + 1], dtype=betas.dtype)
    for t in range(N + 1):
        prod = betas[1 : t + 1] * skip_alphas[1 : t + 1, t]
        skip_betas[:t, t] = (prod[::-1].cumsum())[::-1]
    return skip_alphas, skip_betas


class Schedule:
    """Discrete-time schedule: betas[0]=0, betas[1..N] given.

    All per-n coefficient lookups are device-side gathers from 1-D constant
    tables, so `sample` traces to a handful of fused ops.
    """

    def __init__(self, _betas: np.ndarray, build_skip_tables: bool = False):
        _betas = np.asarray(_betas, dtype=np.float64)
        self._betas = _betas
        self.betas = np.append(0.0, _betas)
        self.alphas = 1.0 - self.betas
        self.N = len(_betas)
        assert self.betas[0] == 0 and self.alphas[0] == 1

        # Only the first row of each table (cumulative coefficients) is needed on
        # the hot path; the dense tables are opt-in (tilde_beta / analysis).
        cum_alphas = np.cumprod(self.alphas)
        cum_betas = np.zeros_like(cum_alphas)
        # cum_betas[t] = sum_{k=1..t} betas[k] * prod(alphas[k+1..t])  (= skip_betas[0])
        acc = 0.0
        for t in range(1, self.N + 1):
            acc = acc * self.alphas[t] + self.betas[t]
            cum_betas[t] = acc
        self.cum_alphas = cum_alphas
        self.cum_betas = cum_betas
        with np.errstate(divide="ignore"):
            self.snr = self.cum_alphas / self.cum_betas

        self.skip_alphas: Optional[np.ndarray] = None
        self.skip_betas: Optional[np.ndarray] = None
        if build_skip_tables:
            self.skip_alphas, self.skip_betas = get_skip(self.alphas, self.betas)

        # Device-side float32 lookup tables.
        self._cum_alphas_dev = jnp.asarray(cum_alphas, dtype=jnp.float32)
        self._cum_betas_dev = jnp.asarray(cum_betas, dtype=jnp.float32)

    def tilde_beta(self, s: int, t: int) -> float:
        if self.skip_betas is None:
            self.skip_alphas, self.skip_betas = get_skip(self.alphas, self.betas)
        return self.skip_betas[s, t] * self.cum_betas[s] / self.cum_betas[t]

    def sample(self, key, x0, panoptic=None):
        """Sample n ~ U{1..N} per example and form noisy (x_n [, mask_n]).

        Returns (n, eps, xn) or (n, eps, xn, eps_m, mask_n); `panoptic` here is
        the analog-bit-encoded mask in [-1, 1] (the caller encodes), matching the
        reference flow (`train_t2i_discrete.py:157-160` encodes before sampling).
        """
        key_n, key_eps, key_eps_m = jax.random.split(key, 3)
        n = jax.random.randint(key_n, (x0.shape[0],), 1, self.N + 1)
        eps = jax.random.normal(key_eps, x0.shape, dtype=x0.dtype)
        a = jnp.sqrt(self._cum_alphas_dev[n]).astype(x0.dtype)
        b = jnp.sqrt(self._cum_betas_dev[n]).astype(x0.dtype)
        xn = stp(a, x0) + stp(b, eps)
        if panoptic is None:
            return n, eps, xn
        eps_m = MASK_NOISE_SCALE * jax.random.normal(
            key_eps_m, panoptic.shape, dtype=panoptic.dtype
        )
        mask_n = stp(a.astype(panoptic.dtype), panoptic) + stp(
            b.astype(panoptic.dtype), eps_m
        )
        return n, eps, xn, eps_m, mask_n

    def __repr__(self):
        return f"Schedule({self.betas[:5]}..., N={self.N})"


def l_simple(key, x0, nnet_fn: Callable, schedule: Schedule, **kwargs):
    """Per-example noise-prediction MSE for the non-panoptic discrete models
    (reference `train_t2i_discrete.py:148-151`, `train_ldm_discrete.py` analogue)."""
    n, eps, xn = schedule.sample(key, x0)
    eps_pred = nnet_fn(xn, n.astype(x0.dtype), **kwargs)
    return mos(eps - eps_pred)


def l_simple_panoptic(
    key,
    x0,
    nnet_fn: Callable,
    schedule: Schedule,
    panoptic,
    mask_bits: int = 8,
    use_ground_truth: bool = False,
    use_twophases: bool = False,
):
    """Joint image + panoptic-mask loss: (loss_eps, loss_mask), each shape (B,).

    `panoptic` is the integer category-id map (B, H, W, 1); it is analog-bit
    encoded here (reference `train_t2i_discrete.py:157-160`).  `nnet_fn` must
    accept (xn, n, mask_token=..., use_ground_truth=...) and return
    (eps_pred, mask_pred).

    Static-config notes vs. the reference:
      * the reference's `mask_gt = random() < p_uncond` branch
        (`train_t2i_discrete.py:163-166`) passes an extra `mask_0` argument that
        the network never uses (the `mask_embed_0` addition is commented out,
        `libs/uvit_t2i.py:391-396`), so the branch is observationally identical to
        the default path and is not replicated;
      * `use_ground_truth`/`use_twophases` are static config, not runtime flags.
    """
    scaled_panoptic = ints_to_analog(panoptic, n=mask_bits, dtype=x0.dtype)
    n, eps, xn, eps_m, mask_n = schedule.sample(key, x0, scaled_panoptic)
    if use_ground_truth:
        eps_pred, mask_pred = nnet_fn(
            xn, n.astype(x0.dtype), mask_token=scaled_panoptic, use_ground_truth=True
        )
    else:
        eps_pred, mask_pred = nnet_fn(
            xn, n.astype(x0.dtype), mask_token=mask_n, use_ground_truth=False
        )
    loss_eps = mos(eps - eps_pred)
    if use_twophases and not use_ground_truth:
        # Phase two: same noisy image, ground-truth mask features merged in;
        # average the two eps losses (reference `train_t2i_discrete.py:183-192,
        # 221-224`).
        eps_pred2, _ = nnet_fn(
            xn, n.astype(x0.dtype), mask_token=scaled_panoptic, use_ground_truth=True
        )
        loss_eps = 0.5 * (loss_eps + mos(eps - eps_pred2))
    if use_ground_truth:
        loss_mask = loss_eps
    else:
        # x0-style analog-bit regression target (reference `train_t2i_discrete.py:209`).
        loss_mask = mos(mask_pred - scaled_panoptic)
    return loss_eps, loss_mask
