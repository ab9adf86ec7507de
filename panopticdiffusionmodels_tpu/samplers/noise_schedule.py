"""Noise-schedule wrapper for DPM-Solver — a HOST-side numpy object.

TPU-first design decision: every quantity this class computes depends only on the
schedule and the (static) solver step plan, never on data.  The reference
evaluates piecewise-linear interpolation on device once per solver step
(reference `dpm_solver_pp.py:9-52,121-169`); here ALL schedule math runs once on
the host in float64 and the device program only ever sees precomputed float32
coefficient tables.  This removes per-step gather/sort work from the hot path and
makes the solver a pure `lax.scan` over constants.

Supported schedules (reference `dpm_solver_pp.py:55-169`):
  * 'discrete': betas[1..N] -> log alpha_bar via 0.5*cumsum(log(1-beta)), with
    piecewise-linear interpolation over knots t_i = i/N and linear extrapolation
    beyond the outermost knots,
  * 'linear': closed-form VP (beta_0, beta_1 scaled by 1000 as in DDPM),
  * 'cosine': improved-DDPM cosine with T = 0.9946.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np


def interp_with_extrapolation(x, xp, yp):
    """Piecewise-linear interpolation with linear extrapolation from the
    outermost segments (the behavior of reference `interpolate_fn`,
    `dpm_solver_pp.py:9-52`, without its sort/gather machinery).

    xp must be strictly monotonic (ascending or descending).
    """
    x = np.asarray(x, dtype=np.float64)
    xp = np.asarray(xp, dtype=np.float64)
    yp = np.asarray(yp, dtype=np.float64)
    if xp[0] > xp[-1]:  # descending -> flip
        xp, yp = xp[::-1], yp[::-1]
    idx = np.clip(np.searchsorted(xp, x, side="right") - 1, 0, len(xp) - 2)
    x0, x1 = xp[idx], xp[idx + 1]
    y0, y1 = yp[idx], yp[idx + 1]
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)


class NoiseScheduleVP:
    """Forward-SDE coefficient oracle: alpha_t, sigma_t, lambda_t and the inverse
    lambda -> t map.  Pure numpy float64; call only at plan-build time."""

    def __init__(
        self,
        schedule: str = "discrete",
        beta_0: float = 1e-4,
        beta_1: float = 2e-2,
        total_N: int = 1000,
        betas: Optional[np.ndarray] = None,
        alphas_cumprod: Optional[np.ndarray] = None,
    ):
        if schedule not in ("linear", "discrete", "cosine"):
            raise ValueError(f"unsupported noise schedule {schedule}")
        self.schedule = schedule
        self.total_N = total_N
        # DDPM betas are per-step; the continuous-time beta is 1000x larger.
        self.beta_0 = beta_0 * 1000.0
        self.beta_1 = beta_1 * 1000.0

        if schedule == "discrete":
            if betas is not None:
                log_alphas = 0.5 * np.cumsum(np.log(1.0 - np.asarray(betas, np.float64)))
            else:
                assert alphas_cumprod is not None
                log_alphas = 0.5 * np.log(np.asarray(alphas_cumprod, np.float64))
            self.total_N = len(log_alphas)
            self.t_discrete = np.linspace(1.0 / self.total_N, 1.0, self.total_N)
            self.log_alpha_discrete = log_alphas

        self.cosine_s = 0.008
        self.cosine_beta_max = 999.0
        self.cosine_t_max = (
            math.atan(self.cosine_beta_max * (1.0 + self.cosine_s) / math.pi)
            * 2.0
            * (1.0 + self.cosine_s)
            / math.pi
            - self.cosine_s
        )
        self.cosine_log_alpha_0 = math.log(
            math.cos(self.cosine_s / (1.0 + self.cosine_s) * math.pi / 2.0)
        )
        self.T = 0.9946 if schedule == "cosine" else 1.0

    def marginal_log_mean_coeff(self, t):
        t = np.asarray(t, dtype=np.float64)
        if self.schedule == "linear":
            return -0.25 * t ** 2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        if self.schedule == "discrete":
            return interp_with_extrapolation(t, self.t_discrete, self.log_alpha_discrete)
        # cosine
        log_alpha = np.log(
            np.cos((t + self.cosine_s) / (1.0 + self.cosine_s) * math.pi / 2.0)
        )
        return log_alpha - self.cosine_log_alpha_0

    def marginal_alpha(self, t):
        return np.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return np.sqrt(np.maximum(1.0 - np.exp(2.0 * self.marginal_log_mean_coeff(t)), 0.0))

    def marginal_lambda(self, t):
        log_mean = self.marginal_log_mean_coeff(t)
        log_std = 0.5 * np.log(1.0 - np.exp(2.0 * log_mean))
        return log_mean - log_std

    def inverse_lambda(self, lamb):
        lamb = np.asarray(lamb, dtype=np.float64)
        if self.schedule == "linear":
            tmp = (
                2.0
                * (self.beta_1 - self.beta_0)
                * np.logaddexp(-2.0 * lamb, np.zeros_like(lamb))
            )
            delta = self.beta_0 ** 2 + tmp
            return tmp / (np.sqrt(delta) + self.beta_0) / (self.beta_1 - self.beta_0)
        if self.schedule == "discrete":
            log_alpha = -0.5 * np.logaddexp(np.zeros_like(lamb), -2.0 * lamb)
            return interp_with_extrapolation(
                log_alpha, self.log_alpha_discrete, self.t_discrete
            )
        # cosine
        log_alpha = -0.5 * np.logaddexp(-2.0 * lamb, np.zeros_like(lamb))
        return (
            np.arccos(np.exp(log_alpha + self.cosine_log_alpha_0))
            * 2.0
            * (1.0 + self.cosine_s)
            / math.pi
            - self.cosine_s
        )
