"""Mask-aware DPM-Solver / DPM-Solver++ as a single jittable tensor program.

TPU-first re-design of the reference solver (reference `dpm_solver_pp.py:291-1081`
and the upstream `dpm_solver_pytorch.py`):

  * ALL schedule math (timesteps, lambdas, alphas, sigmas, phi terms, r1/r2) is
    precomputed on the host in float64 — the device program is a `lax.scan` over
    stacked float32 coefficient tables, one scan per run of equal-order steps.
    The reference instead re-evaluates interpolation on device and syncs with the
    Python loop every step (`dpm_solver_pp.py:1031-1043`);
  * the (x, pred_mask, mask_t) triple is the scan carry — the joint image+mask
    trajectory of the panoptic model threads through with zero host round-trips;
  * the whole sampler (all scans, every model call, and optionally the VAE
    decode) jits into ONE XLA executable.

Numerics: image-channel updates replicate the reference formulas exactly (same
phi/sign conventions); the mask channel replicates the reference's published
behavior including its `mask_s1`/`mask_s2` intermediate sign convention
(see SURVEY.md §2.3 "mask-stream sign inconsistency"), which we keep because it
is what generated the paper's results.

Supported methods: 'fast' (mixed-order, recommended), 'singlestep' (uniform
order), 'multistep' (Adams-style, image only), 'adaptive' (host-driven, image
only, dynamic NFE).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .noise_schedule import NoiseScheduleVP


def _bcast(c, x):
    """Broadcast a per-step scalar coefficient over an image tensor."""
    return jnp.asarray(c, dtype=x.dtype)


def get_time_steps(ns: NoiseScheduleVP, skip_type: str, t_T: float, t_0: float, N: int):
    """Host-side step grid (reference `dpm_solver_pp.py:330-363`)."""
    if skip_type == "logSNR":
        lambda_T = ns.marginal_lambda(t_T)
        lambda_0 = ns.marginal_lambda(t_0)
        logsnr_steps = np.linspace(lambda_T, lambda_0, N + 1)
        return ns.inverse_lambda(logsnr_steps)
    if skip_type == "time_uniform":
        return np.linspace(t_T, t_0, N + 1)
    if skip_type == "t2":
        t_order = 2
        return np.linspace(t_T ** (1.0 / t_order), t_0 ** (1.0 / t_order), N + 1) ** t_order
    if skip_type == "time_quadratic":
        t = np.linspace(t_0, t_T, 10_000_000)
        quadratic_t = np.sqrt(t)
        quadratic_steps = np.linspace(quadratic_t[0], quadratic_t[-1], N + 1)
        picked = t[np.searchsorted(quadratic_t, quadratic_steps)[:-1]]
        return np.concatenate([picked, [t_T]])[::-1].copy()
    raise ValueError(f"unsupported skip_type {skip_type}")


def get_orders_for_fast(steps: int, order: int) -> List[int]:
    """Mixed-order plan of DPM-Solver-fast (reference `dpm_solver_pp.py:365-405`)."""
    if order == 3:
        K = steps // 3 + 1
        if steps % 3 == 0:
            return [3] * (K - 2) + [2, 1]
        if steps % 3 == 1:
            return [3] * (K - 1) + [1]
        return [3] * (K - 1) + [2]
    if order == 2:
        K = steps // 2
        return [2] * K if steps % 2 == 0 else [2] * K + [1]
    raise ValueError("fast method requires order >= 2")


@dataclasses.dataclass
class StepCoeffs:
    """Float64 host coefficients for one solver step; stacked before scanning."""

    order: int
    data: dict  # name -> float


def _step_coeffs(ns: NoiseScheduleVP, s: float, t: float, order: int,
                 r1: Optional[float], r2: Optional[float], predict_x0: bool) -> StepCoeffs:
    lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
    h = lam_t - lam_s
    log_a_s, log_a_t = ns.marginal_log_mean_coeff(s), ns.marginal_log_mean_coeff(t)
    sig_s, sig_t = ns.marginal_std(s), ns.marginal_std(t)
    alpha_s, alpha_t = np.exp(log_a_s), np.exp(log_a_t)
    d = dict(
        s=s, t=t, h=h,
        sigma_s=sig_s, sigma_t=sig_t, alpha_s=alpha_s, alpha_t=alpha_t,
        log_alpha_s=log_a_s, log_alpha_t=log_a_t,
    )
    if order >= 2:
        r1 = 0.5 if (order == 2 and r1 is None) else (1.0 / 3.0 if r1 is None else r1)
        lam_s1 = lam_s + r1 * h
        s1 = float(ns.inverse_lambda(lam_s1))
        d.update(
            r1=r1, s1=s1,
            sigma_s1=ns.marginal_std(s1),
            alpha_s1=np.exp(ns.marginal_log_mean_coeff(s1)),
            log_alpha_s1=ns.marginal_log_mean_coeff(s1),
        )
    if order >= 3:
        r2 = 2.0 / 3.0 if r2 is None else r2
        lam_s2 = lam_s + r2 * h
        s2 = float(ns.inverse_lambda(lam_s2))
        d.update(
            r2=r2, s2=s2,
            sigma_s2=ns.marginal_std(s2),
            alpha_s2=np.exp(ns.marginal_log_mean_coeff(s2)),
            log_alpha_s2=ns.marginal_log_mean_coeff(s2),
        )
    # phi terms (reference dpm_solver_pp.py:441,524-525,713-718 / their eps-pred duals)
    if predict_x0:
        d["phi_1"] = np.expm1(-h)
        if order >= 2:
            d["phi_11"] = np.expm1(-r1 * h)
            d["phi_2"] = d["phi_1"] / h + 1.0
        if order >= 3:
            d["phi_12"] = np.expm1(-r2 * h)
            d["phi_22"] = np.expm1(-r2 * h) / (r2 * h) + 1.0
            d["phi_3"] = d["phi_2"] / h - 0.5
    else:
        d["phi_1"] = np.expm1(h)
        if order >= 2:
            d["phi_11"] = np.expm1(r1 * h)
            d["phi_2"] = d["phi_1"] / h - 1.0
        if order >= 3:
            d["phi_12"] = np.expm1(r2 * h)
            d["phi_22"] = np.expm1(r2 * h) / (r2 * h) - 1.0
            d["phi_3"] = d["phi_2"] / h - 0.5
    return StepCoeffs(order=order, data=d)


def _stack_coeffs(steps: Sequence[StepCoeffs]) -> dict:
    keys = steps[0].data.keys()
    return {k: jnp.asarray([sc.data[k] for sc in steps], dtype=jnp.float32) for k in keys}


class DPMSolver:
    """DPM-Solver(++) with joint image+mask trajectories.

    `model_fn(x, t_vec, mask_token=None) -> noise | (noise, pred_mask)` is the
    (CFG-wrapped) network in NOISE-prediction convention on continuous time
    t in (0, 1]; conversion to x0-prediction happens inside using precomputed
    alpha/sigma (reference `dpm_solver_pp.py:310-328`).
    """

    def __init__(
        self,
        model_fn: Callable,
        noise_schedule: NoiseScheduleVP,
        predict_x0: bool = True,
        thresholding: bool = False,
        max_val: float = 1.0,
        solver_type: str = "dpm_solver",
        accel_tau: float = 0.0,
        cfg_interval: Optional[Tuple[float, float]] = None,
        mask_guidance_hold: bool = False,
    ):
        assert solver_type in ("dpm_solver", "taylor")
        self.model = model_fn
        self.ns = noise_schedule
        self.predict_x0 = predict_x0
        self.thresholding = thresholding
        self.max_val = max_val
        self.solver_type = solver_type
        # Forecast-skip acceleration (opt-in, quality-affecting): when the
        # logSNR advance since the last REAL network eval is <= accel_tau,
        # replace the eval with a linear extrapolation (in lambda) of the last
        # two real outputs, carried through the scan (PAPERS.md: "Predict to
        # Skip" linear multistep feature forecasting; the x0-parameterization
        # is smooth in lambda, so the extrapolation IS the solver's own local
        # model of the trajectory).  0.0 disables (the exact FID protocol).
        self.accel_tau = float(accel_tau)
        # Guidance interval (opt-in, protocol-changing): restrict CFG to model
        # times t in [lo, hi] (arXiv:2404.07724).  Outside the interval the
        # model is called with a STATIC cfg_on=False keyword, and the CFG
        # wrappers in diffusion/cfg.py then run a single cond-only forward —
        # half the network FLOPs for those steps.  The flag is resolved per
        # solver step from the step's start time s at plan-build time, so it
        # only splits the host-side scan groups; nothing dynamic on device.
        # None disables (model_fn is never passed the keyword).
        if cfg_interval is None:
            self.cfg_interval = None
        else:
            if len(cfg_interval) != 2:
                raise ValueError(
                    f"cfg_interval must be (lo, hi), got {tuple(cfg_interval)}"
                )
            lo, hi = float(cfg_interval[0]), float(cfg_interval[1])
            if lo > hi:
                raise ValueError(
                    f"cfg_interval lo must be <= hi, got ({lo}, {hi}) — a reversed"
                    " interval would silently disable guidance at every step"
                )
            self.cfg_interval = (lo, hi)
        # Mask-hold guidance (opt-in, panoptic + cfg_interval only): during
        # cfg_on=False steps the plain interval mode leaves the mask stream
        # cond-only, which the round-3 trained distribution gate showed drifts
        # the mask-id distribution 4.7-10.3x the seed floor (the reference
        # extrapolates the mask at EVERY step, train_t2i_discrete.py:429).
        # With the hold, the CFG wrapper's guidance correction
        # scale*(m_c - m_u) is cached at each guided eval (requires a model_fn
        # accepting want_mask_delta=True, see diffusion/cfg.py) and re-applied
        # additively to the cond-only mask prediction during unguided steps —
        # the correction is smooth in lambda, so a zero-order hold across the
        # interval boundary is far closer to the every-step protocol than
        # dropping it.  Image stream is untouched.
        self.mask_guidance_hold = bool(mask_guidance_hold)
        if self.mask_guidance_hold and self.cfg_interval is None:
            raise ValueError(
                "mask_guidance_hold requires cfg_interval — without an "
                "interval every step is guided and there is nothing to hold"
            )

    # --- device-side pieces -------------------------------------------------

    def _net(self, x, t: Any, sigma_t, alpha_t, mask_token, cfg_on: bool = True):
        """One real network eval; in predict_x0 mode convert noise -> x0 using
        the host-precomputed (sigma_t, alpha_t) for this model time.  Returns
        (out, pred_mask, gd): gd is the CFG mask-guidance delta when the
        mask-hold mode is active on a guided step, else None."""
        t_vec = jnp.full((x.shape[0],), t, dtype=x.dtype)
        kw = {} if self.cfg_interval is None else {"cfg_on": cfg_on}
        gd = None
        if mask_token is None:
            out = self.model(x, t_vec, **kw)
            noise, pred_mask = (out if isinstance(out, tuple) else (out, None))
        elif self.mask_guidance_hold and cfg_on:
            noise, pred_mask, gd = self.model(
                x, t_vec, mask_token=mask_token, want_mask_delta=True, **kw
            )
            gd = gd.astype(x.dtype)
        else:
            noise, pred_mask = self.model(x, t_vec, mask_token=mask_token, **kw)
        # Solver state stays in the caller's dtype (f32): a bf16-compute network
        # must not narrow the scan carry or the update numerics.
        noise = noise.astype(x.dtype)
        if pred_mask is not None:
            pred_mask = pred_mask.astype(x.dtype)
        if not self.predict_x0:
            return noise, pred_mask, gd
        x0 = (x - _bcast(sigma_t, x) * noise) / _bcast(alpha_t, x)
        if self.thresholding:
            p = 0.995
            s = jnp.quantile(
                jnp.abs(x0).reshape(x0.shape[0], -1), p, axis=1
            )
            s = jnp.maximum(s, 1.0).reshape(-1, *([1] * (x0.ndim - 1)))
            x0 = jnp.clip(x0, -s, s) / (s / self.max_val)
        return x0, pred_mask, gd

    def init_forecast(self, x, mask_token):
        """Initial solver cache carry: forecast-skip entries when accel_tau is
        on, plus the held mask-guidance delta 'gd' when mask_guidance_hold is
        on.  None when neither mode needs state."""
        fc = {}
        if self.accel_tau:
            fc.update({
                "y1": jnp.zeros_like(x), "y2": jnp.zeros_like(x),
                "lam1": jnp.zeros((), x.dtype), "lam2": jnp.zeros((), x.dtype),
                "k": jnp.zeros((), jnp.int32),
            })
            if mask_token is not None:
                fc["m1"] = jnp.zeros_like(mask_token)
                fc["m2"] = jnp.zeros_like(mask_token)
        if self.mask_guidance_hold and mask_token is not None:
            # zeros = no correction until the first guided eval fills it, which
            # is exactly the plain-interval behavior for a leading cfg-off run.
            fc["gd"] = jnp.zeros_like(mask_token)
        return fc or None

    def _call_model(self, x, t: Any, sigma_t, alpha_t, mask_token, fc=None,
                    cfg_on: bool = True):
        """Network eval with optional forecast-skip and mask-guidance hold.
        Returns (out, pred_mask, fc').  lambda at the eval point comes from the
        traced (sigma, alpha) scalars, so no extra coefficient tables are
        needed."""
        if fc is None:
            out, pred_mask, _ = self._net(x, t, sigma_t, alpha_t, mask_token, cfg_on)
            return out, pred_mask, None

        has_mask = mask_token is not None
        hold = has_mask and "gd" in fc

        def real_eval(cache):
            """One true network eval + mask-hold bookkeeping.  cfg_on is
            STATIC (host-resolved per scan group), so the branch is free."""
            out, pm, gd = self._net(x, t, sigma_t, alpha_t, mask_token, cfg_on)
            new = dict(cache)
            if hold:
                if cfg_on:
                    new["gd"] = gd
                else:
                    pm = pm + cache["gd"]
            return out, pm, new

        if not self.accel_tau:
            return real_eval(fc)

        lam = (jnp.log(_bcast(alpha_t, jnp.zeros(())))
               - jnp.log(_bcast(sigma_t, jnp.zeros(())))).astype(x.dtype)

        def real(_):
            out, pm, new = real_eval(fc)
            # m1/m2 cache the HELD-corrected mask outputs: the forecast then
            # extrapolates the same trajectory the solver integrates.
            new.update({"y1": out, "y2": fc["y1"], "lam1": lam,
                        "lam2": fc["lam1"], "k": fc["k"] + 1})
            if has_mask:
                new["m1"], new["m2"] = pm, fc["m1"]
            return (out, pm, new) if has_mask else (out, new)

        def skip(_):
            w = (lam - fc["lam1"]) / (fc["lam1"] - fc["lam2"])
            out = fc["y1"] + _bcast(w, x) * (fc["y1"] - fc["y2"])
            if has_mask:
                pm = fc["m1"] + _bcast(w, fc["m1"]) * (fc["m1"] - fc["m2"])
                return out, pm, dict(fc)
            return out, dict(fc)

        use_skip = jnp.logical_and(fc["k"] >= 2, (lam - fc["lam1"]) <= self.accel_tau)
        res = jax.lax.cond(use_skip, skip, real, operand=None)
        if has_mask:
            return res
        out, new_fc = res
        return out, None, new_fc

    def _memo_eval(self, evals, tag, *args):
        """Memoized _call_model for the adaptive pair: the lower- and
        higher-order candidate steps share their common evaluations (the
        upstream reference passes lower_noise_kwargs into the higher update
        for the same reason).  evals=None (every non-adaptive path) is a
        plain call."""
        if evals is not None and tag in evals:
            return evals[tag]
        res = self._call_model(*args)
        if evals is not None:
            evals[tag] = res
        return res

    def _first_update(self, x, c, mask_t, mask_on: bool, fc=None, cfg_on: bool = True,
                      evals=None):
        """Order-1 step (reference `dpm_solver_pp.py:420-494`)."""
        noise_s, pred_mask, fc = self._memo_eval(evals, "s", x, c["s"], c["sigma_s"], c["alpha_s"], mask_t, fc, cfg_on)
        if self.predict_x0:
            # phi_1 here is (e^{-h}-1)/(-1) = -expm1(-h) in the reference (:441);
            # our precomputed phi_1 = expm1(-h), so negate.
            phi_1 = -c["phi_1"]
            x_t = _bcast(c["sigma_t"] / c["sigma_s"], x) * x + _bcast(
                c["alpha_t"] * phi_1, x
            ) * noise_s
            if mask_on:
                mask_next = _bcast(c["sigma_t"] / c["sigma_s"], mask_t) * mask_t + _bcast(
                    c["alpha_t"] * phi_1, mask_t
                ) * pred_mask
            else:
                mask_next = mask_t
        else:
            x_t = (
                _bcast(jnp.exp(c["log_alpha_t"] - c["log_alpha_s"]), x) * x
                - _bcast(c["sigma_t"] * c["phi_1"], x) * noise_s
            )
            mask_next = mask_t
        return x_t, pred_mask, mask_next, fc

    def _second_update(self, x, c, mask_t, mask_on: bool, fc=None, cfg_on: bool = True,
                      evals=None):
        """Order-2 step, 'dpm_solver' type (reference `dpm_solver_pp.py:496-599`)."""
        noise_s, pred_mask, fc = self._memo_eval(evals, "s", x, c["s"], c["sigma_s"], c["alpha_s"], mask_t, fc, cfg_on)
        if self.predict_x0:
            x_s1 = (
                _bcast(c["sigma_s1"] / c["sigma_s"], x) * x
                - _bcast(c["alpha_s1"] * c["phi_11"], x) * noise_s
            )
            if mask_on:
                # NOTE: '+' on the intermediate mask step is the reference's own
                # convention (`dpm_solver_pp.py:536-539`), opposite the image sign.
                mask_s1 = (
                    _bcast(c["sigma_s1"] / c["sigma_s"], mask_t) * mask_t
                    + _bcast(c["alpha_s1"] * c["phi_11"], mask_t) * pred_mask
                )
            else:
                mask_s1 = mask_t
            noise_s1, pred_mask_s1, fc = self._memo_eval(
                evals, "s1", x_s1, c["s1"], c["sigma_s1"], c["alpha_s1"],
                mask_s1 if mask_t is not None else None, fc, cfg_on,
            )
            if self.solver_type == "taylor":
                # reference `dpm_solver_pp.py:559-564`
                x_t = (
                    _bcast(c["sigma_t"] / c["sigma_s"], x) * x
                    - _bcast(c["alpha_t"] * c["phi_1"], x) * noise_s
                    + _bcast((1.0 / c["r1"]) * c["alpha_t"] * c["phi_2"], x)
                    * (noise_s1 - noise_s)
                )
            else:
                x_t = (
                    _bcast(c["sigma_t"] / c["sigma_s"], x) * x
                    - _bcast(c["alpha_t"] * c["phi_1"], x) * noise_s
                    - _bcast((0.5 / c["r1"]) * c["alpha_t"] * c["phi_1"], x)
                    * (noise_s1 - noise_s)
                )
            if mask_on:
                mask_next = (
                    _bcast(c["sigma_t"] / c["sigma_s"], mask_t) * mask_t
                    - _bcast(c["alpha_t"] * c["phi_1"], mask_t) * pred_mask
                    - _bcast((0.5 / c["r1"]) * c["alpha_t"] * c["phi_1"], mask_t)
                    * (pred_mask_s1 - pred_mask)
                )
            else:
                mask_next = mask_t
        else:
            x_s1 = (
                _bcast(jnp.exp(c["log_alpha_s1"] - c["log_alpha_s"]), x) * x
                - _bcast(c["sigma_s1"] * c["phi_11"], x) * noise_s
            )
            noise_s1, _, fc = self._memo_eval(
                evals, "s1", x_s1, c["s1"], c["sigma_s1"], c["alpha_s1"], mask_t, fc, cfg_on
            )
            if self.solver_type == "taylor":
                # reference `dpm_solver_pp.py:584-589`
                x_t = (
                    _bcast(jnp.exp(c["log_alpha_t"] - c["log_alpha_s"]), x) * x
                    - _bcast(c["sigma_t"] * c["phi_1"], x) * noise_s
                    - _bcast((1.0 / c["r1"]) * c["sigma_t"] * c["phi_2"], x)
                    * (noise_s1 - noise_s)
                )
            else:
                x_t = (
                    _bcast(jnp.exp(c["log_alpha_t"] - c["log_alpha_s"]), x) * x
                    - _bcast(c["sigma_t"] * c["phi_1"], x) * noise_s
                    - _bcast((0.5 / c["r1"]) * c["sigma_t"] * c["phi_1"], x)
                    * (noise_s1 - noise_s)
                )
            mask_next = mask_t
        return x_t, pred_mask, mask_next, fc

    def _third_update(self, x, c, mask_t, mask_on: bool, fc=None, cfg_on: bool = True,
                      evals=None):
        """Order-3 step, 'dpm_solver' type (reference `dpm_solver_pp.py:679-829`)."""
        noise_s, pred_mask, fc = self._memo_eval(evals, "s", x, c["s"], c["sigma_s"], c["alpha_s"], mask_t, fc, cfg_on)
        if self.predict_x0:
            x_s1 = (
                _bcast(c["sigma_s1"] / c["sigma_s"], x) * x
                - _bcast(c["alpha_s1"] * c["phi_11"], x) * noise_s
            )
            if mask_on:
                # Reference sign convention (`dpm_solver_pp.py:730-733`).
                mask_s1 = (
                    _bcast(c["sigma_s1"] / c["sigma_s"], mask_t) * mask_t
                    + _bcast(c["alpha_s1"] * c["phi_11"], mask_t) * pred_mask
                )
            else:
                mask_s1 = mask_t
            noise_s1, pred_mask_s1, fc = self._memo_eval(
                evals, "s1", x_s1, c["s1"], c["sigma_s1"], c["alpha_s1"],
                mask_s1 if mask_t is not None else None, fc, cfg_on,
            )
            x_s2 = (
                _bcast(c["sigma_s2"] / c["sigma_s"], x) * x
                - _bcast(c["alpha_s2"] * c["phi_12"], x) * noise_s
                + _bcast((c["r2"] / c["r1"]) * c["alpha_s2"] * c["phi_22"], x)
                * (noise_s1 - noise_s)
            )
            if mask_on:
                mask_s2 = (
                    _bcast(c["sigma_s2"] / c["sigma_s"], mask_t) * mask_t
                    - _bcast(c["alpha_s2"] * c["phi_12"], mask_t) * pred_mask
                    + _bcast((c["r2"] / c["r1"]) * c["alpha_s2"] * c["phi_22"], mask_t)
                    * (pred_mask_s1 - pred_mask)
                )
            else:
                mask_s2 = mask_t
            noise_s2, pred_mask_s2, fc = self._memo_eval(
                evals, "s2", x_s2, c["s2"], c["sigma_s2"], c["alpha_s2"],
                mask_s2 if mask_t is not None else None, fc, cfg_on,
            )
            if self.solver_type == "taylor":
                # reference `dpm_solver_pp.py:767-777`
                d1_0 = _bcast(1.0 / c["r1"], x) * (noise_s1 - noise_s)
                d1_1 = _bcast(1.0 / c["r2"], x) * (noise_s2 - noise_s)
                rdiff = c["r2"] - c["r1"]
                d1 = (_bcast(c["r2"], x) * d1_0 - _bcast(c["r1"], x) * d1_1) / _bcast(rdiff, x)
                d2 = 2.0 * (d1_1 - d1_0) / _bcast(rdiff, x)
                x_t = (
                    _bcast(c["sigma_t"] / c["sigma_s"], x) * x
                    - _bcast(c["alpha_t"] * c["phi_1"], x) * noise_s
                    + _bcast(c["alpha_t"] * c["phi_2"], x) * d1
                    - _bcast(c["alpha_t"] * c["phi_3"], x) * d2
                )
            else:
                x_t = (
                    _bcast(c["sigma_t"] / c["sigma_s"], x) * x
                    - _bcast(c["alpha_t"] * c["phi_1"], x) * noise_s
                    + _bcast((1.0 / c["r2"]) * c["alpha_t"] * c["phi_2"], x)
                    * (noise_s2 - noise_s)
                )
            if mask_on:
                mask_next = (
                    _bcast(c["sigma_t"] / c["sigma_s"], mask_t) * mask_t
                    - _bcast(c["alpha_t"] * c["phi_1"], mask_t) * pred_mask
                    + _bcast((1.0 / c["r2"]) * c["alpha_t"] * c["phi_2"], mask_t)
                    * (pred_mask_s2 - pred_mask)
                )
            else:
                mask_next = mask_t
        else:
            x_s1 = (
                _bcast(jnp.exp(c["log_alpha_s1"] - c["log_alpha_s"]), x) * x
                - _bcast(c["sigma_s1"] * c["phi_11"], x) * noise_s
            )
            noise_s1, _, fc = self._memo_eval(evals, "s1", x_s1, c["s1"], c["sigma_s1"], c["alpha_s1"], mask_t, fc, cfg_on)
            x_s2 = (
                _bcast(jnp.exp(c["log_alpha_s2"] - c["log_alpha_s"]), x) * x
                - _bcast(c["sigma_s2"] * c["phi_12"], x) * noise_s
                - _bcast((c["r2"] / c["r1"]) * c["sigma_s2"] * c["phi_22"], x)
                * (noise_s1 - noise_s)
            )
            noise_s2, _, fc = self._memo_eval(evals, "s2", x_s2, c["s2"], c["sigma_s2"], c["alpha_s2"], mask_t, fc, cfg_on)
            if self.solver_type == "taylor":
                # reference `dpm_solver_pp.py:809-819`
                d1_0 = _bcast(1.0 / c["r1"], x) * (noise_s1 - noise_s)
                d1_1 = _bcast(1.0 / c["r2"], x) * (noise_s2 - noise_s)
                rdiff = c["r2"] - c["r1"]
                d1 = (_bcast(c["r2"], x) * d1_0 - _bcast(c["r1"], x) * d1_1) / _bcast(rdiff, x)
                d2 = 2.0 * (d1_1 - d1_0) / _bcast(rdiff, x)
                x_t = (
                    _bcast(jnp.exp(c["log_alpha_t"] - c["log_alpha_s"]), x) * x
                    - _bcast(c["sigma_t"] * c["phi_1"], x) * noise_s
                    - _bcast(c["sigma_t"] * c["phi_2"], x) * d1
                    - _bcast(c["sigma_t"] * c["phi_3"], x) * d2
                )
            else:
                x_t = (
                    _bcast(jnp.exp(c["log_alpha_t"] - c["log_alpha_s"]), x) * x
                    - _bcast(c["sigma_t"] * c["phi_1"], x) * noise_s
                    - _bcast((1.0 / c["r2"]) * c["sigma_t"] * c["phi_2"], x)
                    * (noise_s2 - noise_s)
                )
            mask_next = mask_t
        return x_t, pred_mask, mask_next, fc

    _UPDATES = {1: "_first_update", 2: "_second_update", 3: "_third_update"}

    # --- plan building + sampling ------------------------------------------

    def _build_plan(self, steps, order, method, skip_type, t_0, t_T):
        """Host: list of (order, cfg_on, stacked_coeffs, n_steps) groups of
        consecutive steps with equal (order, guidance flag)."""
        if method == "fast":
            orders = get_orders_for_fast(steps, order)
            timesteps = get_time_steps(self.ns, skip_type, t_T, t_0, steps)
            # fast uses per-substep r1/r2 from the fine grid (reference :1032-1035)
            plan, i = [], 0
            for o in orders:
                s, t = timesteps[i], timesteps[i + o]
                h = self.ns.marginal_lambda(t) - self.ns.marginal_lambda(s)
                r1 = (
                    None
                    if o <= 1
                    else float(
                        (self.ns.marginal_lambda(timesteps[i + 1]) - self.ns.marginal_lambda(s)) / h
                    )
                )
                r2 = (
                    None
                    if o <= 2
                    else float(
                        (self.ns.marginal_lambda(timesteps[i + 2]) - self.ns.marginal_lambda(s)) / h
                    )
                )
                plan.append(_step_coeffs(self.ns, float(s), float(t), o, r1, r2, self.predict_x0))
                i += o
        elif method == "fast_upstream":
            # The unmodified upstream plan (reference dpm_solver_pytorch.py:509-588):
            # a COARSE K-step grid with default r1/r2 per mixed-order step, unlike
            # the modified 'fast' which refines r1/r2 from a fine grid.  This is
            # the plan behind the reference's continuous-model FID protocols
            # (train.py eval).
            orders = get_orders_for_fast(steps, order)
            timesteps = get_time_steps(self.ns, skip_type, t_T, t_0, len(orders))
            plan = [
                _step_coeffs(
                    self.ns, float(timesteps[i]), float(timesteps[i + 1]), o,
                    None, None, self.predict_x0,
                )
                for i, o in enumerate(orders)
            ]
        elif method == "singlestep":
            # upstream semantics (dpm_solver_pytorch.py
            # get_orders_and_timesteps_for_singlestep_solver): a lower-order
            # remainder step keeps the full `steps` NFE budget instead of
            # silently discarding steps % order evaluations.
            k, rem = divmod(steps, order)
            orders = [order] * k + ([rem] if rem else [])
            timesteps = get_time_steps(self.ns, skip_type, t_T, t_0, len(orders))
            plan = [
                _step_coeffs(
                    self.ns, float(timesteps[i]), float(timesteps[i + 1]), o,
                    None, None, self.predict_x0,
                )
                for i, o in enumerate(orders)
            ]
        else:
            raise ValueError(method)
        # group consecutive steps of equal (order, cfg_on); the cfg flag is a
        # STATIC per-step property (start time s inside the guidance interval),
        # so steps with different flags scan separately.
        def key(sc: StepCoeffs):
            return (sc.order, self._cfg_flag(sc.data["s"]))

        groups: List[Tuple[int, bool, dict, int]] = []
        run: List[StepCoeffs] = []
        for sc in plan:
            if run and key(sc) != key(run[0]):
                o, flag = key(run[0])
                groups.append((o, flag, _stack_coeffs(run), len(run)))
                run = []
            run.append(sc)
        if run:
            o, flag = key(run[0])
            groups.append((o, flag, _stack_coeffs(run), len(run)))
        return groups

    def _cfg_flag(self, s: float) -> bool:
        """Static guidance on/off for a step starting at model time s."""
        if self.cfg_interval is None:
            return True
        lo, hi = self.cfg_interval
        return lo <= s <= hi

    def sample(
        self,
        x,
        steps: int = 50,
        eps: float = 1e-4,
        T: Optional[float] = None,
        order: int = 3,
        method: str = "fast",
        skip_type: str = "time_uniform",
        mask_token=None,
        update_mask: bool = True,
        denoise: bool = False,
    ):
        """Integrate from t_T to t_0.  Pure function of (x, mask_token): safe to
        wrap in jax.jit (plan building happens at trace time on host).

        Returns x, or (x, pred_mask) when `mask_token` is given.
        """
        t_0 = eps
        t_T = self.ns.T if T is None else T
        mask_on = mask_token is not None and update_mask
        # update_mask=False == the reference's enable_mask_opt=False: the mask
        # still conditions the model every call, but its trajectory is not
        # integrated — each update returns (x_t, pred_mask, pred_mask)
        # (reference `dpm_solver_pp.py:475,599,829`).
        mask_fixed = mask_token is not None and not update_mask

        if method in ("adaptive", "multistep"):
            # ValueError, not assert: asserts vanish under `python -O`,
            # silently re-introducing the inactive-knob behavior.
            if self.cfg_interval is not None:
                raise ValueError(
                    "cfg_interval is supported for the 'fast'/'fast_upstream'/"
                    "'singlestep' methods only"
                )
            if self.accel_tau:
                raise ValueError(
                    "accel_tau (forecast-skip) is supported for the 'fast'/"
                    "'fast_upstream'/'singlestep' methods only — it would be "
                    "silently inactive here"
                )
        if method == "adaptive":
            x = self._sample_adaptive(x, order, t_T, t_0)
            return (x, mask_token) if mask_on else x
        if method == "multistep":
            x = self._sample_multistep(x, steps, order, skip_type, t_T, t_0)
            return (x, mask_token) if mask_on else x

        groups = self._build_plan(steps, order, method, skip_type, t_0, t_T)

        pred_mask = mask_token
        mask_t = mask_token
        fc = self.init_forecast(x, mask_token)
        prev_cfg = None
        for group_order, group_cfg, coeffs, n in groups:
            # Guidance-interval boundary: outputs cached under the other
            # protocol (guided vs cond-only) differ by scale*(cond-uncond);
            # extrapolating across the flip would emit a mixture.  Resetting
            # the cache counter forces real evals until two same-protocol
            # outputs rebuild it (host-static: group flags are static).
            # (the held guidance delta 'gd' deliberately survives the flip —
            # carrying guidance across the boundary is its whole purpose)
            if fc is not None and "k" in fc and prev_cfg is not None and group_cfg != prev_cfg:
                fc = {**fc, "k": jnp.zeros((), jnp.int32)}
            prev_cfg = group_cfg
            update = getattr(self, self._UPDATES[group_order])

            if n == 1:
                c = {k: v[0] for k, v in coeffs.items()}
                x, pm, mask_t, fc = update(x, c, mask_t, mask_on, fc, group_cfg)
                if mask_on:
                    pred_mask = pm
                elif mask_fixed:
                    pred_mask = pm
                    mask_t = pm
            else:
                def body(carry, c, _update=update, _cfg=group_cfg):
                    x, pred_mask, mask_t, fc = carry
                    x, pm, mask_t, fc = _update(x, c, mask_t, mask_on, fc, _cfg)
                    if mask_on:
                        pred_mask = pm
                    elif mask_fixed:
                        pred_mask = pm
                        mask_t = pm
                    return (x, pred_mask, mask_t, fc), None

                (x, pred_mask, mask_t, fc), _ = jax.lax.scan(
                    body, (x, pred_mask, mask_t, fc), coeffs
                )

        if denoise:
            x = self._denoise(x, t_0, mask_token=mask_t)
        return (x, pred_mask) if (mask_on or mask_fixed) else x

    def _denoise(self, x, s: float, mask_token=None):
        """Final x0 projection (reference `dpm_solver_pp.py:407-418`)."""
        sig = float(self.ns.marginal_std(s))
        log_a = float(self.ns.marginal_log_mean_coeff(s))
        t_vec = jnp.full((x.shape[0],), s, dtype=x.dtype)
        kw = {} if self.cfg_interval is None else {"cfg_on": self._cfg_flag(s)}
        # panoptic models need their mask conditioning on EVERY call (same
        # kw convention as _net: only pass mask_token when one exists)
        if mask_token is not None:
            kw["mask_token"] = mask_token
        out = self.model(x, t_vec, **kw)
        noise = out[0] if isinstance(out, tuple) else out
        return (x - sig * noise) / np.exp(log_a)

    # --- multistep (image-only, reference dpm_solver_pp.py:602-677,995-1017) --

    def _sample_multistep(self, x, steps, order, skip_type, t_T, t_0):
        assert steps >= order
        ts = get_time_steps(self.ns, skip_type, t_T, t_0, steps)
        lam = self.ns.marginal_lambda(ts)
        log_a = self.ns.marginal_log_mean_coeff(ts)
        sig = self.ns.marginal_std(ts)
        alpha = np.exp(log_a)

        def call(x, i):
            noise, _, _ = self._call_model(x, float(ts[i]), float(sig[i]), float(alpha[i]), None)
            return noise

        # Warm-up with increasing orders, then fixed-order updates; the plan is
        # static so this unrolls at trace time into one XLA program.
        prev_noise = [call(x, 0)]
        prev_idx = [0]
        for init_order in range(1, order):
            i = init_order
            x = self._multistep_update(x, prev_noise, prev_idx, i, init_order, ts, lam, log_a, sig, alpha)
            prev_noise.append(call(x, i))
            prev_idx.append(i)
        for step in range(order, steps + 1):
            x = self._multistep_update(x, prev_noise, prev_idx, step, order, ts, lam, log_a, sig, alpha)
            prev_noise = prev_noise[1:] + [prev_noise[-1]]
            prev_idx = prev_idx[1:] + [step]
            if step < steps:
                prev_noise[-1] = call(x, step)
        return x

    def _multistep_update(self, x, prev_noise, prev_idx, i, order, ts, lam, log_a, sig, alpha):
        t = float(ts[i])
        if order == 1:
            c = _step_coeffs(self.ns, float(ts[prev_idx[-1]]), t, 1, None, None, self.predict_x0).data
            c = {k: jnp.float32(v) for k, v in c.items()}
            # order-1 multistep reuses the cached model output
            noise_s = prev_noise[-1]
            if self.predict_x0:
                phi_1 = -c["phi_1"]
                return _bcast(c["sigma_t"] / c["sigma_s"], x) * x + _bcast(
                    c["alpha_t"] * phi_1, x
                ) * noise_s
            return (
                _bcast(jnp.exp(c["log_alpha_t"] - c["log_alpha_s"]), x) * x
                - _bcast(c["sigma_t"] * c["phi_1"], x) * noise_s
            )
        i0, i1 = prev_idx[-1], prev_idx[-2]
        h = lam[i] - lam[i0]
        h_0 = lam[i0] - lam[i1]
        r0 = h_0 / h
        D1_0 = (1.0 / r0) * (prev_noise[-1] - prev_noise[-2])
        if order == 2:
            if self.predict_x0:
                return (
                    _bcast(sig[i] / sig[i0], x) * x
                    - _bcast(alpha[i] * np.expm1(-h), x) * prev_noise[-1]
                    - 0.5 * _bcast(alpha[i] * np.expm1(-h), x) * D1_0
                )
            return (
                _bcast(np.exp(log_a[i] - log_a[i0]), x) * x
                - _bcast(sig[i] * np.expm1(h), x) * prev_noise[-1]
                - 0.5 * _bcast(sig[i] * np.expm1(h), x) * D1_0
            )
        # order 3 (reference dpm_solver_pp.py:645-677)
        i2 = prev_idx[-3]
        h_1 = lam[i1] - lam[i2]
        r1 = h_1 / h
        D1_1 = (1.0 / r1) * (prev_noise[-2] - prev_noise[-3])
        D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
        D2 = (1.0 / (r0 + r1)) * (D1_0 - D1_1)
        if self.predict_x0:
            return (
                _bcast(sig[i] / sig[i0], x) * x
                - _bcast(alpha[i] * np.expm1(-h), x) * prev_noise[-1]
                + _bcast(alpha[i] * (np.expm1(-h) / h + 1.0), x) * D1
                - _bcast(alpha[i] * ((np.expm1(-h) + h) / h ** 2 - 0.5), x) * D2
            )
        return (
            _bcast(np.exp(log_a[i] - log_a[i0]), x) * x
            - _bcast(sig[i] * np.expm1(h), x) * prev_noise[-1]
            - _bcast(sig[i] * (np.expm1(h) / h - 1.0), x) * D1
            - _bcast(sig[i] * ((np.expm1(h) - h) / h ** 2 - 0.5), x) * D2
        )

    # --- adaptive (host loop; dynamic NFE, reference dpm_solver_pp.py:873-925) --

    def _sample_adaptive(self, x, order, t_T, t_0, h_init=0.05, atol=0.0078,
                         rtol=0.05, theta=0.9, t_err=1e-5):
        """Adaptive step size solver.  The step size depends on on-device error
        estimates, so this necessarily round-trips to host each step; each
        candidate step itself is a jitted fixed-order update."""
        s = t_T
        lam_s = float(self.ns.marginal_lambda(s))
        lam_0 = float(self.ns.marginal_lambda(t_0))
        h = h_init
        x_prev = x
        nfe = 0
        # lower/higher candidate steps SHARE their common model evals via the
        # memo dict (total = `order` real evals per iteration, matching the
        # upstream reference's lower_noise_kwargs reuse): the lower update's
        # intermediate point s1 uses the same r1 as the higher's, so its
        # (x_s1, s1) evaluation is bit-identical.
        if order == 2:
            r1 = 0.5
            def pair(x, s, t):
                evals = {}
                xl = self._run_single(x, s, t, 1, evals=evals)
                xh = self._run_single(x, s, t, 2, r1=r1, evals=evals)
                return xl, xh
        elif order == 3:
            r1, r2 = 1.0 / 3.0, 2.0 / 3.0
            def pair(x, s, t):
                evals = {}
                xl = self._run_single(x, s, t, 2, r1=r1, evals=evals)
                xh = self._run_single(x, s, t, 3, r1=r1, r2=r2, evals=evals)
                return xl, xh
        else:
            raise ValueError("adaptive solver order must be 2 or 3")
        while abs(s - t_0) > t_err:
            t = float(self.ns.inverse_lambda(np.array(lam_s + h)))
            x_lower, x_higher = pair(x, s, t)
            delta = jnp.maximum(
                atol, rtol * jnp.maximum(jnp.abs(x_lower), jnp.abs(x_prev))
            )
            E = float(
                jnp.max(
                    jnp.sqrt(
                        jnp.mean(
                            jnp.square((x_higher - x_lower) / delta).reshape(x.shape[0], -1),
                            axis=-1,
                        )
                    )
                )
            )
            if E <= 1.0:
                x = x_higher
                s = t
                x_prev = x_lower
                lam_s = float(self.ns.marginal_lambda(s))
            h = min(theta * h * max(E, 1e-10) ** (-1.0 / order), lam_0 - lam_s)
            nfe += order
        return x

    def _run_single(self, x, s, t, order, r1=None, r2=None, evals=None):
        c = _step_coeffs(self.ns, float(s), float(t), order, r1, r2, self.predict_x0).data
        c = {k: jnp.float32(v) for k, v in c.items()}
        update = getattr(self, self._UPDATES[order])
        x_t, _, _, _ = update(x, c, None, False, evals=evals)
        return x_t
