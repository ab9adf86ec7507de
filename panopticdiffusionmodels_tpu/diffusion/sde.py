"""Continuous-time VP SDEs, score-model wrappers and the simple training loss.

Functional JAX re-design of the reference continuous diffusion core
(reference `sde.py:33-279`).  All methods are pure functions of `t` (and `x`),
safe to call under jit/vmap/scan; randomness is explicit via PRNG keys.

Conventions (match the reference):
  * time runs in [0, 1]; the network is called with `t * 999` (reference
    `sde.py:174`),
  * `cum_alpha`/`cum_beta` are E/Var coefficients of q(x_t|x_0),
  * `pred` is 'noise_pred' or 'x0_pred'.
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from .math import stp, mos


def get_sde(name: str, **kwargs):
    if name == "vpsde":
        return VPSDE(**kwargs)
    if name == "vpsde_cosine":
        return VPSDECosine(**kwargs)
    raise NotImplementedError(name)


class SDE:
    """dx = f(x, t) dt + g(t) dw, 0 <= t <= 1."""

    def drift(self, x, t):
        raise NotImplementedError

    def diffusion(self, t):
        raise NotImplementedError

    def cum_beta(self, t):
        raise NotImplementedError

    def cum_alpha(self, t):
        raise NotImplementedError

    def snr(self, t):
        raise NotImplementedError

    def nsr(self, t):
        raise NotImplementedError

    def marginal_prob(self, x0, t):
        """Mean and std of q(x_t | x_0)."""
        alpha = self.cum_alpha(t)
        beta = self.cum_beta(t)
        mean = stp(jnp.sqrt(alpha), x0)
        std = jnp.sqrt(beta)
        return mean, std

    def sample(self, key, x0, t_init: float = 0.0):
        """Draw (t, eps, x_t) from q with t ~ U(t_init, 1) per batch element."""
        key_t, key_eps = jax.random.split(key)
        t = jax.random.uniform(key_t, (x0.shape[0],), dtype=x0.dtype) * (1.0 - t_init) + t_init
        mean, std = self.marginal_prob(x0, t)
        eps = jax.random.normal(key_eps, x0.shape, dtype=x0.dtype)
        xt = mean + stp(std, eps)
        return t, eps, xt


class VPSDE(SDE):
    """Linear-beta VP SDE (reference `sde.py:72-113`)."""

    def __init__(self, beta_min: float = 0.1, beta_max: float = 20.0):
        self.beta_0 = beta_min
        self.beta_1 = beta_max

    def drift(self, x, t):
        return -0.5 * stp(self.squared_diffusion(t), x)

    def diffusion(self, t):
        return jnp.sqrt(self.squared_diffusion(t))

    def squared_diffusion(self, t):  # beta(t)
        return self.beta_0 + t * (self.beta_1 - self.beta_0)

    def squared_diffusion_integral(self, s, t):  # \int_s^t beta(tau) dtau
        return self.beta_0 * (t - s) + (self.beta_1 - self.beta_0) * (t ** 2 - s ** 2) * 0.5

    def skip_alpha(self, s, t):
        return jnp.exp(-self.squared_diffusion_integral(s, t))

    def skip_beta(self, s, t):
        return 1.0 - self.skip_alpha(s, t)

    def cum_beta(self, t):
        return self.skip_beta(0.0, t)

    def cum_alpha(self, t):
        return self.skip_alpha(0.0, t)

    def nsr(self, t):
        return jnp.expm1(self.squared_diffusion_integral(0.0, t))

    def snr(self, t):
        return 1.0 / self.nsr(t)

    def __repr__(self):
        return f"vpsde beta_0={self.beta_0} beta_1={self.beta_1}"


class VPSDECosine(SDE):
    """Cosine VP SDE (reference `sde.py:116-152`)."""

    def __init__(self, s: float = 0.008):
        self.s = s
        self.F0 = math.cos(s / (1 + s) * math.pi / 2) ** 2

    def _F(self, t):
        return jnp.cos((t + self.s) / (1 + self.s) * math.pi / 2) ** 2

    def drift(self, x, t):
        ft = -jnp.tan((t + self.s) / (1 + self.s) * math.pi / 2) / (1 + self.s) * math.pi / 2
        return stp(ft, x)

    def diffusion(self, t):
        return jnp.sqrt(
            jnp.tan((t + self.s) / (1 + self.s) * math.pi / 2) / (1 + self.s) * math.pi
        )

    def cum_beta(self, t):
        return 1.0 - self.cum_alpha(t)

    def cum_alpha(self, t):
        return self._F(t) / self.F0

    def snr(self, t):
        Ft = self._F(t)
        return Ft / (self.F0 - Ft)

    def nsr(self, t):
        Ft = self._F(t)
        return self.F0 / Ft - 1.0

    def __repr__(self):
        return "vpsde_cosine"


class ScoreModel:
    """Converts a network into noise/x0/score parameterizations.

    `nnet_fn(x, t_scaled, **kwargs) -> pred` is a pure function (typically a bound
    flax apply with parameters closed over).  The network receives `t * 999`
    (reference `sde.py:174`).
    """

    def __init__(self, nnet_fn: Callable, pred: str, sde: SDE, T: float = 1.0):
        assert T == 1.0
        self.nnet_fn = nnet_fn
        self.pred = pred
        self.sde = sde
        self.T = T

    def predict(self, xt, t, **kwargs):
        t = jnp.asarray(t, dtype=xt.dtype)
        if t.ndim == 0:
            t = jnp.full((xt.shape[0],), t, dtype=xt.dtype)
        return self.nnet_fn(xt, t * 999.0, **kwargs)

    def noise_pred(self, xt, t, **kwargs):
        pred = self.predict(xt, t, **kwargs)
        if self.pred == "noise_pred":
            return pred
        if self.pred == "x0_pred":
            return -stp(jnp.sqrt(self.sde.snr(t)), pred) + stp(
                jax.lax.rsqrt(self.sde.cum_beta(t)), xt
            )
        raise NotImplementedError(self.pred)

    def x0_pred(self, xt, t, **kwargs):
        pred = self.predict(xt, t, **kwargs)
        if self.pred == "noise_pred":
            return stp(jax.lax.rsqrt(self.sde.cum_alpha(t)), xt) - stp(
                jnp.sqrt(self.sde.nsr(t)), pred
            )
        if self.pred == "x0_pred":
            return pred
        raise NotImplementedError(self.pred)

    def score(self, xt, t, **kwargs):
        cum_beta = self.sde.cum_beta(t)
        noise_pred = self.noise_pred(xt, t, **kwargs)
        return stp(-jax.lax.rsqrt(cum_beta), noise_pred)


class ReverseSDE:
    """dx = [f - g^2 s] dt + g dw (reference `sde.py:202-217`)."""

    def __init__(self, score_model: ScoreModel):
        self.sde = score_model.sde
        self.score_model = score_model

    def drift(self, x, t, **kwargs):
        drift = self.sde.drift(x, t)
        diffusion = self.sde.diffusion(t)
        score = self.score_model.score(x, t, **kwargs)
        return drift - stp(diffusion ** 2, score)

    def diffusion(self, t):
        return self.sde.diffusion(t)


class ODE:
    """Probability-flow ODE: dx = [f - 0.5 g^2 s] dt (reference `sde.py:220-236`)."""

    def __init__(self, score_model: ScoreModel):
        self.sde = score_model.sde
        self.score_model = score_model

    def drift(self, x, t, **kwargs):
        drift = self.sde.drift(x, t)
        diffusion = self.sde.diffusion(t)
        score = self.score_model.score(x, t, **kwargs)
        return drift - 0.5 * stp(diffusion ** 2, score)

    def diffusion(self, t):
        return 0.0


def l_simple(key, score_model: ScoreModel, x0, pred: str = "noise_pred", **kwargs):
    """Per-example simple loss, shape (B,) (reference `sde.py:270-279`)."""
    t, noise, xt = score_model.sde.sample(key, x0)
    if pred == "noise_pred":
        noise_pred = score_model.noise_pred(xt, t, **kwargs)
        return mos(noise - noise_pred)
    if pred == "x0_pred":
        x0_pred = score_model.x0_pred(xt, t, **kwargs)
        return mos(x0 - x0_pred)
    raise NotImplementedError(pred)
