import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticdiffusionmodels_tpu.diffusion.sde import (
    ODE,
    ReverseSDE,
    ScoreModel,
    VPSDE,
    VPSDECosine,
    get_sde,
    l_simple,
)


def test_vpsde_coefficients():
    sde = VPSDE()
    t = jnp.array([0.25, 0.5, 1.0])
    # beta(t) = 0.1 + t * 19.9
    np.testing.assert_allclose(np.asarray(sde.squared_diffusion(t)), 0.1 + 19.9 * np.asarray(t), rtol=1e-6)
    # cum_alpha(t) = exp(-int_0^t beta)
    integral = 0.1 * np.asarray(t) + 19.9 * np.asarray(t) ** 2 / 2
    np.testing.assert_allclose(np.asarray(sde.cum_alpha(t)), np.exp(-integral), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sde.cum_alpha(t) + sde.cum_beta(t)), 1.0, rtol=1e-6
    )
    # snr * nsr == 1
    np.testing.assert_allclose(np.asarray(sde.snr(t) * sde.nsr(t)), 1.0, rtol=1e-5)


def test_vpsde_cosine_consistency():
    sde = VPSDECosine()
    t = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(np.asarray(sde.cum_alpha(jnp.array([0.0]))), 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sde.cum_alpha(t) + sde.cum_beta(t)), 1.0, rtol=1e-6
    )


def test_get_sde_factory():
    assert isinstance(get_sde("vpsde"), VPSDE)
    assert isinstance(get_sde("vpsde_cosine"), VPSDECosine)
    with pytest.raises(NotImplementedError):
        get_sde("nope")


def test_marginal_sample_stats(rng):
    sde = VPSDE()
    x0 = jnp.ones((1024, 2, 2, 1)) * 3.0
    t, eps, xt = sde.sample(rng, x0)
    a = np.sqrt(np.asarray(sde.cum_alpha(t)))
    b = np.sqrt(np.asarray(sde.cum_beta(t)))
    recon = a[:, None, None, None] * 3.0 + b[:, None, None, None] * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(xt), recon, rtol=1e-5, atol=1e-5)


def test_score_model_parameterization_conversions(rng):
    """noise_pred <-> x0_pred conversions must be consistent inverses."""
    sde = VPSDE()
    x0 = jax.random.normal(rng, (4, 4, 4, 3))
    t = jnp.full((4,), 0.5)
    eps = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    a = jnp.sqrt(sde.cum_alpha(t))[:, None, None, None]
    b = jnp.sqrt(sde.cum_beta(t))[:, None, None, None]
    xt = a * x0 + b * eps

    # a perfect noise-predicting network
    noise_model = ScoreModel(lambda x, tt, **kw: eps, "noise_pred", sde)
    x0_hat = noise_model.x0_pred(xt, t)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-3, atol=1e-4)

    # a perfect x0-predicting network
    x0_model = ScoreModel(lambda x, tt, **kw: x0, "x0_pred", sde)
    eps_hat = x0_model.noise_pred(xt, t)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps), rtol=1e-3, atol=1e-4)

    # score = -eps / std
    score = noise_model.score(xt, t)
    np.testing.assert_allclose(
        np.asarray(score), -np.asarray(eps) / np.asarray(b), rtol=1e-4, atol=1e-4
    )


def test_reverse_sde_and_ode_drift(rng):
    sde = VPSDE()
    model = ScoreModel(lambda x, tt, **kw: jnp.zeros_like(x), "noise_pred", sde)
    rsde = ReverseSDE(model)
    ode = ODE(model)
    x = jax.random.normal(rng, (2, 4, 4, 1))
    t = jnp.array([0.3, 0.7])
    # With zero score, reverse drift == forward drift; ODE likewise.
    np.testing.assert_allclose(
        np.asarray(rsde.drift(x, t)), np.asarray(sde.drift(x, t)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ode.drift(x, t)), np.asarray(sde.drift(x, t)), rtol=1e-6
    )
    assert ode.diffusion(t) == 0.0


def test_l_simple_runs(rng):
    sde = VPSDE()
    model = ScoreModel(lambda x, tt, **kw: jnp.zeros_like(x), "noise_pred", sde)
    x0 = jax.random.normal(rng, (8, 4, 4, 1))
    loss = l_simple(rng, model, x0)
    assert loss.shape == (8,)
    assert bool(jnp.all(loss >= 0))
