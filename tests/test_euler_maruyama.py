import jax
import jax.numpy as jnp
import numpy as np

from panopticdiffusionmodels_tpu.diffusion.sde import ODE, ReverseSDE, ScoreModel, VPSDE
from panopticdiffusionmodels_tpu.samplers.euler_maruyama import euler_maruyama


def _perfect_score_model(c):
    """Perfect noise predictor for x0 = c delta data under VPSDE."""
    sde = VPSDE()

    def nnet(x, t_scaled, **kw):
        t = t_scaled / 999.0
        a = jnp.sqrt(sde.cum_alpha(t))[:, None, None, None]
        b = jnp.sqrt(jnp.maximum(sde.cum_beta(t), 1e-10))[:, None, None, None]
        return (x - a * c) / b

    return ScoreModel(nnet, "noise_pred", sde)


def test_ode_converges_to_delta(rng):
    sm = _perfect_score_model(0.6)
    ode = ODE(sm)
    x_T = jax.random.normal(rng, (2, 8, 8, 3))
    x0 = euler_maruyama(rng, ode, x_T, sample_steps=200)
    np.testing.assert_allclose(np.asarray(x0), 0.6, atol=0.1)


def test_sde_converges_to_delta(rng):
    sm = _perfect_score_model(-0.3)
    rsde = ReverseSDE(sm)
    x_T = jax.random.normal(rng, (4, 8, 8, 3))
    x0 = euler_maruyama(rng, rsde, x_T, sample_steps=500)
    # stochastic sampler: mean should be near the delta point
    assert abs(float(jnp.mean(x0)) - (-0.3)) < 0.1


def test_jittable(rng):
    sm = _perfect_score_model(0.0)
    ode = ODE(sm)
    x_T = jax.random.normal(rng, (1, 4, 4, 3))

    @jax.jit
    def run(key, x):
        return euler_maruyama(key, ode, x, sample_steps=50)

    out = run(rng, x_T)
    assert out.shape == x_T.shape
    assert bool(jnp.all(jnp.isfinite(out)))
