import numpy as np

from panopticdiffusionmodels_tpu.diffusion.schedule import stable_diffusion_beta_schedule
from panopticdiffusionmodels_tpu.samplers.noise_schedule import (
    NoiseScheduleVP,
    interp_with_extrapolation,
)


def _brute_force_pwl(x, xp, yp):
    """Independent PWL interpolation with extrapolation from outermost segments."""
    out = np.empty_like(np.asarray(x, dtype=np.float64))
    for i, xi in enumerate(np.atleast_1d(x)):
        if xi <= xp[0]:
            j = 0
        elif xi >= xp[-1]:
            j = len(xp) - 2
        else:
            j = int(np.searchsorted(xp, xi) - 1)
        out[i] = yp[j] + (xi - xp[j]) * (yp[j + 1] - yp[j]) / (xp[j + 1] - xp[j])
    return out


def test_interp_matches_brute_force():
    rng = np.random.default_rng(0)
    xp = np.sort(rng.uniform(0, 1, 32))
    yp = rng.normal(size=32)
    x = np.concatenate([rng.uniform(-0.5, 1.5, 100), xp])  # includes exact knots
    np.testing.assert_allclose(
        interp_with_extrapolation(x, xp, yp), _brute_force_pwl(x, xp, yp), rtol=1e-12
    )


def test_interp_descending_knots():
    xp = np.array([3.0, 2.0, 1.0])
    yp = np.array([30.0, 20.0, 10.0])
    np.testing.assert_allclose(
        interp_with_extrapolation(np.array([1.5, 2.5]), xp, yp), [15.0, 25.0]
    )


def test_discrete_schedule_knot_values():
    betas = stable_diffusion_beta_schedule()
    ns = NoiseScheduleVP("discrete", betas=betas)
    # At the knots t_i = i/N, log alpha must equal the cumulative sum exactly.
    log_alphas = 0.5 * np.cumsum(np.log(1 - betas))
    t = np.array([1 / 1000, 500 / 1000, 1.0])
    got = ns.marginal_log_mean_coeff(t)
    np.testing.assert_allclose(got, log_alphas[[0, 499, 999]], rtol=1e-12)


def test_alpha_sigma_pythagoras():
    betas = stable_diffusion_beta_schedule()
    ns = NoiseScheduleVP("discrete", betas=betas)
    t = np.linspace(0.001, 1.0, 50)
    a, s = ns.marginal_alpha(t), ns.marginal_std(t)
    np.testing.assert_allclose(a ** 2 + s ** 2, 1.0, rtol=1e-10)


def test_inverse_lambda_roundtrip_discrete():
    betas = stable_diffusion_beta_schedule()
    ns = NoiseScheduleVP("discrete", betas=betas)
    t = np.linspace(0.002, 0.999, 64)
    lam = ns.marginal_lambda(t)
    t_back = ns.inverse_lambda(lam)
    np.testing.assert_allclose(t_back, t, rtol=1e-6, atol=1e-7)


def test_inverse_lambda_roundtrip_linear():
    ns = NoiseScheduleVP("linear", beta_0=1e-4, beta_1=2e-2)
    t = np.linspace(0.01, 1.0, 32)
    np.testing.assert_allclose(ns.inverse_lambda(ns.marginal_lambda(t)), t, rtol=1e-8)


def test_inverse_lambda_roundtrip_cosine():
    ns = NoiseScheduleVP("cosine")
    t = np.linspace(0.01, ns.T, 32)
    np.testing.assert_allclose(ns.inverse_lambda(ns.marginal_lambda(t)), t, rtol=1e-6)


def test_linear_matches_vpsde_closed_form():
    # continuous linear schedule == VPSDE with beta scaled by 1000
    ns = NoiseScheduleVP("linear", beta_0=1e-4, beta_1=2e-2)
    t = np.array([0.3, 0.7])
    # log alpha_bar(t) = -0.25 t^2 (b1-b0) - 0.5 t b0 with b in "x1000" units
    expected = -0.25 * t ** 2 * (20.0 - 0.1) - 0.5 * t * 0.1
    np.testing.assert_allclose(ns.marginal_log_mean_coeff(t), expected, rtol=1e-10)
