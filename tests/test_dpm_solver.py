import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticdiffusionmodels_tpu.diffusion.schedule import stable_diffusion_beta_schedule
from panopticdiffusionmodels_tpu.samplers.dpm_solver import (
    DPMSolver,
    get_orders_for_fast,
    get_time_steps,
)
from panopticdiffusionmodels_tpu.samplers.noise_schedule import NoiseScheduleVP

BETAS = stable_diffusion_beta_schedule()


def _ns():
    return NoiseScheduleVP("discrete", betas=BETAS)


def _delta_model(c, ns):
    """Perfect noise predictor for the delta distribution at x0 = c.

    noise(x, t) = (x - alpha_t c) / sigma_t; for this model every order of
    DPM-Solver++ is EXACT, so the sampler must land on c up to the t_0 cutoff.
    """
    t_knots = np.linspace(0, 1, 10001)
    alpha_k = jnp.asarray(ns.marginal_alpha(t_knots), dtype=jnp.float32)
    sigma_k = jnp.asarray(np.maximum(ns.marginal_std(t_knots), 1e-12), dtype=jnp.float32)

    def model(x, t_vec, mask_token=None):
        # piecewise-constant lookup is fine: t values are exactly on fine grid?
        # use linear interp on device for the test oracle only
        a = jnp.interp(t_vec[0], jnp.asarray(t_knots, jnp.float32), alpha_k)
        s = jnp.interp(t_vec[0], jnp.asarray(t_knots, jnp.float32), sigma_k)
        noise = (x - a * c) / s
        if mask_token is None:
            return noise
        return noise, jnp.full_like(mask_token, 0.5)  # constant mask x0

    return model



def _exact_solution(ns, x_T, c, t_T, t_0):
    """Closed-form flow solution for the delta-at-c model:
    x(t0) = alpha(t0) c + sigma(t0) * (x_T - alpha(T) c) / sigma(T)."""
    import numpy as np
    a0, s0 = float(ns.marginal_alpha(t_0)), float(ns.marginal_std(t_0))
    aT, sT = float(ns.marginal_alpha(t_T)), float(ns.marginal_std(t_T))
    return a0 * c + s0 * (np.asarray(x_T) - aT * c) / sT

def test_fast_order_plan():
    assert get_orders_for_fast(50, 3) == [3] * 16 + [2]
    assert get_orders_for_fast(51, 3) == [3] * 16 + [2, 1]
    assert get_orders_for_fast(52, 3) == [3] * 17 + [1]
    assert sum(get_orders_for_fast(51, 3)) == 51
    assert sum(get_orders_for_fast(52, 3)) == 52
    assert get_orders_for_fast(10, 2) == [2] * 5
    assert get_orders_for_fast(11, 2) == [2] * 5 + [1]


def test_time_steps_monotone():
    ns = _ns()
    for skip in ["time_uniform", "logSNR", "t2"]:
        ts = get_time_steps(ns, skip, 1.0, 1e-3, 20)
        assert len(ts) == 21
        assert ts[0] == pytest.approx(1.0)
        assert ts[-1] == pytest.approx(1e-3)
        assert np.all(np.diff(ts) < 0)


@pytest.mark.parametrize("method,order", [("fast", 3), ("singlestep", 1), ("singlestep", 2), ("singlestep", 3)])
def test_solver_exact_on_delta_model(rng, method, order):
    ns = _ns()
    c = 0.7
    model = _delta_model(c, ns)
    solver = DPMSolver(model, ns, predict_x0=True)
    x_T = jax.random.normal(rng, (2, 8, 8, 4))
    steps = 12
    x0 = solver.sample(x_T, steps=steps, eps=1.0 / 1000, T=1.0, order=order, method=method)
    expected = _exact_solution(ns, x_T, c, 1.0, 1.0 / 1000)
    np.testing.assert_allclose(np.asarray(x0), expected, rtol=0, atol=2e-3)


def test_solver_is_jittable_one_program(rng):
    ns = _ns()
    model = _delta_model(0.3, ns)
    solver = DPMSolver(model, ns, predict_x0=True)
    x_T = jax.random.normal(rng, (1, 4, 4, 4))

    @jax.jit
    def run(x):
        return solver.sample(x, steps=9, eps=1e-3, order=3, method="fast")

    out = run(x_T)
    expected = _exact_solution(ns, x_T, 0.3, 1.0, 1e-3)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-3)


def test_mask_trajectory_converges(rng):
    """The mask carry must converge to the model's constant pred_mask."""
    ns = _ns()
    model = _delta_model(0.0, ns)
    solver = DPMSolver(model, ns, predict_x0=True)
    x_T = jax.random.normal(rng, (2, 8, 8, 4))
    mask_T = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 16, 8))
    x0, pred_mask = solver.sample(
        x_T, steps=12, eps=1e-3, order=1, method="singlestep", mask_token=mask_T
    )
    # pred_mask is the model's x0-style output at the final step
    np.testing.assert_allclose(np.asarray(pred_mask), 0.5, atol=1e-5)
    expected = _exact_solution(ns, x_T, 0.0, 1.0, 1e-3)
    np.testing.assert_allclose(np.asarray(x0), expected, atol=2e-3)


def test_mask_fast_order3(rng):
    ns = _ns()
    model = _delta_model(-0.4, ns)
    solver = DPMSolver(model, ns, predict_x0=True)
    x_T = jax.random.normal(rng, (1, 8, 8, 4))
    mask_T = jax.random.normal(rng, (1, 16, 16, 8))
    x0, pred_mask = solver.sample(
        x_T, steps=15, eps=1e-3, order=3, method="fast", mask_token=mask_T
    )
    assert pred_mask.shape == mask_T.shape
    expected = _exact_solution(ns, x_T, -0.4, 1.0, 1e-3)
    np.testing.assert_allclose(np.asarray(x0), expected, atol=2e-3)


def test_multistep_converges(rng):
    ns = _ns()
    model = _delta_model(0.5, ns)
    solver = DPMSolver(model, ns, predict_x0=True)
    x_T = jax.random.normal(rng, (1, 4, 4, 4))
    x0 = solver.sample(x_T, steps=10, eps=1e-3, order=2, method="multistep")
    expected = _exact_solution(ns, x_T, 0.5, 1.0, 1e-3)
    np.testing.assert_allclose(np.asarray(x0), expected, atol=2e-3)


def test_eps_prediction_mode(rng):
    """predict_x0=False (classic DPM-Solver) also lands on the delta point."""
    ns = _ns()
    model = _delta_model(0.2, ns)
    solver = DPMSolver(model, ns, predict_x0=False)
    x_T = jax.random.normal(rng, (1, 4, 4, 4))
    x0 = solver.sample(x_T, steps=12, eps=1e-3, order=3, method="singlestep")
    expected = _exact_solution(ns, x_T, 0.2, 1.0, 1e-3)
    np.testing.assert_allclose(np.asarray(x0), expected, atol=5e-3)


def test_adaptive_solver(rng):
    ns = _ns()
    model = _delta_model(0.1, ns)
    solver = DPMSolver(model, ns, predict_x0=True)
    x_T = jax.random.normal(rng, (1, 4, 4, 4))
    x0 = solver.sample(x_T, eps=1e-3, order=3, method="adaptive")
    assert abs(float(np.mean(np.asarray(x0))) - 0.1) < 0.05


@pytest.mark.parametrize("predict_x0", [True, False])
def test_taylor_solver_type(rng, predict_x0):
    """solver_type='taylor' (reference dpm_solver_pp.py:559-589,767-819) is also
    exact on the delta model."""
    ns = _ns()
    model = _delta_model(0.45, ns)
    solver = DPMSolver(model, ns, predict_x0=predict_x0, solver_type="taylor")
    x_T = jax.random.normal(rng, (1, 4, 4, 4))
    for order in (2, 3):
        x0 = solver.sample(x_T, steps=12, eps=1e-3, order=order, method="singlestep")
        expected = _exact_solution(ns, x_T, 0.45, 1.0, 1e-3)
        np.testing.assert_allclose(np.asarray(x0), expected, atol=6e-3)


def test_thresholding_clamps_x0(rng):
    ns = _ns()
    model = _delta_model(3.0, ns)  # x0 outside [-1, 1] triggers the clamp
    plain = DPMSolver(model, ns, predict_x0=True)
    thresh = DPMSolver(model, ns, predict_x0=True, thresholding=True, max_val=1.0)
    x_T = jax.random.normal(rng, (1, 4, 4, 4))
    x_plain = plain.sample(x_T, steps=6, eps=1e-3, order=1, method="singlestep")
    x_thresh = thresh.sample(x_T, steps=6, eps=1e-3, order=1, method="singlestep")
    assert float(np.abs(np.asarray(x_plain)).max()) > 2.0
    assert float(np.abs(np.asarray(x_thresh)).max() ) < float(np.abs(np.asarray(x_plain)).max())


def test_denoise_final_projection(rng):
    ns = _ns()
    model = _delta_model(0.25, ns)
    solver = DPMSolver(model, ns, predict_x0=True)
    x_T = jax.random.normal(rng, (1, 4, 4, 4))
    x0 = solver.sample(x_T, steps=6, eps=1e-3, order=1, method="singlestep", denoise=True)
    # final denoise projects exactly to the delta point
    np.testing.assert_allclose(np.asarray(x0), 0.25, atol=5e-3)


# --- forecast-skip acceleration (config.sample.accel) ------------------------

def _counting_model(c, ns, counter):
    """Delta-model wrapper that counts REAL network executions at runtime via
    io_callback (only the taken lax.cond branch executes it)."""
    base = _delta_model(c, ns)

    def model(x, t_vec, mask_token=None):
        def bump(_):
            counter["n"] += 1
            return np.int32(0)

        jax.experimental.io_callback(bump, jax.ShapeDtypeStruct((), jnp.int32),
                                     jnp.zeros(()))
        return base(x, t_vec, mask_token=mask_token)

    return model


def test_accel_skips_evals_and_stays_close(rng):
    """accel_tau > 0 must (a) actually skip network evals at runtime and
    (b) keep the trajectory close to the exact one.  The delta model's x0 is
    CONSTANT, so linear extrapolation is exact and the result must match to
    solver tolerance."""
    ns = _ns()
    x_T = jax.random.normal(rng, (2, 4, 4, 4))

    exact_counter = {"n": 0}
    exact = DPMSolver(_counting_model(0.3, ns, exact_counter), ns, predict_x0=True)
    x_exact = jax.jit(lambda x: exact.sample(x, steps=30, eps=1e-3, order=3,
                                             method="fast"))(x_T)
    n_exact = exact_counter["n"]

    accel_counter = {"n": 0}
    accel = DPMSolver(_counting_model(0.3, ns, accel_counter), ns,
                      predict_x0=True, accel_tau=0.3)
    x_accel = jax.jit(lambda x: accel.sample(x, steps=30, eps=1e-3, order=3,
                                             method="fast"))(x_T)
    n_accel = accel_counter["n"]

    assert n_exact == 30, n_exact
    assert n_accel < 0.7 * n_exact, (n_accel, n_exact)
    np.testing.assert_allclose(np.asarray(x_accel), np.asarray(x_exact),
                               atol=1e-3, rtol=1e-3)


def test_accel_panoptic_mask_carries(rng):
    """Forecast cache must thread the mask channel too."""
    ns = _ns()
    model = _delta_model(0.1, ns)
    solver = DPMSolver(model, ns, predict_x0=True, accel_tau=0.3)
    k1, k2 = jax.random.split(rng)
    x_T = jax.random.normal(k1, (2, 4, 4, 4))
    m_T = jax.random.normal(k2, (2, 8, 8, 8))
    x, pm = jax.jit(lambda x, m: solver.sample(
        x, steps=21, eps=1e-3, order=3, method="fast", mask_token=m,
        update_mask=True))(x_T, m_T)
    assert np.isfinite(np.asarray(x)).all()
    # the model's mask x0 is constant 0.5; the integrated mask converges there
    np.testing.assert_allclose(np.asarray(pm), 0.5, atol=1e-2)


def test_accel_zero_is_exact_protocol(rng):
    """accel_tau=0.0 must be byte-identical to the plain solver."""
    ns = _ns()
    model = _delta_model(0.2, ns)
    x_T = jax.random.normal(rng, (1, 4, 4, 4))
    a = DPMSolver(model, ns, predict_x0=True).sample(
        x_T, steps=12, eps=1e-3, order=3, method="fast")
    b = DPMSolver(model, ns, predict_x0=True, accel_tau=0.0).sample(
        x_T, steps=12, eps=1e-3, order=3, method="fast")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --- guidance interval (config.sample.cfg_interval, arXiv:2404.07724) --------

def _flagged_model(c, ns, counts):
    """Delta model that accepts the solver's static cfg_on keyword and counts
    real executions per flag value at runtime."""
    base = _delta_model(c, ns)

    def model(x, t_vec, mask_token=None, cfg_on=True):
        def bump(_):
            counts[bool(cfg_on)] += 1
            return np.int32(0)

        jax.experimental.io_callback(bump, jax.ShapeDtypeStruct((), jnp.int32),
                                     jnp.zeros(()))
        return base(x, t_vec, mask_token=mask_token)

    return model


def test_cfg_interval_full_interval_is_identical(rng):
    """cfg_interval covering all of (0, 1] must be byte-identical to None."""
    ns = _ns()
    model = _delta_model(0.2, ns)
    x_T = jax.random.normal(rng, (1, 4, 4, 4))
    a = DPMSolver(model, ns, predict_x0=True).sample(
        x_T, steps=15, eps=1e-3, order=3, method="fast")

    def model_kw(x, t, mask_token=None, cfg_on=True):
        return model(x, t, mask_token=mask_token)

    b = DPMSolver(model_kw, ns, predict_x0=True, cfg_interval=(0.0, 1.0)).sample(
        x_T, steps=15, eps=1e-3, order=3, method="fast")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cfg_interval_splits_flags_by_step_time(rng):
    """Steps starting outside [lo, hi] must execute with cfg_on=False; the
    total eval count is unchanged (only the per-eval cost drops)."""
    ns = _ns()
    counts = {True: 0, False: 0}
    model = _flagged_model(0.3, ns, counts)
    solver = DPMSolver(model, ns, predict_x0=True, cfg_interval=(0.3, 0.8))
    x_T = jax.random.normal(rng, (1, 4, 4, 4))
    jax.jit(lambda x: solver.sample(x, steps=30, eps=1e-3, order=3,
                                    method="fast"))(x_T)
    # time_uniform grid over [1e-3, 1]: steps start both inside and outside
    assert counts[True] > 0 and counts[False] > 0, counts
    assert counts[True] + counts[False] == 30, counts
    # with (0.3, 0.8) roughly half the grid is outside the interval
    assert counts[False] >= 10, counts


def test_accel_cache_resets_at_cfg_boundary(rng):
    """Forecast-skip must NOT extrapolate across a guidance-interval group
    boundary: outputs cached under the other protocol differ by the guidance
    term.  With accel_tau huge every eligible call skips, so real evals =
    2 (warm-up) + 2 per cfg flip (cache rebuild); without the reset the
    post-boundary steps would keep skipping (2 total)."""
    ns = _ns()
    counts = {True: 0, False: 0}
    model = _flagged_model(0.2, ns, counts)
    solver = DPMSolver(model, ns, predict_x0=True, accel_tau=1e6,
                       cfg_interval=(0.0, 0.5))
    x_T = jax.random.normal(rng, (1, 4, 4, 4))
    out = jax.jit(lambda x: solver.sample(x, steps=30, eps=1e-3, order=3,
                                          method="fast"))(x_T)
    assert np.isfinite(np.asarray(out)).all()
    total = counts[True] + counts[False]
    # one flip on the time_uniform grid (t crosses 0.5 once) -> 2 + 2 evals,
    # split across the two protocols
    assert total == 4, counts
    assert counts[True] == 2 and counts[False] == 2, counts


def test_singlestep_keeps_full_nfe_budget():
    """steps % order must become a lower-order remainder step (upstream
    get_orders_and_timesteps_for_singlestep_solver), not be discarded."""
    ns = _ns()
    solver = DPMSolver(_delta_model(0.2, ns), ns, predict_x0=True)
    groups = solver._build_plan(50, 3, "singlestep", "time_uniform", 1e-3, 1.0)
    nfe = sum(order * n for order, _, _, n in groups)
    assert nfe == 50, nfe
    assert groups[-1][0] == 2  # 16x order-3 + 1x order-2 remainder


def test_adaptive_pair_shares_model_evals(rng):
    """The lower/higher candidate steps of the adaptive solver must share
    their common evaluations via the memo dict: order-2 lower + order-3
    higher = 3 real evals, not 5."""
    ns = _ns()
    counts = {"n": 0}

    def model(x, t_vec, mask_token=None):
        def bump(_):
            counts["n"] += 1
            return np.int32(0)

        jax.experimental.io_callback(bump, jax.ShapeDtypeStruct((), jnp.int32),
                                     jnp.zeros(()))
        return _delta_model(0.2, ns)(x, t_vec)

    solver = DPMSolver(model, ns, predict_x0=True)
    x = jax.random.normal(rng, (1, 4, 4, 4))
    evals = {}
    xl = solver._run_single(x, 0.9, 0.5, 2, r1=1.0 / 3.0, evals=evals)
    xh = solver._run_single(x, 0.9, 0.5, 3, r1=1.0 / 3.0, r2=2.0 / 3.0,
                            evals=evals)
    jax.block_until_ready((xl, xh))
    assert counts["n"] == 3, counts
    # and the adaptive loop itself stays finite/correct end-to-end
    out = solver.sample(x, steps=10, eps=1e-3, order=3, method="adaptive")
    assert np.isfinite(np.asarray(out)).all()


def test_accel_refused_for_multistep_and_adaptive(rng):
    """accel_tau would be silently inactive for multistep/adaptive — the
    solver must refuse instead (same contract as cfg_interval)."""
    import pytest

    ns = _ns()
    solver = DPMSolver(_delta_model(0.2, ns), ns, predict_x0=True,
                       accel_tau=0.2)
    x_T = jax.random.normal(rng, (1, 4, 4, 4))
    for method in ("multistep", "adaptive"):
        # ValueError, not AssertionError: asserts vanish under python -O
        with pytest.raises(ValueError, match="accel_tau"):
            solver.sample(x_T, steps=10, eps=1e-3, order=2, method=method)


def test_cfg_interval_never_on_equals_uncond_sampling(rng):
    """An interval that never triggers must match sampling with CFG disabled
    byte-for-byte (the wrapper collapses to the single cond forward)."""
    from panopticdiffusionmodels_tpu.diffusion.cfg import make_cfg_class_cond

    ns = _ns()
    base = _delta_model(0.1, ns)

    def apply_fn(x, t, y):
        # label shifts the delta point so CFG on/off is distinguishable
        return base(x, t) + 0.01 * y[:, None, None, None].astype(x.dtype)

    y = jnp.ones((2,), jnp.int32)
    cfg_fn = make_cfg_class_cond(apply_fn, null_label=10, scale=0.4, enabled=True)
    x_T = jax.random.normal(rng, (2, 4, 4, 4))

    with_interval = DPMSolver(
        lambda xx, tt, mask_token=None, cfg_on=True: cfg_fn(xx, tt, y, cfg_on=cfg_on),
        ns, predict_x0=True, cfg_interval=(2.0, 3.0),
    ).sample(x_T, steps=12, eps=1e-3, order=3, method="fast")

    plain_fn = make_cfg_class_cond(apply_fn, null_label=10, scale=0.4, enabled=False)
    without_cfg = DPMSolver(
        lambda xx, tt, mask_token=None: plain_fn(xx, tt, y),
        ns, predict_x0=True,
    ).sample(x_T, steps=12, eps=1e-3, order=3, method="fast")

    np.testing.assert_array_equal(np.asarray(with_interval), np.asarray(without_cfg))

    # sanity: full CFG differs from cond-only (the interval is doing something)
    full_cfg = DPMSolver(
        lambda xx, tt, mask_token=None: cfg_fn(xx, tt, y),
        ns, predict_x0=True,
    ).sample(x_T, steps=12, eps=1e-3, order=3, method="fast")
    assert float(np.abs(np.asarray(full_cfg) - np.asarray(without_cfg)).max()) > 1e-5


def test_cfg_interval_composes_with_accel_and_mask(rng):
    ns = _ns()
    model = _delta_model(0.0, ns)

    def model_kw(x, t, mask_token=None, cfg_on=True):
        return model(x, t, mask_token=mask_token)

    solver = DPMSolver(model_kw, ns, predict_x0=True, accel_tau=0.2,
                       cfg_interval=(0.2, 0.9))
    k1, k2 = jax.random.split(rng)
    x_T = jax.random.normal(k1, (2, 4, 4, 4))
    m_T = jax.random.normal(k2, (2, 8, 8, 8))
    x, pm = jax.jit(lambda x, m: solver.sample(
        x, steps=21, eps=1e-3, order=3, method="fast", mask_token=m))(x_T, m_T)
    assert np.isfinite(np.asarray(x)).all()
    np.testing.assert_allclose(np.asarray(pm), 0.5, atol=1e-2)


def test_cfg_interval_validation():
    """Reversed or malformed intervals are rejected at construction (a
    reversed interval would silently disable guidance everywhere)."""
    ns = _ns()
    model = _delta_model(0.1, ns)
    with pytest.raises(ValueError):
        DPMSolver(model, ns, cfg_interval=(0.9, 0.2))
    with pytest.raises(ValueError):
        DPMSolver(model, ns, cfg_interval=(0.5,))
    # well-formed intervals construct fine
    DPMSolver(model, ns, cfg_interval=(0.2, 0.9))


# --- mask-guidance hold (cfg_interval_mask_hold; round 3) ---------------------
#
# Plain cfg_interval drops the CFG mask extrapolation during unguided steps,
# which the trained distribution gate showed drifts the mask-id distribution
# 4.7-10.3x the seed floor (quality_gate/trained_panoptic).  With
# DPMSolver(mask_guidance_hold=True) the guidance correction from the most
# recent guided eval is cached in the scan carry and re-applied additively
# during cfg_on=False steps.


def _held_delta_model(c, ns, delta):
    """Delta model with a CONSTANT mask-guidance correction `delta`: guided
    evals return (noise, M + delta, delta) under want_mask_delta, unguided
    evals return the bare cond output (noise, M).  Because the true correction
    is constant in time, a correct hold makes the interval run EXACTLY equal
    to an always-guided run — any mismatch is a bookkeeping bug."""
    base = _delta_model(c, ns)

    def model(x, t_vec, mask_token=None, cfg_on=True, want_mask_delta=False):
        noise, pm = base(x, t_vec, mask_token=mask_token)
        if cfg_on:
            d = jnp.full_like(pm, delta)
            guided = pm + d
            return (noise, guided, d) if want_mask_delta else (noise, guided)
        assert not want_mask_delta  # solver must not ask for it when unguided
        return noise, pm

    return model


def test_mask_hold_requires_interval():
    ns = _ns()
    with pytest.raises(ValueError):
        DPMSolver(_delta_model(0.1, ns), ns, mask_guidance_hold=True)


def test_mask_hold_equals_always_guided_for_constant_delta(rng):
    """Guidance ON early (interval (0.5, 1.0)) fills the cache; the held
    correction then makes every later cond-only step match the always-guided
    trajectory bit-for-bit (the true delta is constant)."""
    ns = _ns()
    delta = 0.25
    k1, k2 = jax.random.split(rng)
    x_T = jax.random.normal(k1, (2, 4, 4, 4))
    m_T = jax.random.normal(k2, (2, 8, 8, 8))

    hold = DPMSolver(_held_delta_model(0.2, ns, delta), ns, predict_x0=True,
                     cfg_interval=(0.5, 1.0), mask_guidance_hold=True)
    x_h, pm_h = jax.jit(lambda x, m: hold.sample(
        x, steps=20, eps=1e-3, order=3, method="fast", mask_token=m))(x_T, m_T)

    def guided_model(x, t_vec, mask_token=None):
        noise, pm = _delta_model(0.2, ns)(x, t_vec, mask_token=mask_token)
        return noise, pm + delta

    ref = DPMSolver(guided_model, ns, predict_x0=True)
    x_r, pm_r = jax.jit(lambda x, m: ref.sample(
        x, steps=20, eps=1e-3, order=3, method="fast", mask_token=m))(x_T, m_T)

    np.testing.assert_array_equal(np.asarray(x_h), np.asarray(x_r))
    np.testing.assert_allclose(np.asarray(pm_h), np.asarray(pm_r),
                               rtol=0, atol=1e-6)


def test_mask_hold_differs_from_plain_interval(rng):
    """The hold must actually change the unguided-step mask trajectory (plain
    interval = dropped correction)."""
    ns = _ns()
    k1, k2 = jax.random.split(rng)
    x_T = jax.random.normal(k1, (1, 4, 4, 4))
    m_T = jax.random.normal(k2, (1, 8, 8, 8))
    kw = dict(predict_x0=True, cfg_interval=(0.5, 1.0))
    model = _held_delta_model(0.2, ns, 0.25)
    _, pm_plain = DPMSolver(model, ns, **kw).sample(
        x_T, steps=20, eps=1e-3, order=3, method="fast", mask_token=m_T)
    _, pm_hold = DPMSolver(model, ns, mask_guidance_hold=True, **kw).sample(
        x_T, steps=20, eps=1e-3, order=3, method="fast", mask_token=m_T)
    assert not np.allclose(np.asarray(pm_plain), np.asarray(pm_hold))


def test_mask_hold_leading_unguided_steps_use_zero_delta(rng):
    """With guidance only at the END (interval (0.0, 0.5)), the cache starts
    empty: the leading cond-only steps must equal the plain-interval run
    (zero correction is the only defensible choice before any guided eval)."""
    ns = _ns()
    k1, k2 = jax.random.split(rng)
    x_T = jax.random.normal(k1, (1, 4, 4, 4))
    m_T = jax.random.normal(k2, (1, 8, 8, 8))
    model = _held_delta_model(0.2, ns, 0.25)
    # interval (0, 0.35) on a 6-step time_uniform grid: every step starts
    # ABOVE 0.35 except the last — so all but the final step are unguided.
    hold = DPMSolver(model, ns, predict_x0=True, cfg_interval=(0.0, 0.35),
                     mask_guidance_hold=True)
    plain = DPMSolver(model, ns, predict_x0=True, cfg_interval=(0.0, 0.35))
    x_h, pm_h = hold.sample(x_T, steps=6, eps=1e-3, order=2, method="fast",
                            mask_token=m_T)
    x_p, pm_p = plain.sample(x_T, steps=6, eps=1e-3, order=2, method="fast",
                             mask_token=m_T)
    # final step IS guided in both -> identical outputs (hold never engaged
    # a nonzero correction on the unguided prefix, and the guided step's
    # output is the guided prediction in both runs)
    np.testing.assert_array_equal(np.asarray(x_h), np.asarray(x_p))
    np.testing.assert_allclose(np.asarray(pm_h), np.asarray(pm_p), atol=1e-6)


def test_mask_hold_composes_with_accel(rng):
    """hold + forecast-skip: the forecast caches the held-corrected mask
    outputs, so a constant true delta still reproduces the always-guided
    trajectory exactly even when most evals are skipped."""
    ns = _ns()
    delta = 0.25
    k1, k2 = jax.random.split(rng)
    x_T = jax.random.normal(k1, (2, 4, 4, 4))
    m_T = jax.random.normal(k2, (2, 8, 8, 8))
    hold = DPMSolver(_held_delta_model(0.2, ns, delta), ns, predict_x0=True,
                     accel_tau=0.2, cfg_interval=(0.5, 1.0),
                     mask_guidance_hold=True)
    x_h, pm_h = jax.jit(lambda x, m: hold.sample(
        x, steps=20, eps=1e-3, order=3, method="fast", mask_token=m))(x_T, m_T)
    assert np.isfinite(np.asarray(x_h)).all()
    # constant-mask oracle: trajectory converges to M + delta = 0.75
    np.testing.assert_allclose(np.asarray(pm_h), 0.75, atol=2e-2)


def test_cfg_t2i_want_mask_delta_contract(rng):
    """make_cfg_t2i(want_mask_delta=True) returns (noise, guided_mask, delta)
    with guided_mask == cond_mask + delta and delta == scale*(m_c - m_u)."""
    from panopticdiffusionmodels_tpu.diffusion.cfg import make_cfg_t2i

    def apply_fn(x, t, ctx, mask_token=None):
        # uncond rows (zero context) predict mask 0; cond rows predict 1
        c = jnp.mean(jnp.abs(ctx), axis=(1, 2), keepdims=False)
        pm = jnp.broadcast_to((c > 0).astype(x.dtype)[:, None, None, None],
                              mask_token.shape)
        return jnp.zeros_like(x), pm

    empty = np.zeros((4, 8), np.float32)
    cfg_fn = make_cfg_t2i(apply_fn, empty, scale=2.0, enabled=True)
    x = jax.random.normal(rng, (3, 2, 2, 4))
    t = jnp.zeros((3,))
    ctx = jnp.ones((3, 4, 8))
    m = jnp.zeros((3, 4, 4, 8))
    n2, pm2, d = cfg_fn(x, t, ctx, mask_token=m, want_mask_delta=True)
    n1, pm1 = cfg_fn(x, t, ctx, mask_token=m)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(pm1), np.asarray(pm2))
    # delta = scale * (m_c - m_u) = 2 * (1 - 0) = 2; guided = 1 + 2 = 3
    np.testing.assert_allclose(np.asarray(d), 2.0)
    np.testing.assert_allclose(np.asarray(pm2), 3.0)
