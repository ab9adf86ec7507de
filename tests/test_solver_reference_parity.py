"""Trajectory parity against the reference's OWN torch DPM-Solver++.

The strongest solver validation available: run the reference
`dpm_solver_pp.DPM_Solver` (torch, CPU) and our scan-based solver on the SAME
analytic model and compare the final image and mask outputs.  Covers the fast
mixed-order plan, the order-3 mask trajectory (including the reference's
intermediate-step sign convention) and the discrete-schedule interpolation.

Skipped when the reference repo isn't mounted.  Missing reference deps
(torchvision/wandb/panopticapi) are stubbed — only the solver math runs.
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REFERENCE = "/root/reference"
if not os.path.isdir(REFERENCE):
    pytest.skip("reference repo not available", allow_module_level=True)

# Stub the reference's heavyweight/unavailable imports (utils.py pulls
# torchvision/wandb/panopticapi at module level).
for name, attrs in [
    ("torchvision", {}),
    ("torchvision.utils", {"save_image": None, "make_grid": None,
                           "draw_segmentation_masks": None}),
    ("wandb", {"log": lambda *a, **k: None}),
    ("panopticapi", {}),
    ("panopticapi.utils", {"IdGenerator": object}),
]:
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod

sys.path.insert(0, REFERENCE)
import dpm_solver_pp as ref_solver  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from panopticdiffusionmodels_tpu.diffusion.schedule import (  # noqa: E402
    stable_diffusion_beta_schedule,
)
from panopticdiffusionmodels_tpu.samplers import DPMSolver, NoiseScheduleVP  # noqa: E402

BETAS = stable_diffusion_beta_schedule()


def _analytic(x, t01, alpha_of, sigma_of, lib):
    """A smooth, nonlinear 'noise prediction' both frameworks can evaluate:
    eps(x, t) = (x - alpha_t * tanh(x)) / sigma_t  (x0-pred = tanh(x))."""
    a = alpha_of(t01)
    s = sigma_of(t01)
    return (x - a * lib.tanh(x)) / s


@pytest.mark.parametrize("steps,order", [(15, 3), (10, 2), (8, 1)])
def test_image_trajectory_matches_reference(steps, order):
    t_np = np.linspace(0, 1, 20001)
    ours_ns = NoiseScheduleVP("discrete", betas=BETAS)
    alpha_np = ours_ns.marginal_alpha(t_np)
    sigma_np = np.maximum(ours_ns.marginal_std(t_np), 1e-12)

    x0 = np.random.default_rng(0).normal(size=(2, 4, 4, 3)).astype(np.float32)

    # ---- reference torch run -------------------------------------------
    ref_ns = ref_solver.NoiseScheduleVP(
        schedule="discrete", betas=torch.tensor(BETAS).float()
    )

    def ref_model(x, t, panoptic=None, mask_token=None, use_ground_truth=False,
                  enable_panoptic=False):
        a = ref_ns.marginal_alpha(t).reshape(-1, 1, 1, 1)
        s = ref_ns.marginal_std(t).reshape(-1, 1, 1, 1)
        noise = (x - a * torch.tanh(x)) / s
        if mask_token is None:
            return noise, None
        return noise, torch.tanh(mask_token)

    rsolver = ref_solver.DPM_Solver(ref_model, ref_ns, predict_x0=True)
    method = "fast" if order >= 2 else "singlestep"
    with torch.no_grad():
        ref_out = rsolver.sample(
            torch.tensor(x0), steps=steps, eps=1.0 / 1000, T=1.0, order=order,
            method=method,
        )
    ref_x = (ref_out[0] if isinstance(ref_out, tuple) else ref_out).numpy()

    # ---- ours ------------------------------------------------------------
    alpha_j = jnp.asarray(alpha_np, jnp.float32)
    sigma_j = jnp.asarray(sigma_np, jnp.float32)
    t_j = jnp.asarray(t_np, jnp.float32)

    def our_model(x, t_vec, mask_token=None):
        a = jnp.interp(t_vec[0], t_j, alpha_j)
        s = jnp.interp(t_vec[0], t_j, sigma_j)
        noise = (x - a * jnp.tanh(x)) / s
        if mask_token is None:
            return noise
        return noise, jnp.tanh(mask_token)

    # NOTE: our model interpolates alpha/sigma on a fine grid while the
    # reference evaluates its interpolation exactly; keep tolerance loose
    # enough for that (grid is 2e4 knots -> ~1e-5 relative).
    solver = DPMSolver(our_model, ours_ns, predict_x0=True)
    ours = solver.sample(
        jnp.asarray(x0), steps=steps, eps=1.0 / 1000, T=1.0, order=order,
        method=method,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_x, rtol=2e-3, atol=2e-3)


def test_mask_trajectory_matches_reference():
    """The joint (x, mask) trajectory — including the reference's mask_s1/s2
    sign convention — must match its solver output."""
    steps, order = 15, 3
    ours_ns = NoiseScheduleVP("discrete", betas=BETAS)
    t_np = np.linspace(0, 1, 20001)
    alpha_np = ours_ns.marginal_alpha(t_np)
    sigma_np = np.maximum(ours_ns.marginal_std(t_np), 1e-12)

    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    m0 = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)

    ref_ns = ref_solver.NoiseScheduleVP(
        schedule="discrete", betas=torch.tensor(BETAS).float()
    )

    def ref_model(x, t, panoptic=None, mask_token=None, use_ground_truth=False,
                  enable_panoptic=False):
        a = ref_ns.marginal_alpha(t).reshape(-1, 1, 1, 1)
        s = ref_ns.marginal_std(t).reshape(-1, 1, 1, 1)
        noise = (x - a * torch.tanh(x)) / s
        pred_mask = torch.tanh(mask_token + 0.1 * x.mean())
        return noise, pred_mask

    rsolver = ref_solver.DPM_Solver(ref_model, ref_ns, predict_x0=True)
    with torch.no_grad():
        ref_x, ref_mask = rsolver.sample(
            torch.tensor(x0), steps=steps, eps=1.0 / 1000, T=1.0, order=order,
            method="fast", mask_token=torch.tensor(m0), enable_mask_opt=True,
            enable_panoptic=True,
        )

    alpha_j = jnp.asarray(alpha_np, jnp.float32)
    sigma_j = jnp.asarray(sigma_np, jnp.float32)
    t_j = jnp.asarray(t_np, jnp.float32)

    def our_model(x, t_vec, mask_token=None):
        a = jnp.interp(t_vec[0], t_j, alpha_j)
        s = jnp.interp(t_vec[0], t_j, sigma_j)
        noise = (x - a * jnp.tanh(x)) / s
        pred_mask = jnp.tanh(mask_token + 0.1 * jnp.mean(x))
        return noise, pred_mask

    solver = DPMSolver(our_model, ours_ns, predict_x0=True)
    our_x, our_mask = solver.sample(
        jnp.asarray(x0), steps=steps, eps=1.0 / 1000, T=1.0, order=order,
        method="fast", mask_token=jnp.asarray(m0),
    )
    np.testing.assert_allclose(np.asarray(our_x), ref_x.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(our_mask), ref_mask.numpy(), rtol=2e-3, atol=2e-3)


def test_continuous_linear_solver_matches_upstream():
    """The continuous path (predict_x0=False, 'linear' schedule) vs the
    reference's unmodified upstream solver (dpm_solver_pytorch.py)."""
    import dpm_solver_pytorch as up

    ours_ns = NoiseScheduleVP("linear", beta_0=1e-4, beta_1=2e-2)
    ref_ns = up.NoiseScheduleVP(schedule="linear")

    x0 = np.random.default_rng(2).normal(size=(2, 4, 4, 3)).astype(np.float32)

    def ref_model(x, t_cont):
        # eps(x, t) = (x - alpha tanh(x)) / sigma, continuous time
        # (upstream NoiseScheduleVP has no marginal_alpha helper)
        a = torch.exp(ref_ns.marginal_log_mean_coeff(t_cont)).reshape(-1, 1, 1, 1)
        s = ref_ns.marginal_std(t_cont).reshape(-1, 1, 1, 1)
        return (x - a * torch.tanh(x)) / s

    rsolver = up.DPM_Solver(ref_model, ref_ns)  # upstream: eps-pred only
    with torch.no_grad():
        ref_x = rsolver.sample(
            torch.tensor(x0), steps=12, eps=1e-4, T=None, order=3,
            skip_type="logSNR", fast_version=True,
        ).numpy()

    t_np = np.linspace(1e-5, 1, 20001)
    alpha_j = jnp.asarray(ours_ns.marginal_alpha(t_np), jnp.float32)
    sigma_j = jnp.asarray(np.maximum(ours_ns.marginal_std(t_np), 1e-12), jnp.float32)
    t_j = jnp.asarray(t_np, jnp.float32)

    def our_model(x, t_vec, mask_token=None):
        a = jnp.interp(t_vec[0], t_j, alpha_j)
        s = jnp.interp(t_vec[0], t_j, sigma_j)
        return (x - a * jnp.tanh(x)) / s

    solver = DPMSolver(our_model, ours_ns, predict_x0=False)
    # the upstream fast plan: coarse K-grid + default r1/r2
    ours = solver.sample(
        jnp.asarray(x0), steps=12, eps=1e-4, T=1.0, order=3,
        method="fast_upstream", skip_type="logSNR",
    )
    np.testing.assert_allclose(np.asarray(ours), ref_x, rtol=2e-3, atol=2e-3)


def test_euler_maruyama_ode_matches_reference():
    """Deterministic EM-ODE trajectory vs reference sde.euler_maruyama."""
    import sde as ref_sde

    from panopticdiffusionmodels_tpu.diffusion.sde import ODE, ScoreModel, VPSDE
    from panopticdiffusionmodels_tpu.samplers import euler_maruyama

    x0 = np.random.default_rng(3).normal(size=(2, 4, 4, 3)).astype(np.float32)

    class TorchNet(torch.nn.Module):
        def forward(self, x, t_scaled, **kw):
            return torch.tanh(x) * 0.3

    ref_model = ref_sde.ScoreModel(TorchNet(), pred="noise_pred", sde=ref_sde.VPSDE())
    with torch.no_grad():
        ref_x = ref_sde.euler_maruyama(
            ref_sde.ODE(ref_model), torch.tensor(x0), sample_steps=50
        ).numpy()

    our_model = ScoreModel(
        lambda x, t_scaled, **kw: jnp.tanh(x) * 0.3, "noise_pred", VPSDE()
    )
    ours = euler_maruyama(
        jax.random.PRNGKey(0), ODE(our_model), jnp.asarray(x0), sample_steps=50
    )
    np.testing.assert_allclose(np.asarray(ours), ref_x, rtol=2e-4, atol=2e-4)
