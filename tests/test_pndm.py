"""PNDM/PLMS sampler: plan semantics + trajectory parity against a minimal
torch implementation of the SD-1.5 PNDMScheduler step (skip_prk_steps=True,
set_alpha_to_one=False, steps_offset=1, epsilon prediction) — the scheduler
the reference drives its UNet family with (train_t2i_discrete.py:525-534)."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from panopticdiffusionmodels_tpu.diffusion.schedule import (
    Schedule,
    stable_diffusion_beta_schedule,
)
from panopticdiffusionmodels_tpu.samplers.pndm import make_pndm_plan, pndm_sample


def _sd_alphas_cumprod():
    betas = stable_diffusion_beta_schedule()
    return np.cumprod(1.0 - np.asarray(betas, np.float64))


class TorchPLMS:
    """Stateful PLMS stepper with diffusers PNDMScheduler semantics."""

    def __init__(self, acp, num_inference_steps, num_train_timesteps=1000,
                 steps_offset=1):
        self.acp = torch.from_numpy(np.asarray(acp, np.float64))
        self.final_acp = self.acp[0]  # set_alpha_to_one=False
        self.N = num_train_timesteps
        self.K = num_inference_steps
        self.ratio = num_train_timesteps // num_inference_steps
        base = (np.arange(num_inference_steps) * self.ratio).round().astype(np.int64)
        base += steps_offset
        self.timesteps = np.concatenate(
            [base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def _prev(self, sample, t, t_prev, eps):
        a_t = self.acp[t] if t >= 0 else self.final_acp
        a_prev = self.acp[t_prev] if t_prev >= 0 else self.final_acp
        sample_coeff = (a_prev / a_t) ** 0.5
        denom = a_t * (1 - a_prev) ** 0.5 + (a_t * (1 - a_t) * a_prev) ** 0.5
        return sample_coeff * sample - (a_prev - a_t) * eps / denom

    def step(self, eps, t, sample):
        t_prev = t - self.ratio
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(eps)
        else:
            t_prev = t
            t = t + self.ratio
        if len(self.ets) == 1 and self.counter == 0:
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            eps = (eps + self.ets[-1]) / 2
            sample = self.cur_sample
        elif len(self.ets) == 2:
            eps = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            eps = (23 * self.ets[-1] - 16 * self.ets[-2] + 5 * self.ets[-3]) / 12
        else:
            eps = (55 * self.ets[-1] - 59 * self.ets[-2] + 37 * self.ets[-3]
                   - 9 * self.ets[-4]) / 24
        out = self._prev(sample.double(), t, t_prev, eps.double()).float()
        self.counter += 1
        return out


def test_plan_matches_scheduler_timesteps():
    plan = make_pndm_plan(50)
    ref = TorchPLMS(_sd_alphas_cumprod(), 50)
    np.testing.assert_array_equal(plan.timesteps, ref.timesteps)
    # skip_prk_steps duplicates the second-from-last training timestep
    assert plan.timesteps[1] == plan.timesteps[2] == 961
    assert plan.timesteps[0] == 981 and plan.timesteps[-1] == 1
    # counter==1 re-does the first interval from the saved sample
    assert plan.use_cur_sample[1] and not plan.store_et[1]
    assert plan.ts_used[1] == 981 and plan.prev_ts[1] == 961


def _analytic_eps(x, t, N=1000):
    """Smooth, state- and time-dependent epsilon (no network needed)."""
    tt = (t.reshape((-1,) + (1,) * (x.ndim - 1)) / N)
    return 0.3 * x * tt + jnp.sin(3.0 * tt) - 0.1 * x**2 / (1.0 + tt)


def test_trajectory_parity_vs_torch_plms():
    acp = _sd_alphas_cumprod()
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)

    for K in (10, 50):
        ref = TorchPLMS(acp, K)
        x_ref = torch.from_numpy(x0.copy())
        for t in ref.timesteps:
            tv = np.full((x0.shape[0],), float(t), np.float32)
            eps = torch.from_numpy(
                np.asarray(_analytic_eps(jnp.asarray(x_ref.numpy()),
                                         jnp.asarray(tv)), np.float32))
            x_ref = ref.step(eps, int(t), x_ref)

        out = jax.jit(
            lambda x: pndm_sample(_analytic_eps, x, K, acp)
        )(jnp.asarray(x0))
        np.testing.assert_allclose(
            np.asarray(out), x_ref.numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"PLMS trajectory diverged at K={K}",
        )


def test_pndm_panoptic_contract():
    """Panoptic PNDM: mask_token held fixed, last pred_mask returned
    (reference train_t2i_discrete.py:528-534 never advances mask_token)."""
    acp = _sd_alphas_cumprod()
    seen_masks = []

    def model_fn(x, t, mask_token=None):
        seen_masks.append(mask_token)
        return _analytic_eps(x, t), mask_token * 0.5

    x0 = jnp.ones((1, 4, 4, 2))
    m0 = jnp.full((1, 8, 8, 4), 2.0)
    x, pm = pndm_sample(model_fn, x0, 5, acp, mask_token=m0)
    assert x.shape == x0.shape and np.isfinite(np.asarray(x)).all()
    np.testing.assert_allclose(np.asarray(pm), 1.0)  # 0.5 * fixed mask


def test_schedule_cum_alphas_is_diffusers_table():
    """trainer feeds schedule.cum_alphas[1:]; it must equal the diffusers
    alphas_cumprod for the SD beta schedule."""
    sched = Schedule(stable_diffusion_beta_schedule())
    np.testing.assert_allclose(sched.cum_alphas[1:], _sd_alphas_cumprod(),
                               rtol=1e-12)
