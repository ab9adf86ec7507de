"""Euler-Maruyama integrator for reverse SDE / probability-flow ODE.

One `lax.scan` over a host-precomputed (s, t) step grid — the whole 1000-step
CIFAR sampler jits into a single XLA program, unlike the per-step Python loop of
the reference (`sde.py:243-267`).  The zero-noise final step (s == 0) is handled
with a per-step noise multiplier baked into the scanned coefficients, so there is
no data-dependent branch on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np



def euler_maruyama(
    key,
    rsde,
    x_init,
    sample_steps: int,
    eps: float = 1e-3,
    T: float = 1.0,
    **model_kwargs,
):
    """Integrate rsde (ReverseSDE or ODE) from T to 0.

    rsde.drift(x, t, **kwargs) and rsde.diffusion(t) follow
    `panopticdiffusionmodels_tpu.diffusion.sde`.
    """
    timesteps = np.append(0.0, np.linspace(eps, T, sample_steps))
    s_arr = timesteps[:-1][::-1].copy()  # target times, descending pairs
    t_arr = timesteps[1:][::-1].copy()
    noise_on = (s_arr != 0.0).astype(np.float32)  # final step: mean only

    s_dev = jnp.asarray(s_arr, dtype=x_init.dtype)
    t_dev = jnp.asarray(t_arr, dtype=x_init.dtype)
    gate = jnp.asarray(noise_on, dtype=x_init.dtype)
    keys = jax.random.split(key, len(s_arr))

    def body(x, step):
        s, t, g, k = step
        drift = rsde.drift(x, t, **model_kwargs)
        diffusion = rsde.diffusion(t)
        dt = s - t  # negative
        mean = x + drift * dt
        sigma = diffusion * jnp.sqrt(-dt)
        noise = jax.random.normal(k, x.shape, dtype=x.dtype)
        x = mean + g * sigma * noise
        return x, None

    x, _ = jax.lax.scan(body, x_init, (s_dev, t_dev, gate, keys))
    return x
