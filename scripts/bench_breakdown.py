#!/usr/bin/env python
"""Wall-time breakdown of the headline pipeline (ImageNet-256 U-ViT-L/2,
50-NFE DPM-Solver++ CFG + VAE decode) on the real chip.

Measures, per batch:
  * full pipeline        (bench.py protocol)
  * solver only          (no VAE decode)
  * decode only          (VAE decoder on a fixed latent)
  * one CFG forward      (the 2x-batch network call the solver makes per NFE)

so the remaining-MFU discussion in BENCH.md is grounded in measured shares,
not FLOP ratios.  Run with BENCH_BATCH / BENCH_CFG_INTERVAL / BENCH_ACCEL like
bench.py.  One TPU process at a time (CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0][:1].astype(jnp.float32)))


def timeit(fn, *args, reps=3):
    fn(*args)  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    import bench

    from panopticdiffusionmodels_tpu.diffusion.cfg import make_cfg_class_cond
    from panopticdiffusionmodels_tpu.samplers import DPMSolver

    # One construction, shared with the full pipeline: the component timings
    # below measure EXACTLY the objects the headline runs.
    components = bench.build_components()
    model, params, vae, vae_params, schedule, ns = components
    pipeline, params, vae_params = bench.build_pipeline(batch, components)
    ci_env = os.environ.get("BENCH_CFG_INTERVAL", "")
    cfg_interval = tuple(float(v) for v in ci_env.split(",")) if ci_env else None

    @jax.jit
    def solver_only(params, key, y):
        cfg_fn = make_cfg_class_cond(
            lambda xx, tt, yy: model.apply(params, xx, tt, yy),
            null_label=1000, scale=0.4, enabled=True,
        )
        solver = DPMSolver(
            lambda xx, tt, mask_token=None, cfg_on=True: cfg_fn(
                xx, tt * schedule.N, y, cfg_on=cfg_on),
            ns, predict_x0=True,
            accel_tau=float(os.environ.get("BENCH_ACCEL", "0")),
            cfg_interval=cfg_interval,
        )
        z = jax.random.normal(key, (batch, 32, 32, 4))
        return solver.sample(z, steps=50, eps=1.0 / 1000, T=1.0, order=3, method="fast")

    @jax.jit
    def decode_only(vae_params, z):
        return vae.apply(vae_params, z, method="decode")

    @jax.jit
    def one_cfg_forward(params, x2, t2, y2):
        return model.apply(params, x2, t2, y2)

    key = jax.random.PRNGKey(0)
    y = jnp.zeros((batch,), jnp.int32)
    z = jax.random.normal(key, (batch, 32, 32, 4))
    x2 = jnp.concatenate([z, z])
    t2 = jnp.full((2 * batch,), 500.0)
    y2 = jnp.concatenate([y, jnp.full((batch,), 1000, jnp.int32)])

    t_full = timeit(lambda: sync(pipeline(params, vae_params, key, y)))
    t_solver = timeit(lambda: sync(solver_only(params, key, y)))
    t_decode = timeit(lambda: sync(decode_only(vae_params, z)))
    t_fwd = timeit(lambda: sync(one_cfg_forward(params, x2, t2, y2)))

    print(f"batch={batch} cfg_interval={cfg_interval}")
    print(f"full pipeline : {t_full*1e3:9.1f} ms   ({batch / t_full:.2f} img/s)")
    print(f"solver only   : {t_solver*1e3:9.1f} ms   ({100 * t_solver / t_full:.1f}% of full)")
    print(f"decode only   : {t_decode*1e3:9.1f} ms   ({100 * t_decode / t_full:.1f}% of full)")
    print(f"1 CFG forward : {t_fwd*1e3:9.1f} ms   (x50 = {50 * t_fwd * 1e3:.0f} ms, "
          f"{100 * 50 * t_fwd / t_full:.1f}% of full; incl ~28 ms tunnel floor each)")
    print(f"residual (full - solver - decode): {(t_full - t_solver - t_decode) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
