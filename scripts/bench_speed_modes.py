#!/usr/bin/env python
"""Speed-mode evidence for the headline pipeline: throughput + deviation.

For each requested mode (exact, forecast-skip accel taus, guidance intervals)
this runs the full ImageNet-256 U-ViT-L/2 50-NFE pipeline on the SAME seed and
reports img/s plus the relative L2 / mean-abs deviation of the decoded images
vs the exact protocol.  Results feed the speed-mode tables in BENCH.md.

Note the two modes differ in kind: accel approximates the SAME trajectory
(deviation = numerical error), while cfg_interval is a deliberately different
guidance protocol (arXiv:2404.07724 reports it IMPROVES FID); its deviation is
reported only to show the output stays in-distribution, not as an error bar.

Usage: python scripts/bench_speed_modes.py [accel=<tau>] [interval=<lo>,<hi>]
       [combo=<tau>:<lo>,<hi>] [gelu=tanh] [full=<tau>:<lo>,<hi>] ...
Defaults: accel=0.2 accel=0.3 interval=0.0,0.5 combo=0.2:0.0,0.5
(The recommended certified mode since round 5 is gelu=tanh + accel=0.2 —
intervals are demoted on every geometry, BENCH.md round 5; the interval
specs remain measurable here for evidence runs.)
One TPU process at a time (CLAUDE.md).
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
import numpy as np


def run_mode(batch, accel, interval, gelu=""):
    os.environ["BENCH_ACCEL"] = str(accel)
    os.environ["BENCH_CFG_INTERVAL"] = (
        ",".join(str(v) for v in interval) if interval else ""
    )
    os.environ["BENCH_GELU"] = gelu
    import bench

    pipeline, params, vae_params = bench.build_pipeline(batch)
    key = jax.random.PRNGKey(42)
    y = jnp.zeros((batch,), jnp.int32)

    def run(k):
        img = pipeline(params, vae_params, k, y)
        float(jnp.sum(img[:1, ::64, ::64, :]))  # force device->host sync
        return img

    run(key)  # compile
    times, img = [], None
    for i in range(3):
        k = jax.random.fold_in(key, 7)  # fixed seed so outputs are comparable
        t0 = time.perf_counter()
        img = run(k)
        times.append(time.perf_counter() - t0)
    return batch / min(times), np.asarray(img, np.float32)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    modes = sys.argv[1:] or ["accel=0.2", "accel=0.3", "interval=0.0,0.5",
                             "combo=0.2:0.0,0.5"]

    base_ips, base_img = run_mode(batch, 0.0, None)
    print(f"exact protocol: {base_ips:.2f} img/s")
    base_norm = float(np.linalg.norm(base_img))

    for mode in modes:
        kind, _, val = mode.partition("=")
        if kind == "accel":
            ips, img = run_mode(batch, float(val), None)
        elif kind == "interval":
            ips, img = run_mode(batch, 0.0, tuple(float(v) for v in val.split(",")))
        elif kind == "combo":  # combo=<tau>:<lo>,<hi> — both modes together
            tau, _, iv = val.partition(":")
            ips, img = run_mode(batch, float(tau), tuple(float(v) for v in iv.split(",")))
        elif kind == "gelu":  # gelu=tanh — tanh GELU alone (nnet.gelu_approx)
            ips, img = run_mode(batch, 0.0, None, gelu=val)
        elif kind == "full":  # full=<tau>:<lo>,<hi> — tanh GELU + accel + interval
            tau, _, iv = val.partition(":")
            ips, img = run_mode(batch, float(tau),
                                tuple(float(v) for v in iv.split(",")), gelu="tanh")
        else:
            raise SystemExit(f"unknown mode {mode}")
        rel = float(np.linalg.norm(img - base_img)) / base_norm
        mad = float(np.abs(img - base_img).mean())
        print(
            f"{mode:18s}: {ips:6.2f} img/s ({ips / base_ips:.2f}x)  "
            f"rel L2 dev {100 * rel:.2f}%  mean abs dev {mad:.4f}"
        )


if __name__ == "__main__":
    main()
