#!/usr/bin/env python
"""Serving latency/throughput benchmark: `serving.GenerationPipeline` on chip.

Characterizes the online-serving surface the reference does not have: for
each request batch size, the end-to-end `generate()` latency (50-NFE panoptic
dual-stream sampling + VAE decode + host postprocess: analog-bit decode,
[0,1] conversion) and the resulting images/sec, for the exact protocol and
for the gate-validated recommended speed configuration (gelu+accel=0.2).
Random weights — timing is weight-independent.

Run on the real chip: `python scripts/bench_serving.py [batch ...]`.
One TPU process at a time (CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np


def build(speed: bool):
    from panopticdiffusionmodels_tpu.configs import get_config
    from panopticdiffusionmodels_tpu.serving import GenerationPipeline

    config = get_config("mscoco_uvit_small")
    if speed:
        config.nnet.gelu_approx = True
        config.sample.accel = 0.2
    return GenerationPipeline.from_config(config)


def bench(pipe, n, reps=5):
    ctx = np.zeros((n, 77, 768), np.float32)
    pipe.generate(contexts=ctx)  # compile
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = pipe.generate(contexts=ctx, seed=r)
        # _postprocess already forces device->host (np.asarray)
        assert np.isfinite(out[0]).all()
        times.append(time.perf_counter() - t0)
    lat = float(np.median(times))
    return lat, n / lat


def main():
    batches = [int(b) for b in sys.argv[1:]] or [1, 4, 8, 32]
    for speed in (False, True):
        tag = "gelu+accel=0.2" if speed else "exact protocol"
        pipe = build(speed)
        print(f"--- {tag} (50 NFE, CFG, panoptic S/2 + VAE decode) ---")
        for n in batches:
            lat, ips = bench(pipe, n)
            print(f"batch {n:3d}: {lat * 1000:8.0f} ms/request  "
                  f"{ips:6.2f} img+mask/s", flush=True)


if __name__ == "__main__":
    main()
