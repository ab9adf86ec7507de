#!/usr/bin/env python
"""Protocol-scale eval rehearsal: sample2dir -> dir_statistics -> FID, timed.

Round-3 verdict item #6: prove the reference's routine FID-gate loop
(`/root/reference/train.py:182-196` — sample N to a directory, extract
Inception statistics, Frechet distance against reference statistics) is
operationally feasible END-TO-END in this framework at protocol scale, with
wall-clock recorded for every phase: PNG naming contract, dispatch/write
overlap, host memory, feature extraction, and the sqrtm all exercised in one
run on the flagship geometry.

Phases (flagship ImageNet-256 U-ViT-L/2, 50-NFE CFG + VAE decode, batch 32):
  1. sample2dir    N samples -> PNG dir (one-deep dispatch/write overlap)
  2. dir_statistics  PNG dir -> (mu, sigma) with the parity-proven FID
                   InceptionV3 at fixed random weights (threaded decode)
  3. frechet_distance  vs the quality gate's exactB statistics
                   (quality_gate/imagenet/exactB.npz) when present, else vs a
                   second mu/sigma of the same run (self-FD ~ 0 sanity).

Prints one JSON line with per-phase seconds, end-to-end img/s, and the
extrapolated wall-clock for the reference's 10k and 50k FID protocols.

Env: REH_N (default 1024), REH_BATCH (default 32), REH_DIR.
One TPU process at a time (CLAUDE.md).
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def main():
    n = int(os.environ.get("REH_N", "1024"))
    batch = int(os.environ.get("REH_BATCH", "32"))
    out_dir = os.environ.get("REH_DIR", "/tmp/eval_rehearsal")
    png_dir = os.path.join(out_dir, "samples")
    shutil.rmtree(png_dir, ignore_errors=True)

    import bench
    from panopticdiffusionmodels_tpu.evaluation.fid import (
        dir_statistics,
        frechet_distance,
    )
    from panopticdiffusionmodels_tpu.evaluation.inception import (
        make_extractor,
        random_params,
    )
    from panopticdiffusionmodels_tpu.evaluation.sampler_io import sample2dir

    pipeline, params, vae_params = bench.build_pipeline(batch)
    key = jax.random.PRNGKey(4242)
    state = {"i": 0}

    def sample_fn(nb):
        # No device->host sync in here: sample2dir's one-deep overlap needs
        # the dispatch to return futures (sampler_io.py docstring).
        i = state["i"]
        state["i"] += 1
        k = jax.random.fold_in(key, i)
        y = jnp.asarray(
            np.random.RandomState(7000 + i).randint(0, 1000, size=batch),
            jnp.int32,
        )
        img = pipeline(params, vae_params, k, y)  # (B, 256, 256, 3) in [-1,1]
        idx = np.arange(i * batch, i * batch + nb)
        return idx, img[:nb]

    # warm the compile outside the timed region (protocol timing, not compile)
    idx0, img0 = sample_fn(batch)
    float(jnp.sum(img0[:1, ::64, ::64]))
    state["i"] = 0

    unpre = lambda x: np.clip(np.asarray(x, np.float32) * 0.5 + 0.5, 0.0, 1.0)

    t0 = time.perf_counter()
    sample2dir(png_dir, n, batch, sample_fn, unpreprocess_fn=unpre,
               verbose=False)
    t_sample = time.perf_counter() - t0

    n_png = len([f for f in os.listdir(png_dir) if f.endswith(".png")])
    assert n_png == n, (n_png, n)

    extractor = make_extractor(jax.device_put(random_params(0)))
    # warm BOTH chunk shapes outside the timed region (full chunks + the
    # remainder chunk) — XLA recompiles per input shape
    fb = 64
    extractor(np.zeros((fb, 256, 256, 3), np.float32))
    if n % fb:
        extractor(np.zeros((n % fb, 256, 256, 3), np.float32))
    t0 = time.perf_counter()
    mu, sigma = dir_statistics(png_dir, extractor, batch_size=fb)
    t_stats = time.perf_counter() - t0

    ref_npz = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        "quality_gate", "imagenet", "exactB.npz")
    t0 = time.perf_counter()
    if os.path.exists(ref_npz):
        ref = np.load(ref_npz)
        fd = frechet_distance(mu, sigma, ref["mu"], ref["sigma"])
        ref_kind = "quality_gate exactB"
    else:
        fd = frechet_distance(mu, sigma, mu, sigma)
        ref_kind = "self"
    t_fd = time.perf_counter() - t0

    total = t_sample + t_stats + t_fd
    result = {
        "metric": "eval_rehearsal_flagship",
        "n": n,
        "sample2dir_s": round(t_sample, 1),
        "dir_statistics_s": round(t_stats, 1),
        "frechet_s": round(t_fd, 1),
        "end_to_end_img_per_s": round(n / total, 2),
        "fd_vs_ref": fd,
        "ref": ref_kind,
        # stats+fd are O(N) + O(1); extrapolate both protocols linearly
        "protocol_10k_min": round((t_sample + t_stats) * (10000 / n) / 60 + t_fd / 60, 1),
        "protocol_50k_min": round((t_sample + t_stats) * (50000 / n) / 60 + t_fd / 60, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
