#!/usr/bin/env python
"""A/B of sample2dir's dispatch/write overlap on the real chip.

Runs the headline sampling pipeline (ImageNet-256 U-ViT-L/2, 50-NFE CFG +
VAE decode, batch 32) through `evaluation.sampler_io.sample2dir` — the loop
the 10k/50k-sample FID evals run — with the one-deep pipeline on and off.
Host PNG encoding (PIL) overlaps device sampling when on; the delta is the
host time the chip no longer waits for.

Usage: python scripts/bench_eval_io.py   (one TPU process at a time)
Honors BENCH_BATCH / BENCH_N.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (bench sets the compile cache on import)

import bench  # headline components: same model/params/pipeline as bench.py

import numpy as np


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    n_samples = int(os.environ.get("BENCH_N", "160"))
    from panopticdiffusionmodels_tpu.evaluation.sampler_io import sample2dir

    pipeline, params, vae_params = bench.build_pipeline(batch)
    key = jax.random.PRNGKey(0)
    y = jax.numpy.zeros((batch,), jax.numpy.int32)

    counter = {"n": 0, "k": key}

    def sample_fn(n):
        idx = np.arange(counter["n"], counter["n"] + n)
        counter["n"] += n
        counter["k"], k = jax.random.split(counter["k"])
        return idx, pipeline(params, vae_params, k, y)

    # warm the compile once
    float(np.asarray(pipeline(params, vae_params, key, y))[0, 0, 0, 0])

    png_dir = None
    for overlap in (False, True):
        counter["n"], counter["k"] = 0, key
        d = tempfile.mkdtemp(prefix=f"evalio{int(overlap)}_")
        t0 = time.perf_counter()
        sample2dir(d, n_samples, batch, sample_fn,
                   unpreprocess_fn=lambda v: np.clip((v + 1) / 2, 0, 1),
                   overlap=overlap)
        dt = time.perf_counter() - t0
        n_png = len(os.listdir(d))
        if png_dir is None:
            png_dir = d
        else:
            shutil.rmtree(d)
        print(f"overlap={overlap}: {n_samples} samples + {n_png} PNG writes "
              f"in {dt:.2f}s = {n_samples / dt:.2f} img/s")

    # FID scoring pass over the written PNGs (random Inception weights —
    # throughput is weight-independent): sequential vs threaded-decode +
    # one-deep device overlap.
    from panopticdiffusionmodels_tpu.evaluation.fid import dir_statistics
    from panopticdiffusionmodels_tpu.evaluation.inception import (
        make_extractor,
        random_params,
    )

    extractor = make_extractor(random_params(0))
    dir_statistics(png_dir, extractor, batch_size=50, workers=0)  # warm compile
    for workers in (0, 8):
        t0 = time.perf_counter()
        dir_statistics(png_dir, extractor, batch_size=50, workers=workers)
        dt = time.perf_counter() - t0
        print(f"fid stats workers={workers}: {n_samples} PNGs in {dt:.2f}s "
              f"= {n_samples / dt:.1f} img/s")
    shutil.rmtree(png_dir)


if __name__ == "__main__":
    main()
