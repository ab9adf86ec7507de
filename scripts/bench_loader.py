#!/usr/bin/env python
"""Host data-feed throughput: C++ fastloader vs the Python Loader.

Builds a synthetic MS-COCO feature directory at the REAL geometry
(moments (8,32,32) f32, CLIP context (77,768) f32, seg (256,256) i64 —
the `{i}.npy`/`{i}_{k}.npy`/`{i}_seg.npy` contract, reference
`datasets.py:564-613`) and measures sustained batch assembly: .npy parse,
CHW->HWC transpose, random caption choice, 4x4 seg min-pool.

Pure host benchmark (no TPU needed).  The number to beat is the training
step time: the panoptic trainer consumes ~168 img/s on one v5e chip, so the
loader must sustain well above that per host.

Usage: python scripts/bench_loader.py [n_samples] [batch]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_dir(d, n):
    rng = np.random.default_rng(0)
    for i in range(n):
        np.save(os.path.join(d, f"{i}.npy"),
                rng.normal(size=(8, 32, 32)).astype(np.float32))
        for k in range(5):
            np.save(os.path.join(d, f"{i}_{k}.npy"),
                    rng.normal(size=(77, 768)).astype(np.float32))
        np.save(os.path.join(d, f"{i}_seg.npy"),
                rng.integers(0, 201, (256, 256)).astype(np.int64))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_batches = 40

    from panopticdiffusionmodels_tpu.data import native_loader
    from panopticdiffusionmodels_tpu.data.datasets import MSCOCOFeatureDataset
    from panopticdiffusionmodels_tpu.data.loader import Loader

    with tempfile.TemporaryDirectory() as d:
        build_dir(d, n)

        if native_loader.available():
            nat = native_loader.NativeFeatureLoader(
                d, batch_size=batch, moments_shape=(8, 32, 32),
                context_shape=(77, 768), seg_in=256, mask_size=64,
                num_captions=5, num_threads=8, seed=0,
            )
            it = iter(nat)
            next(it)  # warm (thread pool spin-up)
            t0 = time.perf_counter()
            for _ in range(n_batches):
                next(it)
            dt = time.perf_counter() - t0
            print(f"native fastloader: {n_batches * batch / dt:8.1f} samples/s "
                  f"({1e3 * dt / n_batches:.1f} ms/batch of {batch})")
        else:
            print("native fastloader unavailable")

        ds = MSCOCOFeatureDataset(d, mask_size=64)
        loader = Loader(ds, batch_size=batch, num_workers=8, seed=0)
        it = iter(loader)
        next(it)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(it)
        dt = time.perf_counter() - t0
        print(f"python Loader:     {n_batches * batch / dt:8.1f} samples/s "
              f"({1e3 * dt / n_batches:.1f} ms/batch of {batch})")


if __name__ == "__main__":
    main()
