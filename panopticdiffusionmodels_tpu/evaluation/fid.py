"""FID: Frechet distance, activation statistics, and stat-file handling.

The math follows pytorch-fid exactly (reference `tools/fid_score.py:149-211`):
FID = |mu1 - mu2|^2 + tr(S1 + S2 - 2 sqrt(S1 S2)), with the same eps-jitter
fallback for near-singular covariances.  Accepts the reference's pre-computed
`.npz` stat files (keys 'mu'/'sigma') unchanged, so published FID protocols
reproduce bit-for-bit on the statistics side.

The activation extractor is the FID-specific InceptionV3 in `inception.py`
(jitted, bf16-capable, batched on device).
"""
from __future__ import annotations

import os
from typing import Callable, Iterable, Tuple

import numpy as np
from scipy import linalg


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """reference `tools/fid_score.py:149-199` (numpy/scipy semantics identical)."""
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2

    def _sqrtm(m):
        out = linalg.sqrtm(m)
        return out[0] if isinstance(out, tuple) else out

    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    tr_covmean = np.trace(covmean)
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean)


def compute_statistics(activations: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) activations -> (mu, sigma) (reference `tools/fid_score.py:202-236`)."""
    mu = np.mean(activations, axis=0)
    sigma = np.cov(activations, rowvar=False)
    return mu, sigma


def load_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a reference-format stats npz (keys mu/sigma,
    reference `tools/fid_score.py:218-221`)."""
    with np.load(path) as f:
        return f["mu"][:], f["sigma"][:]


def save_stats(path: str, mu: np.ndarray, sigma: np.ndarray):
    np.savez(path, mu=mu, sigma=sigma)


def fid_from_stats(stat_a, stat_b) -> float:
    """stat_*: either (mu, sigma) tuples or paths to npz files."""
    if isinstance(stat_a, (str, os.PathLike)):
        stat_a = load_stats(stat_a)
    if isinstance(stat_b, (str, os.PathLike)):
        stat_b = load_stats(stat_b)
    return frechet_distance(stat_a[0], stat_a[1], stat_b[0], stat_b[1])


def activations_from_images(
    images: Iterable[np.ndarray],
    extractor: Callable[[np.ndarray], np.ndarray],
) -> np.ndarray:
    """Run the (jitted) pool3 extractor over batches of [0,1] NHWC images."""
    feats = [np.asarray(extractor(batch)) for batch in images]
    return np.concatenate(feats, axis=0)


def fid_given_samples(
    samples: np.ndarray,
    ref_stat_path: str,
    extractor: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 50,
) -> float:
    """FID of [0,1] NHWC samples vs. a reference stats npz — the in-training FID
    gate (reference `train.py:142`, `tools/fid_score.py:239-260`)."""
    batches = [
        samples[i : i + batch_size] for i in range(0, len(samples), batch_size)
    ]
    acts = activations_from_images(batches, extractor)
    mu, sigma = compute_statistics(acts)
    return fid_from_stats((mu, sigma), ref_stat_path)


def dir_statistics(
    path: str,
    extractor: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 50,
    workers: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) over every image in a directory.

    With `workers > 0` (default) PNG decoding runs on a thread pool (PIL
    releases the GIL in the decode) and the extractor's device work is one
    batch deep — batch i+1 decodes on host while batch i runs on device
    (jax async dispatch; np.asarray deferred one step).  `workers=0` is the
    sequential reference path; outputs are identical (order-preserving).
    """
    from PIL import Image

    names = sorted(
        n for n in os.listdir(path)
        if n.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not names:
        raise ValueError(f"dir_statistics: no images found in {path!r}")

    def load(n):
        img = np.asarray(Image.open(os.path.join(path, n)).convert("RGB"))
        return img.astype(np.float32) / 255.0

    chunks = [names[i : i + batch_size] for i in range(0, len(names), batch_size)]
    feats = []
    if workers <= 0:
        for chunk in chunks:
            feats.append(np.asarray(extractor(np.stack([load(n) for n in chunk]))))
    else:
        from concurrent.futures import ThreadPoolExecutor

        from ..utils import one_deep

        with ThreadPoolExecutor(workers) as ex:
            dispatch = lambda chunk: extractor(np.stack(list(ex.map(load, chunk))))
            for _, out in one_deep(chunks, dispatch):
                feats.append(np.asarray(out))
    return compute_statistics(np.concatenate(feats, axis=0))


def fid_given_paths(
    path_a: str,
    path_b: str,
    extractor: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 50,
) -> float:
    """FID between two stat-files/image-dirs (reference `tools/fid_score.py:239-260`).
    A path ending in .npz is read as precomputed statistics."""

    def stats_for(path):
        if path.endswith(".npz"):
            return load_stats(path)
        return dir_statistics(path, extractor, batch_size)

    a = stats_for(path_a)
    b = stats_for(path_b)
    return frechet_distance(a[0], a[1], b[0], b[1])


def _main():
    """CLI: python -m panopticdiffusionmodels_tpu.evaluation.fid A B
    (paths: image dirs or .npz stats — the reference tools/fid_score.py CLI)."""
    import argparse

    p = argparse.ArgumentParser(description="FID between two image dirs / stat files")
    p.add_argument("path_a")
    p.add_argument("path_b")
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument(
        "--inception", default="assets/fid_stats/pt_inception-2015-12-05.pth"
    )
    p.add_argument("--save-stats", default=None,
                   help="compute stats of path_a and write them to this npz instead")
    args = p.parse_args()
    from .inception import load_torch_inception_weights, make_extractor

    extractor = make_extractor(load_torch_inception_weights(args.inception))
    if args.save_stats:
        mu, sigma = dir_statistics(args.path_a, extractor, args.batch_size)
        save_stats(args.save_stats, mu, sigma)
        print(f"saved stats of {args.path_a} to {args.save_stats}")
        return
    print("FID:", fid_given_paths(args.path_a, args.path_b, extractor, args.batch_size))


if __name__ == "__main__":
    _main()
