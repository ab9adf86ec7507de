"""Distributed sample writer: generate -> gather -> rank-0 PNG writes.

Mirrors the reference `sample2dir` contract (reference `utils.py:561-640`):
amortized batching, the `idx + 10000*(idx//4992)` filename scheme that pairs
samples with the 5-captions-per-image CLIP-score protocol, analog-bit decoding
and colorized mask PNGs, and the mask-quality running metrics.

Under pjit the sampler already returns GLOBAL arrays; fetching to host is the
only "gather" needed (the reference calls accelerator.gather explicitly,
`utils.py:585-588`).
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import numpy as np

from ..diffusion.analog_bits import bits2int
from ..utils import amortize, one_deep
from .mask_metrics import color_map, eval_mask_cnt, get_colormap


def _save_png(arr01: np.ndarray, path: str):
    from PIL import Image

    arr = np.clip(arr01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def _fetch(x) -> np.ndarray:
    """Device -> host, multi-host safe.

    Under multi-process launch the sampler's outputs are GLOBAL jax.Arrays
    whose shards live on other hosts' devices; `np.asarray` on those raises.
    This is the reference's explicit `accelerator.gather` of samples +
    pred_mask + loss_mask before rank-0 writes (reference `utils.py:585-588`)
    — an all-gather so every process holds the full batch, then process 0
    alone writes/scores.  Single-process arrays take the plain fast path.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def make_grid(images01: np.ndarray, ncol: int = 8, pad: int = 2) -> np.ndarray:
    """Tile [0,1] NHWC images into one grid image (the reference's
    torchvision.make_grid role, `train.py:167`)."""
    n, h, w, c = images01.shape
    ncol = min(ncol, n)
    nrow = (n + ncol - 1) // ncol
    grid = np.ones(
        (nrow * (h + pad) + pad, ncol * (w + pad) + pad, c), dtype=np.float32
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0 : y0 + h, x0 : x0 + w] = images01[i]
    return grid


def save_grid(images01: np.ndarray, path: str, ncol: int = 8):
    _save_png(make_grid(images01, ncol), path)


def sample2dir(
    path: str,
    n_samples: int,
    batch_size: int,
    sample_fn: Callable,
    unpreprocess_fn: Optional[Callable] = None,
    use_panoptic: bool = False,
    mask_path: Optional[str] = None,
    mask_bits: int = 8,
    verbose: bool = True,
    overlap: bool = True,
):
    """sample_fn(batch_size) -> (indices, images[, pred_mask, loss_mask, panoptic]).

    Images in [-1,1] (unpreprocess maps to [0,1]); pred_mask are analog bits
    (B, H, W, mask_bits).  Returns dict of mask metrics when use_panoptic.

    With `overlap=True` (default) the loop runs one batch deep: batch i+1 is
    DISPATCHED (jax async dispatch returns futures) before batch i's outputs
    are fetched and written, so host-side PNG encoding / mask colorizing
    overlaps device sampling instead of idling the chip.  sample_fn must not
    force a device->host sync internally for the overlap to take effect
    (runner.make_eval_sample_fn keeps everything, incl. loss_mask, on device).
    """
    is_main = jax.process_index() == 0
    if is_main:
        os.makedirs(path, exist_ok=True)
        if use_panoptic and mask_path:
            os.makedirs(mask_path, exist_ok=True)
    colormap = get_colormap()
    state = {"idx": 0}
    loss_mask_all, cnt_diff_all = [], []

    def process(out, _batch_size):
        if use_panoptic:
            sample_idx, samples, pred_mask, loss_mask, panoptic = out
            lm = float(np.mean(_fetch(loss_mask)))
            if np.isfinite(lm):  # NaN marks "no ground truth for this batch"
                loss_mask_all.append(lm)
        else:
            sample_idx, samples = out
        samples = _fetch(samples)[:_batch_size]
        if unpreprocess_fn is not None:
            samples = unpreprocess_fn(samples)
        if use_panoptic:
            # gathered on EVERY process (collective) before the rank gate
            pred_mask = _fetch(pred_mask)
        if not is_main:
            return  # idx feeds only the rank-0 filename scheme below
        if use_panoptic:
            ids = np.asarray(bits2int(pred_mask > 0, n=mask_bits))
            if panoptic is not None:
                cnt_diff_all.append(eval_mask_cnt(ids, np.asarray(panoptic)))
            colors = color_map(ids, colormap)
        for i, sample in enumerate(samples):
            # 5-caption pairing contract (reference utils.py:631-636)
            name = f"{int(sample_idx[i]) + 10000 * (state['idx'] // 4992)}.png"
            _save_png(sample, os.path.join(path, name))
            if use_panoptic and mask_path:
                from PIL import Image

                Image.fromarray(colors[i].astype(np.uint8)).save(
                    os.path.join(mask_path, name)
                )
            state["idx"] += 1

    sizes = amortize(n_samples, batch_size)
    if overlap:
        for _batch_size, out in one_deep(sizes, lambda _: sample_fn(batch_size)):
            process(out, _batch_size)
    else:
        for _batch_size in sizes:
            process(sample_fn(batch_size), _batch_size)
    metrics = {}
    if use_panoptic and loss_mask_all:
        metrics["eval_loss_mask"] = float(np.mean(loss_mask_all))
        if cnt_diff_all:
            metrics["eval_cnt_mask_diff"] = float(np.mean(cnt_diff_all))
    return metrics
