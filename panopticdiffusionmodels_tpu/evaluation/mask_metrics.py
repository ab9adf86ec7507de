"""Panoptic mask metrics and visualization.

Host-side numpy equivalents of the reference mask tooling (`utils.py:521-560`):
  * `eval_mask_cnt` — per-class pixel bin-count L1 difference between predicted
    and ground-truth category-id maps,
  * `color_map` — id -> random-RGB colormap rendering (persisted so colors are
    stable across runs, reference `utils.py:521-543`),
  * `category2rgb` — official COCO palette via panopticapi when available.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

NUM_CLASSES = 201  # COCO panoptic category ids run 1..200 (reference utils.py:555)


def eval_mask_cnt(pred_mask: np.ndarray, panoptic: np.ndarray) -> float:
    """Mean |bincount(pred) - bincount(gt)| / pixels (reference `utils.py:548-560`).

    pred_mask, panoptic: integer maps, shape (B, H, W) or (B, H, W, 1)."""
    pred = np.asarray(pred_mask).reshape(pred_mask.shape[0], -1).astype(np.int64)
    gt = np.asarray(panoptic).reshape(panoptic.shape[0], -1).astype(np.int64)
    batch, pixel_num = gt.shape
    cnt_diff = 0.0
    for i in range(batch):
        pred_cnt = np.bincount(np.clip(pred[i], 0, None), minlength=NUM_CLASSES)
        gt_cnt = np.bincount(np.clip(gt[i], 0, None), minlength=NUM_CLASSES)
        cnt_diff += np.abs(
            pred_cnt[:NUM_CLASSES] - gt_cnt[:NUM_CLASSES]
        ).sum()
    return float(cnt_diff) / pixel_num / batch


def get_colormap(path: str = "colormap.npy", force: bool = False,
                 seed: int = 0) -> np.ndarray:
    """(256, 3) uint8 id->RGB table, persisted for stable colors
    (reference `utils.py:521-530`).  Reads the reference's torch-format
    `colormap.pt` too, so existing runs keep their colors."""
    if not force and not os.path.isfile(path) and os.path.isfile("colormap.pt"):
        try:
            import torch

            return torch.load("colormap.pt", map_location="cpu").numpy().astype(np.uint8)
        except Exception:
            pass
    if os.path.isfile(path) and not force:
        return np.load(path)
    rng = np.random.default_rng(seed)
    cmap = rng.integers(0, 255, (256, 3)).astype(np.uint8)
    try:
        np.save(path, cmap)
    except OSError:
        pass
    return cmap


def color_map(x: np.ndarray, colormap: Optional[np.ndarray] = None) -> np.ndarray:
    """Integer map (B, H, W[, 1]) -> RGB uint8 (B, H, W, 3)
    (reference `utils.py:533-543`, channel-last here)."""
    x = np.asarray(x)
    if x.ndim == 4:
        x = x[..., 0]
    if colormap is None:
        colormap = get_colormap()
    return colormap[np.clip(x, 0, 255).astype(np.int64)]


def category2rgb(id_map: np.ndarray, categories_json: str) -> np.ndarray:
    """Official COCO panoptic palette (reference `utils.py:457-471`); requires
    panopticapi + the categories json.  Falls back to `color_map` when missing."""
    try:
        import json

        from panopticapi.utils import IdGenerator

        with open(categories_json) as f:
            categories_list = json.load(f)
        categories = {c["id"]: c for c in categories_list}
        gen = IdGenerator(categories)
        h, w = id_map.shape
        rgb = np.zeros((h, w, 3), dtype=np.uint8)
        for i in range(h):
            for j in range(w):
                c = int(id_map[i, j])
                while c not in categories:
                    c -= 1
                    if c <= 0:
                        c = 1
                        break
                rgb[i, j] = gen.get_color(c)
        return rgb
    except ImportError:
        return color_map(id_map[None])[0]
