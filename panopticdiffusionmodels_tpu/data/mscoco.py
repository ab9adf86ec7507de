"""Raw MS-COCO database with captions and panoptic segmentation maps.

Used by the offline feature-extraction scripts (reference `datasets.py:461-548`,
`scripts/extract_mscoco_feature.py`): center-crop images, pair 5 captions each,
and convert panoptic PNG annotations (RGB-encoded segment ids) into
category-id maps.

`rgb2id` follows the COCO panoptic encoding id = R + 256*G + 256^2*B
(reference `datasets.py:525` via panopticapi); the segment->category mapping
comes from the panoptic annotation JSON.  pycocotools is optional — captions
load from the annotation JSON directly.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


def rgb2id(color: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 panoptic PNG -> (H, W) int segment ids."""
    color = color.astype(np.int64)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def center_crop_resize(img, size: int, nearest: bool = False):
    """nearest=True for label maps: BICUBIC on the RGB-encoded segment-id PNG
    would blend ids into colors that decode to nonexistent segments."""
    from PIL import Image

    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
    return img.resize((size, size), Image.NEAREST if nearest else Image.BICUBIC)


class MSCOCODatabase:
    """Per item: (image [-1,1] HWC, [5 captions], category-id map (size,size))."""

    def __init__(
        self,
        root: str,
        ann_file: str,
        panoptic_ann_file: Optional[str] = None,
        panoptic_root: Optional[str] = None,
        size: int = 256,
    ):
        self.root = root
        self.size = size
        with open(ann_file) as f:
            ann = json.load(f)
        self.images: Dict[int, dict] = {im["id"]: im for im in ann["images"]}
        self.captions: Dict[int, List[str]] = {}
        for a in ann["annotations"]:
            self.captions.setdefault(a["image_id"], []).append(a["caption"])
        self.keys = sorted(self.images)

        self.panoptic: Dict[int, dict] = {}
        self.categories: Dict[int, dict] = {}
        self.panoptic_root = panoptic_root
        if panoptic_ann_file and os.path.exists(panoptic_ann_file):
            with open(panoptic_ann_file) as f:
                pan = json.load(f)
            self.panoptic = {a["image_id"]: a for a in pan["annotations"]}
            self.categories = {c["id"]: c for c in pan["categories"]}

    def __len__(self):
        return len(self.keys)

    def image_id(self, index: int) -> int:
        return self.keys[index]

    def _seg_map(self, image_id: int) -> Optional[np.ndarray]:
        from PIL import Image

        if image_id not in self.panoptic or not self.panoptic_root:
            return None
        a = self.panoptic[image_id]
        png = Image.open(os.path.join(self.panoptic_root, a["file_name"]))
        seg_ids = rgb2id(
            np.asarray(center_crop_resize(png, self.size, nearest=True),
                       dtype=np.uint8)
        )
        # segment id -> category id (reference datasets.py:527-535)
        cat_map = np.zeros_like(seg_ids)
        for seg in a["segments_info"]:
            cat_map[seg_ids == seg["id"]] = seg["category_id"]
        return cat_map.astype(np.int32)

    def __getitem__(self, index: int):
        from PIL import Image

        k = self.keys[index]
        info = self.images[k]
        img = Image.open(os.path.join(self.root, info["file_name"])).convert("RGB")
        img = np.asarray(center_crop_resize(img, self.size), dtype=np.float32)
        img = img / 127.5 - 1.0
        captions = self.captions.get(k, [""])[:5]
        while len(captions) < 5:
            captions.append(captions[-1] if captions else "")
        return img, captions, self._seg_map(k)
