"""CLIP score for generated images vs. their prompts.

Follows the reference protocol exactly (reference `tools/clip_score.py`):
CLIP ViT-B/32, cosine similarity x logit_scale, and the
`i + 10000*k` filename pairing of each image with its k-th of 5 COCO captions
(reference `tools/clip_score.py:165-186`).  Uses HF Flax CLIP with locally
available weights.
"""
from __future__ import annotations

import os
from typing import List

import numpy as np


def _load_clip(version: str):
    from transformers import CLIPProcessor, FlaxCLIPModel

    model = FlaxCLIPModel.from_pretrained(version)
    processor = CLIPProcessor.from_pretrained(version)
    return model, processor


def clip_score(
    images: np.ndarray,
    texts: List[str],
    version: str = "openai/clip-vit-base-patch32",
    batch_size: int = 64,
) -> float:
    """Mean logit_scale * cosine(image_emb, text_emb) over pairs.

    images: (N, H, W, 3) uint8 or [0,1] float; len(texts) == N."""
    model, processor = _load_clip(version)
    if images.dtype != np.uint8:
        images = np.clip(images * 255.0 + 0.5, 0, 255).astype(np.uint8)
    scores = []
    for i in range(0, len(images), batch_size):
        imgs = list(images[i : i + batch_size])
        txts = texts[i : i + batch_size]
        inputs = processor(
            text=txts, images=imgs, return_tensors="np", padding=True,
            truncation=True, max_length=77,
        )
        out = model(**inputs)
        img_emb = out.image_embeds / np.linalg.norm(out.image_embeds, axis=-1, keepdims=True)
        txt_emb = out.text_embeds / np.linalg.norm(out.text_embeds, axis=-1, keepdims=True)
        logit_scale = float(np.exp(model.params["logit_scale"]))
        scores.extend((img_emb * txt_emb).sum(-1) * logit_scale)
    return float(np.mean(scores))


def clip_score_from_dirs(
    sample_dir: str,
    caption_dir: str,
    version: str = "openai/clip-vit-base-patch32",
    captions_per_image: int = 5,
) -> float:
    """Directory protocol: image `{i + 10000*k}.png` pairs with caption file
    `{i}_{k}_text.txt` (reference `tools/clip_score.py:165-186`)."""
    from PIL import Image

    images, texts = [], []
    for name in sorted(os.listdir(sample_dir)):
        if not name.endswith(".png"):
            continue
        n = int(os.path.splitext(name)[0])
        i, k = n % 10000, n // 10000
        cap_path = os.path.join(caption_dir, f"{i}_{k}_text.txt")
        if not os.path.exists(cap_path):
            cap_path = os.path.join(caption_dir, f"{i}_text.txt")
        if not os.path.exists(cap_path):
            continue
        with open(cap_path) as f:
            texts.append(f.readline().strip())
        images.append(np.asarray(Image.open(os.path.join(sample_dir, name)).convert("RGB")))
    if not images:
        raise FileNotFoundError("no (image, caption) pairs found")
    return clip_score(np.stack(images), texts, version=version)


def _main():
    """CLI: python -m panopticdiffusionmodels_tpu.evaluation.clip_score
    --sample-dir D --caption-dir C (reference tools/clip_score.py:227)."""
    import argparse

    p = argparse.ArgumentParser(description="CLIP score over a sample directory")
    p.add_argument("--sample-dir", required=True)
    p.add_argument("--caption-dir", required=True)
    p.add_argument("--version", default="openai/clip-vit-base-patch32")
    args = p.parse_args()
    print(
        "CLIP score:",
        clip_score_from_dirs(args.sample_dir, args.caption_dir, version=args.version),
    )


if __name__ == "__main__":
    _main()
