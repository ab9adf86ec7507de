#!/usr/bin/env python
"""Encode the empty prompt for CFG (reference `scripts/extract_empty_feature.py`):
writes `empty_context.npy` (77, 768)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", required=True)
    p.add_argument("--clip", default="openai/clip-vit-large-patch14")
    args = p.parse_args()

    from panopticdiffusionmodels_tpu.models.clip import FrozenCLIPEmbedder

    clip = FrozenCLIPEmbedder(args.clip)
    context = clip.encode([""])[0]
    os.makedirs(args.outdir, exist_ok=True)
    np.save(os.path.join(args.outdir, "empty_context.npy"), context)
    print("saved", context.shape)


if __name__ == "__main__":
    main()
