#!/usr/bin/env python
"""Encode the 12 fixed visualization prompts (reference
`scripts/extract_test_prompt_feature.py:14-38`): writes `run_vis/{i}.npy`."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PROMPTS = [
    "A green train is coming down the tracks.",
    "A group of skiers are preparing to ski down a mountain.",
    "A small kitchen with a low ceiling.",
    "A group of elephants walking in muddy water.",
    "A living area with a television and a table.",
    "A road with traffic lights, street lights and cars.",
    "A bus driving in a city area with traffic signs.",
    "A bathroom with a toilet sink and bathtub.",
    "A stop sign installed on the right of a street.",
    "A zebra standing in a field of tall grass.",
    "A two story house with a balcony and a garage.",
    "A man holding a tennis racket on a tennis court.",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", required=True)
    p.add_argument("--clip", default="openai/clip-vit-large-patch14")
    args = p.parse_args()

    from panopticdiffusionmodels_tpu.models.clip import FrozenCLIPEmbedder

    clip = FrozenCLIPEmbedder(args.clip)
    contexts = clip.encode(PROMPTS)
    out = os.path.join(args.outdir, "run_vis")
    os.makedirs(out, exist_ok=True)
    for i, ctx in enumerate(contexts):
        np.save(os.path.join(out, f"{i}.npy"), ctx)
    print("saved", len(PROMPTS), "prompt contexts")


if __name__ == "__main__":
    main()
