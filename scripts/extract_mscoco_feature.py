#!/usr/bin/env python
"""Pre-encode MS-COCO into training features (reference
`scripts/extract_mscoco_feature.py`):

per image i: `{i}.npy` VAE latent moments (CHW, torch-compatible layout),
`{i}_{k}.npy` CLIP context per caption, `{i}_text.txt` captions,
`{i}_seg.npy` panoptic category-id map.

Usage:
  python scripts/extract_mscoco_feature.py --split val2017 \
      --datadir assets/datasets/coco --outdir assets/datasets/coco256_features \
      --autoencoder assets/stable-diffusion/autoencoder_kl.pth
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--split", default="val2017")
    p.add_argument("--datadir", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--autoencoder", default="assets/stable-diffusion/autoencoder_kl.pth")
    p.add_argument("--clip", default="openai/clip-vit-large-patch14")
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    from panopticdiffusionmodels_tpu.data.mscoco import MSCOCODatabase
    from panopticdiffusionmodels_tpu.models.clip import FrozenCLIPEmbedder
    from panopticdiffusionmodels_tpu.models.vae import get_model as get_vae
    from panopticdiffusionmodels_tpu.utils.torch_bridge import (
        convert_autoencoder_kl,
        load_torch_state_dict,
    )

    split = args.split
    db = MSCOCODatabase(
        root=os.path.join(args.datadir, split),
        ann_file=os.path.join(args.datadir, "annotations", f"captions_{split}.json"),
        panoptic_ann_file=os.path.join(
            args.datadir, "annotations", f"panoptic_{split}.json"
        ),
        panoptic_root=os.path.join(args.datadir, "annotations", f"panoptic_{split}"),
        size=args.size,
    )
    out = os.path.join(args.outdir, "val" if "val" in split else "train")
    os.makedirs(out, exist_ok=True)

    vae = get_vae()
    vae_params = convert_autoencoder_kl(load_torch_state_dict(args.autoencoder))
    encode = jax.jit(lambda x: vae.apply(vae_params, x, method="encode_moments"))
    clip = FrozenCLIPEmbedder(args.clip)

    for idx in range(len(db)):
        img, captions, seg = db[idx]
        moments = np.asarray(encode(jnp.asarray(img)[None]))[0]
        np.save(os.path.join(out, f"{idx}.npy"), moments.transpose(2, 0, 1))
        contexts = clip.encode(captions)
        for k in range(len(captions)):
            np.save(os.path.join(out, f"{idx}_{k}.npy"), contexts[k])
        with open(os.path.join(out, f"{idx}_text.txt"), "w") as f:
            f.write("\n".join(captions))
        if seg is not None:
            np.save(os.path.join(out, f"{idx}_seg.npy"), seg)
        if idx % 100 == 0:
            print(f"{idx}/{len(db)}")


if __name__ == "__main__":
    main()
