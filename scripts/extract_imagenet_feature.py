#!/usr/bin/env python
"""Pre-encode ImageNet into flip-augmented latent moments (reference
`scripts/extract_imagenet_feature.py:32-44`): per source image i writes
`{2i}.npy` and `{2i+1}.npy`, each a pickled (moments CHW, label) pair."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", required=True, help="ImageNet root with train/<class>/*.JPEG")
    p.add_argument("--outdir", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--autoencoder", default="assets/stable-diffusion/autoencoder_kl.pth")
    args = p.parse_args()

    from panopticdiffusionmodels_tpu.data.datasets import FolderImageDataset
    from panopticdiffusionmodels_tpu.models.vae import get_model as get_vae
    from panopticdiffusionmodels_tpu.utils.torch_bridge import (
        convert_autoencoder_kl,
        load_torch_state_dict,
    )

    train_root = os.path.join(args.datadir, "train")
    classes = sorted(os.listdir(train_root))
    paths, labels = [], []
    for ci, cname in enumerate(classes):
        cdir = os.path.join(train_root, cname)
        for n in sorted(os.listdir(cdir)):
            paths.append(os.path.join(cdir, n))
            labels.append(ci)
    ds = FolderImageDataset(paths, args.size, labels=labels, random_flip=False)

    vae = get_vae()
    vae_params = convert_autoencoder_kl(load_torch_state_dict(args.autoencoder))
    encode = jax.jit(lambda x: vae.apply(vae_params, x, method="encode_moments"))

    os.makedirs(args.outdir, exist_ok=True)
    for i in range(len(ds)):
        img, label = ds[i]
        for j, arr in enumerate([img, img[:, ::-1, :]]):  # flip augmentation
            moments = np.asarray(encode(jnp.asarray(arr)[None]))[0].transpose(2, 0, 1)
            np.save(
                os.path.join(args.outdir, f"{2 * i + j}.npy"),
                np.asarray((moments, label), dtype=object),
            )
        if i % 1000 == 0:
            print(f"{i}/{len(ds)}")


if __name__ == "__main__":
    main()
