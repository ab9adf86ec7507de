#!/usr/bin/env python
"""MS-COCO feature extraction with SD-standard VAE scale (0.18215)
(reference `scripts/extract_mscoco_stable_diffusion.py`): identical pipeline to
extract_mscoco_feature.py — the scale factor is applied at TRAIN time from
config.autoencoder.scale_factor, so the stored moments are the same; this
wrapper exists for CLI parity."""
import sys

from extract_mscoco_feature import main

if __name__ == "__main__":
    main()
