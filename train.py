#!/usr/bin/env python
"""Training entry point: python train.py --config=<zoo name|file> [--workdir=...]

The unified engine covers the reference's train.py / train_ldm.py /
train_ldm_discrete.py / train_t2i_discrete.py (task inferred from the config)."""
from panopticdiffusionmodels_tpu.cli import main_train

if __name__ == "__main__":
    main_train()
