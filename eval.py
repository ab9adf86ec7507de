#!/usr/bin/env python
"""Evaluation entry point (FID / CLIP-score / mask metrics):
python eval.py --config=<zoo name|file> --config.nnet_path=<ckpt>

Covers the reference's eval.py / eval_ldm.py / eval_ldm_discrete.py /
eval_t2i_discrete.py."""
from panopticdiffusionmodels_tpu.cli import main_eval

if __name__ == "__main__":
    main_eval()
