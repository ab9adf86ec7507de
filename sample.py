#!/usr/bin/env python
"""Sampling entry point (images + panoptic masks to a directory):
python sample.py --config=<zoo name|file> [--workdir=...]

Covers the reference's sample_t2i_discrete.py."""
from panopticdiffusionmodels_tpu.cli import main_sample

if __name__ == "__main__":
    main_sample()
