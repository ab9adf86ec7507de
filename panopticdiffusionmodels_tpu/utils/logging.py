"""Logging helpers (absl-based, matching the reference conventions,
reference `utils.py:275-288`)."""
from __future__ import annotations

import logging as _logging

from absl import logging


def set_logger(log_level: str = "info", fname: str | None = None):
    handler = logging.get_absl_handler()
    formatter = _logging.Formatter("%(asctime)s - %(filename)s - %(message)s")
    handler.setFormatter(formatter)
    logging.set_verbosity(log_level)
    if fname is not None:
        fh = _logging.FileHandler(fname)
        fh.setFormatter(formatter)
        logging.get_absl_logger().addHandler(fh)


def dct2str(dct):
    return str({k: f"{v:.6g}" for k, v in dct.items()})
