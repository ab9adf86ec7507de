"""Command-line entry points: train / eval / sample.

Mirrors the reference's absl + ml_collections UX (`train.py:211-263`): a config
(zoo name or python file path), `--config.foo.bar=value` overrides, a workdir
derived from config name + overridden hparams.
"""
from __future__ import annotations

import ast
import importlib.util
import os
import sys
from typing import List, Optional

import ml_collections
from absl import logging

from .configs import CONFIG_NAMES, get_config
from .utils import set_logger


def load_config(spec: str) -> ml_collections.ConfigDict:
    """Zoo name or path to a python file defining get_config()."""
    if spec in CONFIG_NAMES:
        return get_config(spec)
    if os.path.exists(spec):
        mod_spec = importlib.util.spec_from_file_location("user_config", spec)
        mod = importlib.util.module_from_spec(mod_spec)
        mod_spec.loader.exec_module(mod)
        config = mod.get_config()
        config.config_name = os.path.splitext(os.path.basename(spec))[0]
        return config
    raise SystemExit(f"unknown config {spec!r}; zoo: {CONFIG_NAMES}")


def apply_overrides(config: ml_collections.ConfigDict, argv: List[str]) -> List[str]:
    """Apply `--config.a.b=v` flags (reference `get_hparams`, `train.py:232-246`);
    returns the hparam strings used for workdir naming."""
    hparams = []
    for arg in argv:
        if not arg.startswith("--config."):
            continue
        key, _, raw = arg[len("--config.") :].partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        node = config
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
        if not key.endswith("path"):
            hparams.append(f"{parts[-1]}={raw}")
    return hparams


def setup_workdir(config, workdir: Optional[str]) -> str:
    name = config.get("config_name", "run")
    hparams = config.get("hparams", "") or "default"
    wd = workdir or os.path.join("results", name, hparams)
    config.workdir = wd
    return wd


def _parse(argv):
    spec = None
    workdir = None
    rest = []
    it = iter(argv[1:])
    for arg in it:
        if arg.startswith("--config="):
            spec = arg.split("=", 1)[1]
        elif arg == "--config":
            spec = next(it, None)
        elif arg.startswith("--workdir="):
            workdir = arg.split("=", 1)[1]
        elif arg == "--workdir":
            workdir = next(it, None)
        else:
            rest.append(arg)
    if spec is None:
        raise SystemExit("usage: --config=<zoo name|file.py> [--workdir=...] [--config.k=v ...]")
    return spec, workdir, rest


def _maybe_init_distributed():
    """Multi-host: one call replaces all of the reference's NCCL bring-up
    (SURVEY.md §2.2); DCN topology comes from the TPU runtime/env."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()


def main_train(argv=None):
    argv = argv or sys.argv
    _maybe_init_distributed()
    spec, workdir, rest = _parse(argv)
    config = load_config(spec)
    hparams = apply_overrides(config, rest)
    config.hparams = "-".join(hparams) if hparams else "default"
    wd = setup_workdir(config, workdir)
    # create the workdir BEFORE attaching the file handler — otherwise the
    # first run of a fresh workdir logs only to the console
    os.makedirs(wd, exist_ok=True)
    set_logger("info", os.path.join(wd, "output.log"))
    logging.info(f"workdir: {wd}")

    from .evaluation.runner import make_fid_gated_callback, make_vis_callback
    from .train.trainer import Trainer

    trainer = Trainer(config, wd)
    trainer.fit(
        eval_callback=make_fid_gated_callback(),
        vis_callback=make_vis_callback(sample_steps=config.sample.sample_steps),
    )


def main_eval(argv=None):
    argv = argv or sys.argv
    spec, workdir, rest = _parse(argv)
    config = load_config(spec)
    apply_overrides(config, rest)
    config.hparams = "eval"
    wd = setup_workdir(config, workdir)
    set_logger("info")

    from .evaluation.runner import evaluate

    evaluate(config, wd)


def main_sample(argv=None):
    argv = argv or sys.argv
    spec, workdir, rest = _parse(argv)
    config = load_config(spec)
    apply_overrides(config, rest)
    config.hparams = "sample"
    wd = setup_workdir(config, workdir)
    set_logger("info")

    from .evaluation.runner import sample_only

    sample_only(config, wd)
