"""End-to-end evaluation runner coverage, including the FID gate with a mock
Inception (random weights) and synthetic reference statistics."""
import os

import numpy as np
import pytest

import panopticdiffusionmodels_tpu.evaluation.runner as runner
from panopticdiffusionmodels_tpu.configs import get_config
from panopticdiffusionmodels_tpu.evaluation.fid import save_stats
from panopticdiffusionmodels_tpu.evaluation.inception import random_params
from panopticdiffusionmodels_tpu.train.trainer import Trainer


def test_evaluate_end_to_end_with_fid(tmp_path, monkeypatch):
    config = get_config("synthetic_tiny")
    config.sample.n_samples = 8
    config.sample.mini_batch_size = 4
    config.sample.sample_steps = 6
    wd = str(tmp_path / "wd")

    # fake FID assets: random-weight inception + stats computed from noise
    weights_path = str(tmp_path / "incep.pth")
    monkeypatch.setattr(runner, "INCEPTION_WEIGHTS", weights_path)
    with open(weights_path, "w") as f:
        f.write("placeholder")
    monkeypatch.setattr(
        "panopticdiffusionmodels_tpu.evaluation.inception.load_torch_inception_weights",
        lambda path: random_params(),
    )
    stat_path = str(tmp_path / "ref_stats.npz")
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(64, 2048))
    save_stats(stat_path, acts.mean(0), np.cov(acts, rowvar=False))
    monkeypatch.setattr(
        type(Trainer(config, wd).dataset), "fid_stat",
        property(lambda self: stat_path),
    )

    metrics = runner.evaluate(config, wd)
    assert "fid" in metrics and np.isfinite(metrics["fid"])
    assert "eval_loss_mask" in metrics
    assert len(os.listdir(os.path.join(wd, "samples"))) == 8


def test_fid_gated_callback_saves_best(tmp_path, monkeypatch):
    config = get_config("synthetic_tiny")
    config.sample.n_samples = 4
    config.sample.mini_batch_size = 4
    config.sample.sample_steps = 6
    trainer = Trainer(config, str(tmp_path / "wd"))
    # no FID assets -> ungated checkpoint save
    cb = runner.make_fid_gated_callback()
    trainer.state = trainer.state.replace(step=trainer.state.step + 1)
    cb(trainer, 1)
    assert os.path.isdir(os.path.join(trainer.ckpt_root, "1.ckpt"))
