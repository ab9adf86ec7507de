import os

import numpy as np
import pytest

from panopticdiffusionmodels_tpu.configs import get_config
from panopticdiffusionmodels_tpu.data import native_loader
from panopticdiffusionmodels_tpu.train.trainer import Trainer


@pytest.fixture()
def coco_feature_dir(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "coco_feat"
    for split in ("train", "val"):
        d = root / split
        d.mkdir(parents=True)
        for i in range(16):
            np.save(d / f"{i}.npy", rng.normal(size=(8, 8, 8)).astype(np.float32))
            for k in range(5):
                np.save(d / f"{i}_{k}.npy", rng.normal(size=(7, 16)).astype(np.float32))
            np.save(d / f"{i}_seg.npy", rng.integers(0, 201, (64, 64)).astype(np.int64))
    np.save(root / "empty_context.npy", np.zeros((7, 16), dtype=np.float32))
    return str(root)


def test_trainer_uses_native_loader_end_to_end(coco_feature_dir, tmp_path):
    if not native_loader.available():
        pytest.skip("native lib unavailable")
    config = get_config("synthetic_tiny")
    config.dataset = type(config.dataset)(
        dict(name="mscoco256_features", path=coco_feature_dir, cfg=True,
             p_uncond=0.5, mask_size=16)
    )
    config.nnet.mask_size = 16
    config.z_shape = (8, 8, 4)
    config.train.batch_size = 8
    trainer = Trainer(config, str(tmp_path / "wd"))
    stream = trainer.data_stream()
    metrics = trainer.fit(max_steps=3)
    assert int(trainer.state.step) == 3
    assert all(np.isfinite(m["loss"]) for m in metrics)
