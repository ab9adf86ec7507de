import numpy as np

from panopticdiffusionmodels_tpu.configs import get_config
from panopticdiffusionmodels_tpu.serving import GenerationPipeline


def test_panoptic_pipeline_generate():
    config = get_config("synthetic_tiny")
    pipe = GenerationPipeline.from_config(config)
    images, masks = pipe.generate(
        contexts=np.zeros((2, 7, 16), np.float32), steps=6, seed=1
    )
    assert images.shape == (2, 8, 8, 4)  # latent space (no VAE weights)
    assert masks.shape == (2, 16, 16, 1)
    assert masks.dtype == np.int32
    assert images.min() >= 0.0 and images.max() <= 1.0
    # pipeline caching: second call reuses the jitted program
    images2, _ = pipe.generate(contexts=np.zeros((2, 7, 16), np.float32), steps=6, seed=1)
    np.testing.assert_array_equal(images, images2)


def test_generate_batches_overlapped():
    """Bulk API: one result per input batch, in order, deterministic, and
    per-batch conditioning is respected while dispatch runs one deep."""
    config = get_config("synthetic_tiny")
    pipe = GenerationPipeline.from_config(config)
    rng = np.random.default_rng(0)
    ctxs = [rng.normal(size=(2, 7, 16)).astype(np.float32) for _ in range(3)]
    batches = [{"contexts": c} for c in ctxs]
    outs = list(pipe.generate_batches(batches, steps=6, seed=5))
    assert len(outs) == 3
    for images, masks in outs:
        assert images.shape == (2, 8, 8, 4) and masks.shape == (2, 16, 16, 1)
        assert images.min() >= 0.0 and images.max() <= 1.0
    # different conditioning -> different outputs; re-run is identical
    assert not np.array_equal(outs[0][0], outs[1][0])
    outs2 = list(pipe.generate_batches(batches, steps=6, seed=5))
    for (a, am), (b, bm) in zip(outs, outs2):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(am, bm)


def test_class_cond_pipeline_generate():
    from panopticdiffusionmodels_tpu.configs.base import (
        autoencoder_block, base_config, adamw, d, sample_block, train_block, uvit, warmup,
    )

    config = base_config()
    config.task = "latent_discrete"
    config.compute_dtype = "float32"
    config.z_shape = (8, 8, 4)
    config.autoencoder = autoencoder_block(scale_factor=0.23)
    config.train = train_block(10, 8, mode="cond")
    config.optimizer = adamw()
    config.lr_scheduler = warmup(5)
    config.nnet = uvit(img_size=8, patch_size=2, in_chans=4, embed_dim=32, depth=4,
                       num_heads=4, mlp_ratio=2, num_classes=11)
    config.sample = sample_block(9, 8, 4, cfg=True, scale=0.4)
    pipe = GenerationPipeline.from_config(config)
    images = pipe.generate(labels=[1, 5, 9], steps=6)
    assert images.shape == (3, 8, 8, 4)
    assert np.isfinite(images).all()


def test_unet_pipeline_generate():
    from panopticdiffusionmodels_tpu.configs import get_config

    config = get_config("mscoco_unet")
    config.compute_dtype = "float32"
    config.z_shape = (8, 8, 4)
    config.nnet.update(dict(sample_size=8, model_channels=32, channel_mult=[1, 2],
                            num_res_blocks=1, num_heads=4, clip_dim=16,
                            num_clip_token=7, mask_size=16))
    config.sample.sample_steps = 6
    from panopticdiffusionmodels_tpu.serving import GenerationPipeline

    pipe = GenerationPipeline.from_config(config)
    images, masks = pipe.generate(contexts=np.zeros((2, 7, 16), np.float32), steps=6)
    assert images.shape == (2, 8, 8, 4)
    assert masks.shape == (2, 16, 16, 1)


def test_pipeline_speed_modes_config():
    """sample.accel + sample.cfg_interval flow through serving; outputs stay
    finite and in range with both speed modes on."""
    config = get_config("synthetic_tiny")
    config.sample.accel = 0.2
    config.sample.cfg_interval = (0.0, 0.5)
    pipe = GenerationPipeline.from_config(config)
    images, masks = pipe.generate(
        contexts=np.zeros((2, 7, 16), np.float32), steps=9, seed=3
    )
    assert images.shape == (2, 8, 8, 4)
    assert np.isfinite(images).all()
    assert masks.shape == (2, 16, 16, 1)


def test_continuous_task_serving_uses_sde_path():
    """pixel_sde/latent_sde configs must sample through the continuous
    VP-SDE wiring (review finding: serving previously ran every config
    through the discrete solver with the wrong schedule and time scaling)."""
    from panopticdiffusionmodels_tpu.configs.base import (
        base_config, adamw, d, sample_block, train_block, uvit, warmup,
    )

    config = base_config()
    config.task = "pixel_sde"
    config.compute_dtype = "float32"
    config.train = train_block(10, 8, mode="uncond")
    config.optimizer = adamw()
    config.lr_scheduler = warmup(5)
    config.nnet = uvit(img_size=8, patch_size=2, in_chans=3, embed_dim=32,
                       depth=2, num_heads=4, mlp_ratio=2)
    config.z_shape = (8, 8, 3)
    config.sample = sample_block(9, 8, 4, algorithm="dpm_solver")
    pipe = GenerationPipeline.from_config(config)
    images = pipe.generate(n=2, steps=6)
    assert images.shape == (2, 8, 8, 3)
    assert np.isfinite(images).all()
    # euler-maruyama algorithms route too
    config.sample.algorithm = "euler_maruyama_sde"
    images2 = pipe.generate(n=2, steps=6)
    assert images2.shape == (2, 8, 8, 3)
    assert not np.array_equal(images, images2)  # different sampler


def test_serving_missing_weights_fails_loudly(tmp_path):
    """A typo'd nnet_path must raise instead of silently serving random
    weights (review finding)."""
    import pytest

    config = get_config("synthetic_tiny")
    with pytest.raises(FileNotFoundError, match="nnet_path"):
        GenerationPipeline.from_config(
            config, nnet_path=str(tmp_path / "nope.pth")
        )
