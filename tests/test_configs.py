import pytest

from panopticdiffusionmodels_tpu.configs import CONFIG_NAMES, get_config


def test_all_configs_load():
    assert len(CONFIG_NAMES) == 16  # 15 reference mirrors + synthetic_tiny
    for name in CONFIG_NAMES:
        config = get_config(name)
        assert config.nnet.name in ("uvit", "uvit_t2i", "unet_t2i")
        assert config.train.batch_size >= 1
        assert config.optimizer.name == "adamw"


def test_flagship_config_matches_protocol():
    """ImageNet-256 U-ViT-L: the BASELINE.md bench target."""
    c = get_config("imagenet256_uvit_large")
    assert c.nnet.embed_dim == 1024 and c.nnet.depth == 20 and c.nnet.num_heads == 16
    assert c.nnet.num_classes == 1001
    assert tuple(c.z_shape) == (32, 32, 4)
    assert c.sample.sample_steps == 50 and c.sample.scale == 0.4
    assert c.dataset.p_uncond == 0.15


def test_headline_panoptic_config():
    c = get_config("mscoco_uvit_small")
    assert c.nnet.enable_panoptic and c.nnet.separate
    assert c.nnet.mask_bits == 8 and c.nnet.mask_size == 64
    assert c.sample.scale == 1.0 and c.dataset.p_uncond == 0.1


def test_unknown_config():
    with pytest.raises(KeyError):
        get_config("nope")
