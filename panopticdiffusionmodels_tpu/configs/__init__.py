"""Config zoo: get_config(name) mirrors the reference's 15 configs
(reference `configs/*.py`) plus a synthetic smoke-test config."""
import importlib

CONFIG_NAMES = [
    "cifar10_uvit_small",
    "celeba64_uvit_small",
    "imagenet64_uvit_mid",
    "imagenet64_uvit_large",
    "imagenet256_uvit_large",
    "imagenet256_uvit_huge",
    "imagenet512_uvit_large",
    "imagenet512_uvit_huge",
    "mscoco_uvit_small",
    "mscoco_uvit_mid",
    "mscoco_uvit_large",
    "mscoco_uvit_small_512",
    "mscoco_stable_diffusion",
    "mscoco_unet",
    "mscoco_unet_512",
    "synthetic_tiny",
]


def get_config(name: str):
    if name not in CONFIG_NAMES:
        raise KeyError(f"unknown config {name!r}; available: {CONFIG_NAMES}")
    mod = importlib.import_module(f"panopticdiffusionmodels_tpu.configs.{name}")
    config = mod.get_config()
    config.config_name = name
    return config
