from .uvit import UViT
from .uvit_t2i import UViTT2I


def get_nnet(name: str, **kwargs):
    """Model factory (reference `utils.py:291-299` + the use_unet path)."""
    if name == "uvit":
        return UViT(**kwargs)
    if name == "uvit_t2i":
        return UViTT2I(**kwargs)
    if name == "unet_t2i":
        from .unet import UNet2DCondition

        return UNet2DCondition(**kwargs)
    raise NotImplementedError(name)
