from .uvit import UViT
from .uvit_t2i import UViTT2I


def get_nnet(name: str, **kwargs):
    """Model factory (reference `utils.py:291-299`)."""
    if name == "uvit":
        return UViT(**kwargs)
    if name == "uvit_t2i":
        return UViTT2I(**kwargs)
    raise NotImplementedError(name)
