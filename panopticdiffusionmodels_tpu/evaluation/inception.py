"""FID-specific InceptionV3 pool3 feature extractor in JAX (inference only).

Port of the pytorch-fid network (reference `tools/inception.py:16-328`), which is
torchvision InceptionV3 with FID-specific patches:

  * FIDInceptionA/C/E use average pooling with count_include_pad=False,
  * the second InceptionE (Mixed_7c) uses MAX pooling in its pool branch
    (reference `tools/inception.py:310-328`),
  * inputs are bilinearly resized to 299x299 and mapped [0,1] -> [-1,1].

Exact FID parity requires the exact `pt_inception-2015-12-05` weights; load them
with `load_torch_inception_weights` (the judge-facing FID protocol keeps the
reference's stats-file format, see fid.py).  The architecture here is validated
structurally (output shape / determinism) and numerically against torchvision
when the weight file is present.

Everything is expressed as explicit frozen-BatchNorm convs on NHWC tensors; the
whole extractor jits into one XLA program and runs on TPU in bf16 or f32.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Functional layers (params are plain dicts: conv kernels + frozen BN stats)
# ---------------------------------------------------------------------------

_BN_EPS = 0.001


def _conv_bn(params: Dict, x, stride=(1, 1), padding="VALID"):
    """BasicConv2d: conv(no bias) -> frozen BN -> relu (tools/inception.py uses
    torchvision BasicConv2d)."""
    x = jax.lax.conv_general_dilated(
        x,
        params["kernel"],
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    scale = params["bn_scale"] * jax.lax.rsqrt(params["bn_var"] + _BN_EPS)
    x = x * scale + (params["bn_bias"] - params["bn_mean"] * scale)
    return jax.nn.relu(x)


def _avg_pool_nocountpad(x, window=3, stride=1):
    """Average pooling with count_include_pad=False (the FID patch; reference
    `tools/inception.py:243-247` etc.)."""
    pad = window // 2
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, padding)
    ones = jnp.ones(x.shape[:3] + (1,), dtype=x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, padding)
    return summed / counts


def _max_pool(x, window=3, stride=2, pad=0):
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), padding
    )


def _pad(h, w):
    return ((h, h), (w, w))


def _inception_a(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_1"], x)
    b5 = _conv_bn(p["branch5x5_2"], b5, padding=_pad(2, 2))
    b3 = _conv_bn(p["branch3x3dbl_1"], x)
    b3 = _conv_bn(p["branch3x3dbl_2"], b3, padding=_pad(1, 1))
    b3 = _conv_bn(p["branch3x3dbl_3"], b3, padding=_pad(1, 1))
    bp = _avg_pool_nocountpad(x)
    bp = _conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=(2, 2))
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=_pad(1, 1))
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=(2, 2))
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, padding=_pad(0, 3))
    b7 = _conv_bn(p["branch7x7_3"], b7, padding=_pad(3, 0))
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, padding=_pad(3, 0))
    bd = _conv_bn(p["branch7x7dbl_3"], bd, padding=_pad(0, 3))
    bd = _conv_bn(p["branch7x7dbl_4"], bd, padding=_pad(3, 0))
    bd = _conv_bn(p["branch7x7dbl_5"], bd, padding=_pad(0, 3))
    bp = _avg_pool_nocountpad(x)
    bp = _conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = _conv_bn(p["branch3x3_2"], b3, stride=(2, 2))
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, padding=_pad(0, 3))
    b7 = _conv_bn(p["branch7x7x3_3"], b7, padding=_pad(3, 0))
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=(2, 2))
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x, pool: str):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate(
        [
            _conv_bn(p["branch3x3_2a"], b3, padding=_pad(0, 1)),
            _conv_bn(p["branch3x3_2b"], b3, padding=_pad(1, 0)),
        ],
        axis=-1,
    )
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=_pad(1, 1))
    bd = jnp.concatenate(
        [
            _conv_bn(p["branch3x3dbl_3a"], bd, padding=_pad(0, 1)),
            _conv_bn(p["branch3x3dbl_3b"], bd, padding=_pad(1, 0)),
        ],
        axis=-1,
    )
    if pool == "avg":
        bp = _avg_pool_nocountpad(x)
    else:  # FIDInceptionE_2 (reference tools/inception.py:310-328)
        bp = _max_pool(x, window=3, stride=1, pad=1)
    bp = _conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(params: Dict, x, resize: bool = True, normalize: bool = True):
    """[0,1] NHWC images -> (N, 2048) pool3 activations."""
    if resize:
        x = jax.image.resize(
            x, (x.shape[0], 299, 299, x.shape[-1]), method="bilinear"
        )
    if normalize:
        x = 2.0 * x - 1.0
    x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=(2, 2))
    x = _conv_bn(params["Conv2d_2a_3x3"], x)
    x = _conv_bn(params["Conv2d_2b_3x3"], x, padding=_pad(1, 1))
    x = _max_pool(x)
    x = _conv_bn(params["Conv2d_3b_1x1"], x)
    x = _conv_bn(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x, pool="avg")
    x = _inception_e(params["Mixed_7c"], x, pool="max")
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)


def make_extractor(params: Dict):
    """Jitted [0,1] NHWC -> (N, 2048) extractor.

    The ~24M-parameter weight tree is passed as an ARGUMENT on every call —
    closure-capturing it would serialize ~95 MB of constants into the traced
    program (CLAUDE.md: relay HTTP-413 / multi-minute compiles)."""
    extract = jax.jit(
        lambda p, x: inception_pool3(p, jnp.asarray(x, jnp.float32))
    )
    return lambda x: extract(params, x)


# ---------------------------------------------------------------------------
# Weight loading / synthesis
# ---------------------------------------------------------------------------

_BLOCK_CHANNELS = {
    # conv stem: (in, out, kh, kw)
    "Conv2d_1a_3x3": (3, 32, 3, 3),
    "Conv2d_2a_3x3": (32, 32, 3, 3),
    "Conv2d_2b_3x3": (32, 64, 3, 3),
    "Conv2d_3b_1x1": (64, 80, 1, 1),
    "Conv2d_4a_3x3": (80, 192, 3, 3),
}


def _convert_basic_conv(sd, prefix):
    w = sd[f"{prefix}.conv.weight"]  # (O, I, H, W)
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "bn_scale": sd[f"{prefix}.bn.weight"],
        "bn_bias": sd[f"{prefix}.bn.bias"],
        "bn_mean": sd[f"{prefix}.bn.running_mean"],
        "bn_var": sd[f"{prefix}.bn.running_var"],
    }


_MIXED_BRANCHES = {
    "a": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
          "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "b": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    "c": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
          "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
          "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "d": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
          "branch7x7x3_3", "branch7x7x3_4"],
    "e": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
          "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
          "branch3x3dbl_3b", "branch_pool"],
}

_MIXED_KINDS = {
    "Mixed_5b": "a", "Mixed_5c": "a", "Mixed_5d": "a",
    "Mixed_6a": "b",
    "Mixed_6b": "c", "Mixed_6c": "c", "Mixed_6d": "c", "Mixed_6e": "c",
    "Mixed_7a": "d",
    "Mixed_7b": "e", "Mixed_7c": "e",
}


def convert_torch_inception(sd) -> Dict:
    """pt_inception-2015-12-05 / torchvision inception_v3 state dict -> params."""
    params = {}
    for name in _BLOCK_CHANNELS:
        params[name] = _convert_basic_conv(sd, name)
    for mixed, kind in _MIXED_KINDS.items():
        params[mixed] = {
            br: _convert_basic_conv(sd, f"{mixed}.{br}")
            for br in _MIXED_BRANCHES[kind]
        }
    return params


def load_torch_inception_weights(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_torch_inception({k: v.numpy() for k, v in sd.items()})


def random_params(seed: int = 0) -> Dict:
    """Random weights with the right shapes — architecture/shape tests only."""
    rng = np.random.default_rng(seed)

    def conv(i, o, kh, kw):
        return {
            "kernel": rng.normal(0, 0.05, (kh, kw, i, o)).astype(np.float32),
            "bn_scale": np.ones(o, np.float32),
            "bn_bias": np.zeros(o, np.float32),
            "bn_mean": np.zeros(o, np.float32),
            "bn_var": np.ones(o, np.float32),
        }

    p = {n: conv(*_BLOCK_CHANNELS[n]) for n in _BLOCK_CHANNELS}

    def ia(i, pool):
        return {
            "branch1x1": conv(i, 64, 1, 1),
            "branch5x5_1": conv(i, 48, 1, 1),
            "branch5x5_2": conv(48, 64, 5, 5),
            "branch3x3dbl_1": conv(i, 64, 1, 1),
            "branch3x3dbl_2": conv(64, 96, 3, 3),
            "branch3x3dbl_3": conv(96, 96, 3, 3),
            "branch_pool": conv(i, pool, 1, 1),
        }

    def ib(i):
        return {
            "branch3x3": conv(i, 384, 3, 3),
            "branch3x3dbl_1": conv(i, 64, 1, 1),
            "branch3x3dbl_2": conv(64, 96, 3, 3),
            "branch3x3dbl_3": conv(96, 96, 3, 3),
        }

    def ic(i, c7):
        return {
            "branch1x1": conv(i, 192, 1, 1),
            "branch7x7_1": conv(i, c7, 1, 1),
            "branch7x7_2": conv(c7, c7, 1, 7),
            "branch7x7_3": conv(c7, 192, 7, 1),
            "branch7x7dbl_1": conv(i, c7, 1, 1),
            "branch7x7dbl_2": conv(c7, c7, 7, 1),
            "branch7x7dbl_3": conv(c7, c7, 1, 7),
            "branch7x7dbl_4": conv(c7, c7, 7, 1),
            "branch7x7dbl_5": conv(c7, 192, 1, 7),
            "branch_pool": conv(i, 192, 1, 1),
        }

    def idd(i):
        return {
            "branch3x3_1": conv(i, 192, 1, 1),
            "branch3x3_2": conv(192, 320, 3, 3),
            "branch7x7x3_1": conv(i, 192, 1, 1),
            "branch7x7x3_2": conv(192, 192, 1, 7),
            "branch7x7x3_3": conv(192, 192, 7, 1),
            "branch7x7x3_4": conv(192, 192, 3, 3),
        }

    def ie(i):
        return {
            "branch1x1": conv(i, 320, 1, 1),
            "branch3x3_1": conv(i, 384, 1, 1),
            "branch3x3_2a": conv(384, 384, 1, 3),
            "branch3x3_2b": conv(384, 384, 3, 1),
            "branch3x3dbl_1": conv(i, 448, 1, 1),
            "branch3x3dbl_2": conv(448, 384, 3, 3),
            "branch3x3dbl_3a": conv(384, 384, 1, 3),
            "branch3x3dbl_3b": conv(384, 384, 3, 1),
            "branch_pool": conv(i, 192, 1, 1),
        }

    p["Mixed_5b"] = ia(192, 32)
    p["Mixed_5c"] = ia(256, 64)
    p["Mixed_5d"] = ia(288, 64)
    p["Mixed_6a"] = ib(288)
    p["Mixed_6b"] = ic(768, 128)
    p["Mixed_6c"] = ic(768, 160)
    p["Mixed_6d"] = ic(768, 160)
    p["Mixed_6e"] = ic(768, 192)
    p["Mixed_7a"] = idd(768)
    p["Mixed_7b"] = ie(1280)
    p["Mixed_7c"] = ie(2048)
    return p
