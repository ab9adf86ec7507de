"""PyTorch checkpoint -> flax parameter bridge.

Converts reference-format state dicts (U-ViT `.pth` checkpoints and the SD
`autoencoder_kl.pth`) into this framework's flax param pytrees, so published
PyTorch weights drive parity/FID evaluation without retraining.  Plays the role
the LDM->diffusers converter plays in the reference (`utils.py:15-271`), but
targeting our NHWC/flax layouts.

Layout transforms:
  * Linear:  torch (out, in)        -> flax kernel (in, out)        [transpose]
  * Conv2d:  torch (O, I, H, W)     -> flax kernel (H, W, I, O)     [perm 2,3,1,0]
  * Conv1d (zeroconv, k=1): (O, I, 1) -> Dense kernel (I, O)
  * PatchEmbed conv (O, I, p, p)    -> Dense kernel (p*p*I, O) with per-patch
    vector ordering (p1, p2, C) matching `layers.patchify`
  * LayerNorm/GroupNorm: weight->scale, bias->bias
  * Embedding: weight -> embedding

All functions take a `state_dict`-like mapping of numpy arrays (call
`load_torch_state_dict` to read a `.pth` with torch on CPU).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items()}


def _linear(sd, prefix):
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv2d(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)),
        "bias": sd[f"{prefix}.bias"],
    }


def _conv1d_as_dense(sd, prefix):
    w = sd[f"{prefix}.weight"]  # (O, I, 1)
    return {"kernel": np.ascontiguousarray(w[:, :, 0].T), "bias": sd[f"{prefix}.bias"]}


def _patch_embed(sd, prefix):
    w = sd[f"{prefix}.weight"]  # (D, C, p, p)
    d, c, p, _ = w.shape
    kernel = w.transpose(2, 3, 1, 0).reshape(p * p * c, d)
    return {"proj": {"kernel": np.ascontiguousarray(kernel), "bias": sd[f"{prefix}.bias"]}}


def _norm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _mlp(sd, prefix):
    return {"fc1": _linear(sd, f"{prefix}.fc1"), "fc2": _linear(sd, f"{prefix}.fc2")}


def _attention(sd, prefix):
    return {"qkv": _linear(sd, f"{prefix}.qkv"), "proj": _linear(sd, f"{prefix}.proj")}


def _block(sd, prefix, skip: bool):
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "attn": _attention(sd, f"{prefix}.attn"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }
    if skip and f"{prefix}.skip_linear.weight" in sd:
        out["skip_linear"] = _linear(sd, f"{prefix}.skip_linear")
    return out


def _time_embed(sd, prefix, mlp_time_embed: bool):
    if not mlp_time_embed:
        return {}
    return {"fc1": _linear(sd, f"{prefix}.0"), "fc2": _linear(sd, f"{prefix}.2")}


def _stack_trees(trees):
    """Stack a list of identical param trees along a new leading 'layers' axis
    (the scan_blocks layout, see models/scan_stack.py)."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def convert_uvit(sd: Mapping[str, np.ndarray], *, depth: int, mlp_time_embed: bool = False,
                 num_classes: int = -1, conv: bool = True,
                 scan_blocks: bool = False) -> dict:
    """Reference `libs/uvit.py` UViT state dict -> flax params['params'].
    scan_blocks=True emits the stacked scan layout."""
    p: Dict[str, dict] = {}
    p["patch_embed"] = _patch_embed(sd, "patch_embed.proj")
    te = _time_embed(sd, "time_embed", mlp_time_embed)
    if te:
        p["time_embed"] = te
    if num_classes > 0:
        p["label_emb"] = {"embedding": sd["label_emb.weight"]}
    p["pos_embed"] = sd["pos_embed"]
    if scan_blocks:
        p["in_blocks"] = {
            "block": _stack_trees(
                [_block(sd, f"in_blocks.{i}", skip=False) for i in range(depth // 2)]
            )
        }
        p["mid_block"] = _block(sd, "mid_block", skip=False)
        p["out_blocks"] = {
            "block": _stack_trees(
                [_block(sd, f"out_blocks.{i}", skip=True) for i in range(depth // 2)]
            )
        }
    else:
        for i in range(depth // 2):
            p[f"in_blocks_{i}"] = _block(sd, f"in_blocks.{i}", skip=False)
        p["mid_block"] = _block(sd, "mid_block", skip=False)
        for i in range(depth // 2):
            p[f"out_blocks_{i}"] = _block(sd, f"out_blocks.{i}", skip=True)
    p["norm"] = _norm(sd, "norm")
    p["decoder_pred"] = _linear(sd, "decoder_pred")
    if conv and "final_layer.weight" in sd:
        p["final_layer"] = {"conv": _conv2d(sd, "final_layer")}
    return {"params": p}


def convert_uvit_t2i(
    sd: Mapping[str, np.ndarray],
    *,
    depth: int,
    mlp_time_embed: bool = False,
    conv: bool = True,
    enable_panoptic: bool = True,
    separate: bool = True,
    scan_blocks: bool = False,
) -> dict:
    """Reference `libs/uvit_t2i.py` UViT state dict -> flax params['params'].

    Zero-conv mapping: the reference allocates 2*depth+2 Conv1d layers but only
    uses the odd indices 2*i+1 (`libs/uvit_t2i.py:435,452,470`); those map to our
    zero_convs_in_{i} / zero_convs_mid / zero_convs_out_{i} (or the stacked
    `zero_conv` leaves of the dual scan stacks when scan_blocks=True).
    """
    half = depth // 2
    p: Dict[str, dict] = {}
    p["patch_embed"] = _patch_embed(sd, "patch_embed.proj")
    te = _time_embed(sd, "time_embed", mlp_time_embed)
    if te:
        p["time_embed"] = te
    p["context_embed"] = _linear(sd, "context_embed")
    p["pos_embed"] = sd["pos_embed"]
    p["norm"] = _norm(sd, "norm")
    p["decoder_pred"] = _linear(sd, "decoder_pred")
    if conv and "final_layer.weight" in sd:
        p["final_layer"] = {"conv": _conv2d(sd, "final_layer")}
    p["mid_block"] = _block(sd, "mid_block", skip=False)

    panoptic = enable_panoptic and "mask_embed.proj.weight" in sd
    if panoptic:
        p["mask_embed"] = _patch_embed(sd, "mask_embed.proj")
        p["decoder_pred_mask"] = _linear(sd, "decoder_pred_mask")
        if conv and "final_layer_mask.weight" in sd:
            p["final_layer_mask"] = {"conv": _conv2d(sd, "final_layer_mask")}
        if separate:
            p["pos_embed_mask"] = sd["pos_embed_mask"]
            p["mid_block_mask"] = _block(sd, "mid_block_mask", skip=False)
            p["zero_convs_mid"] = {
                "conv": _conv1d_as_dense(sd, f"zero_convs.{2 * half + 1}.conv")
            }

    dual = panoptic and separate
    if scan_blocks and dual:
        p["in_blocks_dual"] = {
            "block": _stack_trees(
                [_block(sd, f"in_blocks.{i}", skip=False) for i in range(half)]
            ),
            "block_mask": _stack_trees(
                [_block(sd, f"in_blocks_mask.{i}", skip=False) for i in range(half)]
            ),
            "zero_conv": _stack_trees(
                [
                    {"conv": _conv1d_as_dense(sd, f"zero_convs.{2 * i + 1}.conv")}
                    for i in range(half)
                ]
            ),
        }
        p["out_blocks_dual"] = {
            "block": _stack_trees(
                [_block(sd, f"out_blocks.{i}", skip=True) for i in range(half)]
            ),
            "block_mask": _stack_trees(
                [_block(sd, f"out_blocks_mask.{i}", skip=True) for i in range(half)]
            ),
            "zero_conv": _stack_trees(
                [
                    {"conv": _conv1d_as_dense(sd, f"zero_convs.{2 * (half + 1 + i) + 1}.conv")}
                    for i in range(half)
                ]
            ),
        }
    elif scan_blocks:
        p["in_blocks"] = {
            "block": _stack_trees(
                [_block(sd, f"in_blocks.{i}", skip=False) for i in range(half)]
            )
        }
        p["out_blocks"] = {
            "block": _stack_trees(
                [_block(sd, f"out_blocks.{i}", skip=True) for i in range(half)]
            )
        }
    else:
        for i in range(half):
            p[f"in_blocks_{i}"] = _block(sd, f"in_blocks.{i}", skip=False)
        for i in range(half):
            p[f"out_blocks_{i}"] = _block(sd, f"out_blocks.{i}", skip=True)
        if dual:
            for i in range(half):
                p[f"in_blocks_mask_{i}"] = _block(sd, f"in_blocks_mask.{i}", skip=False)
            for i in range(half):
                p[f"out_blocks_mask_{i}"] = _block(sd, f"out_blocks_mask.{i}", skip=True)
            for i in range(half):
                p[f"zero_convs_in_{i}"] = {
                    "conv": _conv1d_as_dense(sd, f"zero_convs.{2 * i + 1}.conv")
                }
            for i in range(half):
                li = half + 1 + i
                p[f"zero_convs_out_{i}"] = {
                    "conv": _conv1d_as_dense(sd, f"zero_convs.{2 * li + 1}.conv")
                }
    return {"params": p}


def _resnet_block(sd, prefix):
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv2d(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv2d(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv2d(sd, f"{prefix}.nin_shortcut")
    return out


def _attn_block(sd, prefix):
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "q": _conv2d(sd, f"{prefix}.q"),
        "k": _conv2d(sd, f"{prefix}.k"),
        "v": _conv2d(sd, f"{prefix}.v"),
        "proj_out": _conv2d(sd, f"{prefix}.proj_out"),
    }


def convert_autoencoder_kl(
    sd: Mapping[str, np.ndarray], *, ch_mult=(1, 2, 4, 4), num_res_blocks: int = 2
) -> dict:
    """Reference SD KL-VAE (`libs/autoencoder.py`) state dict -> flax params."""
    enc: Dict[str, dict] = {"conv_in": _conv2d(sd, "encoder.conv_in")}
    for i in range(len(ch_mult)):
        for j in range(num_res_blocks):
            enc[f"down_{i}_block_{j}"] = _resnet_block(sd, f"encoder.down.{i}.block.{j}")
        if i != len(ch_mult) - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv2d(sd, f"encoder.down.{i}.downsample.conv")
            }
    enc["mid_block_1"] = _resnet_block(sd, "encoder.mid.block_1")
    enc["mid_attn_1"] = _attn_block(sd, "encoder.mid.attn_1")
    enc["mid_block_2"] = _resnet_block(sd, "encoder.mid.block_2")
    enc["norm_out"] = _norm(sd, "encoder.norm_out")
    enc["conv_out"] = _conv2d(sd, "encoder.conv_out")

    dec: Dict[str, dict] = {"conv_in": _conv2d(sd, "decoder.conv_in")}
    dec["mid_block_1"] = _resnet_block(sd, "decoder.mid.block_1")
    dec["mid_attn_1"] = _attn_block(sd, "decoder.mid.attn_1")
    dec["mid_block_2"] = _resnet_block(sd, "decoder.mid.block_2")
    for i in range(len(ch_mult)):
        for j in range(num_res_blocks + 1):
            dec[f"up_{i}_block_{j}"] = _resnet_block(sd, f"decoder.up.{i}.block.{j}")
        if i != 0:
            dec[f"up_{i}_upsample"] = {"conv": _conv2d(sd, f"decoder.up.{i}.upsample.conv")}
    dec["norm_out"] = _norm(sd, "decoder.norm_out")
    dec["conv_out"] = _conv2d(sd, "decoder.conv_out")

    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "quant_conv": _conv2d(sd, "quant_conv"),
            "post_quant_conv": _conv2d(sd, "post_quant_conv"),
        }
    }
