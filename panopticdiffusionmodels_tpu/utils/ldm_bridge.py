"""LDM / miniSD checkpoint -> flax UNet2DCondition converter.

Plays the role of the reference's LDM->diffusers renaming
(`utils.py:149-271` + `create_unet_diffusers_config`, used by the use_unet path
`train_t2i_discrete.py:279-287`), but targets this framework's
`models/unet.py` directly — no diffusers dependency.

Source layout (CompVis LDM, keys under `model.diffusion_model.`):
  time_embed.{0,2}                         -> time_fc1 / time_fc2
  input_blocks.0.0                          -> conv_in
  input_blocks.{n}.0  (ResBlock)            -> down_{i}_res_{j}
  input_blocks.{n}.1  (SpatialTransformer)  -> down_{i}_attn_{j}
  input_blocks.{3,6,9}.0.op (Downsample)    -> down_{i}_downsample
  middle_block.{0,1,2}                      -> mid_res_1 / mid_attn / mid_res_2
  output_blocks.{n}.{0,1,2}                 -> up_{i}_res_{j} / up_{i}_attn_{j} /
                                               up_{i}_upsample
  out.{0,2}                                 -> norm_out / conv_out

Assumes the SD-1.x shape: channel_mult (1,2,4,4), num_res_blocks 2, attention
at levels 0-2 (attention_resolutions [4,2,1]).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)),
        "bias": sd[f"{prefix}.bias"],
    }


def _lin(sd, prefix, bias=True):
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _resblock(sd, prefix):
    out = {
        "norm1": _norm(sd, f"{prefix}.in_layers.0"),
        "conv1": _conv(sd, f"{prefix}.in_layers.2"),
        "time_emb_proj": _lin(sd, f"{prefix}.emb_layers.1"),
        "norm2": _norm(sd, f"{prefix}.out_layers.0"),
        "conv2": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        out["shortcut"] = _conv(sd, f"{prefix}.skip_connection")
    return out


def _attn(sd, prefix):
    return {
        "to_q": _lin(sd, f"{prefix}.to_q", bias=False),
        "to_k": _lin(sd, f"{prefix}.to_k", bias=False),
        "to_v": _lin(sd, f"{prefix}.to_v", bias=False),
        "to_out": _lin(sd, f"{prefix}.to_out.0"),
    }


def _transformer(sd, prefix):
    tb = f"{prefix}.transformer_blocks.0"
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "proj_in": _conv(sd, f"{prefix}.proj_in"),
        "proj_out": _conv(sd, f"{prefix}.proj_out"),
        "block_0": {
            "norm1": _norm(sd, f"{tb}.norm1"),
            "attn1": _attn(sd, f"{tb}.attn1"),
            "norm2": _norm(sd, f"{tb}.norm2"),
            "attn2": _attn(sd, f"{tb}.attn2"),
            "norm3": _norm(sd, f"{tb}.norm3"),
            "ff_proj": _lin(sd, f"{tb}.ff.net.0.proj"),
            "ff_out": _lin(sd, f"{tb}.ff.net.2"),
        },
    }


def convert_ldm_unet(
    state_dict: Mapping[str, np.ndarray],
    *,
    channel_mult=(1, 2, 4, 4),
    num_res_blocks: int = 2,
) -> dict:
    """LDM state dict (optionally `model.diffusion_model.`-prefixed) ->
    flax params['params'] for models/unet.py (image stream only; the mask
    stream initializes fresh and is zero-gated, so loading these weights keeps
    the pretrained image behavior exactly)."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model.diffusion_model."):
            k = k[len("model.diffusion_model.") :]
        sd[k] = np.asarray(v)

    p: Dict[str, dict] = {
        "time_fc1": _lin(sd, "time_embed.0"),
        "time_fc2": _lin(sd, "time_embed.2"),
        "conv_in": _conv(sd, "input_blocks.0.0"),
        "norm_out": _norm(sd, "out.0"),
        "conv_out": _conv(sd, "out.2"),
        "mid_res_1": _resblock(sd, "middle_block.0"),
        "mid_attn": _transformer(sd, "middle_block.1"),
        "mid_res_2": _resblock(sd, "middle_block.2"),
    }

    levels = len(channel_mult)
    n = 1
    for i in range(levels):
        for j in range(num_res_blocks):
            p[f"down_{i}_res_{j}"] = _resblock(sd, f"input_blocks.{n}.0")
            if i < levels - 1:
                p[f"down_{i}_attn_{j}"] = _transformer(sd, f"input_blocks.{n}.1")
            n += 1
        if i < levels - 1:
            p[f"down_{i}_downsample"] = _conv(sd, f"input_blocks.{n}.0.op")
            n += 1

    n = 0
    for i in reversed(range(levels)):
        for j in range(num_res_blocks + 1):
            p[f"up_{i}_res_{j}"] = _resblock(sd, f"output_blocks.{n}.0")
            if i < levels - 1:
                p[f"up_{i}_attn_{j}"] = _transformer(sd, f"output_blocks.{n}.1")
            if i > 0 and j == num_res_blocks:
                up_idx = 2 if i < levels - 1 else 1
                p[f"up_{i}_upsample"] = _conv(
                    sd, f"output_blocks.{n}.{up_idx}.conv"
                )
            n += 1
    return {"params": p}
