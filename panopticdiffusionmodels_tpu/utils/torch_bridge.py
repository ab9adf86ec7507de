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

    `enable_panoptic`/`separate`/`scan_blocks` describe the TARGET model's
    layout (they pick the flax module names); whether MASK-stream parameters
    are emitted depends on the CHECKPOINT's own keys.  An image-only t2i
    checkpoint converted for a dual-stream scan target therefore lands its
    image blocks at `in_blocks_dual.block` (where `_merge_params` finds
    them), with the mask stream left to its fresh initialization — the
    reference's fine-tuning setup (`train_t2i_discrete.py:300-319`).

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
    dual_target = enable_panoptic and separate  # target layout
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

    dual = panoptic and separate  # checkpoint HAS a separate mask stream
    if scan_blocks and dual_target:
        in_dual = {
            "block": _stack_trees(
                [_block(sd, f"in_blocks.{i}", skip=False) for i in range(half)]
            ),
        }
        out_dual = {
            "block": _stack_trees(
                [_block(sd, f"out_blocks.{i}", skip=True) for i in range(half)]
            ),
        }
        if dual:
            in_dual["block_mask"] = _stack_trees(
                [_block(sd, f"in_blocks_mask.{i}", skip=False) for i in range(half)]
            )
            in_dual["zero_conv"] = _stack_trees(
                [
                    {"conv": _conv1d_as_dense(sd, f"zero_convs.{2 * i + 1}.conv")}
                    for i in range(half)
                ]
            )
            out_dual["block_mask"] = _stack_trees(
                [_block(sd, f"out_blocks_mask.{i}", skip=True) for i in range(half)]
            )
            out_dual["zero_conv"] = _stack_trees(
                [
                    {"conv": _conv1d_as_dense(sd, f"zero_convs.{2 * (half + 1 + i) + 1}.conv")}
                    for i in range(half)
                ]
            )
        p["in_blocks_dual"] = in_dual
        p["out_blocks_dual"] = out_dual
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


# ---------------------------------------------------------------------------
# flax parameter pytree -> PyTorch checkpoint (the EXPORT direction)
# ---------------------------------------------------------------------------

def _unstack_trees(tree):
    """Inverse of `_stack_trees`: split the leading 'layers' axis back into a
    list of per-layer trees."""
    import jax

    n = jax.tree.leaves(tree)[0].shape[0]
    return [jax.tree.map(lambda x: np.asarray(x)[i], tree) for i in range(n)]


def _inv_linear(tree, prefix, out):
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(tree["kernel"]).T)
    if "bias" in tree:
        out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def _inv_conv2d(tree, prefix, out):
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        np.asarray(tree["kernel"]).transpose(3, 2, 0, 1)
    )
    out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def _inv_conv1d_from_dense(tree, prefix, out):
    w = np.asarray(tree["kernel"])  # (I, O)
    out[f"{prefix}.weight"] = np.ascontiguousarray(w.T)[:, :, None]
    out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def _inv_patch_embed(tree, prefix, out, patch_size: int):
    k = np.asarray(tree["proj"]["kernel"])  # (p*p*C, D)
    d = k.shape[1]
    p = patch_size
    c = k.shape[0] // (p * p)
    w = k.reshape(p, p, c, d).transpose(3, 2, 0, 1)  # (D, C, p, p)
    out[f"{prefix}.weight"] = np.ascontiguousarray(w)
    out[f"{prefix}.bias"] = np.asarray(tree["proj"]["bias"])


def _inv_norm(tree, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(tree["scale"])
    out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def _inv_block(tree, prefix, out):
    _inv_norm(tree["norm1"], f"{prefix}.norm1", out)
    _inv_linear(tree["attn"]["qkv"], f"{prefix}.attn.qkv", out)
    _inv_linear(tree["attn"]["proj"], f"{prefix}.attn.proj", out)
    _inv_norm(tree["norm2"], f"{prefix}.norm2", out)
    _inv_linear(tree["mlp"]["fc1"], f"{prefix}.mlp.fc1", out)
    _inv_linear(tree["mlp"]["fc2"], f"{prefix}.mlp.fc2", out)
    if "skip_linear" in tree:
        _inv_linear(tree["skip_linear"], f"{prefix}.skip_linear", out)


def export_uvit(params: Mapping, *, patch_size: int) -> Dict[str, np.ndarray]:
    """flax UViT params -> reference-format torch state dict
    (inverse of `convert_uvit`; reference `libs/uvit.py` key names).  Both the
    scanned (stacked) and unrolled param layouts are accepted."""
    p = params["params"] if "params" in params else params
    out: Dict[str, np.ndarray] = {}
    _inv_patch_embed(p["patch_embed"], "patch_embed.proj", out, patch_size)
    if "time_embed" in p:
        _inv_linear(p["time_embed"]["fc1"], "time_embed.0", out)
        _inv_linear(p["time_embed"]["fc2"], "time_embed.2", out)
    if "label_emb" in p:
        out["label_emb.weight"] = np.asarray(p["label_emb"]["embedding"])
    out["pos_embed"] = np.asarray(p["pos_embed"])
    if "in_blocks" in p:  # scan layout
        ins = _unstack_trees(p["in_blocks"]["block"])
        outs = _unstack_trees(p["out_blocks"]["block"])
    else:
        n = len([k for k in p if k.startswith("in_blocks_")])
        ins = [p[f"in_blocks_{i}"] for i in range(n)]
        outs = [p[f"out_blocks_{i}"] for i in range(n)]
    for i, t in enumerate(ins):
        _inv_block(t, f"in_blocks.{i}", out)
    _inv_block(p["mid_block"], "mid_block", out)
    for i, t in enumerate(outs):
        _inv_block(t, f"out_blocks.{i}", out)
    _inv_norm(p["norm"], "norm", out)
    _inv_linear(p["decoder_pred"], "decoder_pred", out)
    if "final_layer" in p:
        _inv_conv2d(p["final_layer"]["conv"], "final_layer", out)
    return out


def export_uvit_t2i(params: Mapping, *, patch_size: int,
                    mask_patch_size: int = None) -> Dict[str, np.ndarray]:
    """flax UViT-T2I/panoptic params -> reference-format torch state dict
    (inverse of `convert_uvit_t2i`; reference `libs/uvit_t2i.py` key names,
    including the odd-index zero_convs.{2i+1} allocation)."""
    p = params["params"] if "params" in params else params
    out: Dict[str, np.ndarray] = {}
    _inv_patch_embed(p["patch_embed"], "patch_embed.proj", out, patch_size)
    if "time_embed" in p:
        _inv_linear(p["time_embed"]["fc1"], "time_embed.0", out)
        _inv_linear(p["time_embed"]["fc2"], "time_embed.2", out)
    _inv_linear(p["context_embed"], "context_embed", out)
    out["pos_embed"] = np.asarray(p["pos_embed"])
    _inv_norm(p["norm"], "norm", out)
    _inv_linear(p["decoder_pred"], "decoder_pred", out)
    if "final_layer" in p:
        _inv_conv2d(p["final_layer"]["conv"], "final_layer", out)

    dual = "in_blocks_dual" in p or "in_blocks_mask_0" in p
    if "in_blocks_dual" in p:  # dual scan layout
        ind = p["in_blocks_dual"]
        outd = p["out_blocks_dual"]
        ins = _unstack_trees(ind["block"])
        outs = _unstack_trees(outd["block"])
        ins_m = _unstack_trees(ind["block_mask"])
        outs_m = _unstack_trees(outd["block_mask"])
        zin = _unstack_trees(ind["zero_conv"])
        zout = _unstack_trees(outd["zero_conv"])
    elif "in_blocks" in p:  # plain scan layout
        ins = _unstack_trees(p["in_blocks"]["block"])
        outs = _unstack_trees(p["out_blocks"]["block"])
        ins_m = outs_m = zin = zout = []
    else:
        n = len([k for k in p if k.startswith("in_blocks_") and "mask" not in k])
        ins = [p[f"in_blocks_{i}"] for i in range(n)]
        outs = [p[f"out_blocks_{i}"] for i in range(n)]
        if dual:
            ins_m = [p[f"in_blocks_mask_{i}"] for i in range(n)]
            outs_m = [p[f"out_blocks_mask_{i}"] for i in range(n)]
            zin = [p[f"zero_convs_in_{i}"] for i in range(n)]
            zout = [p[f"zero_convs_out_{i}"] for i in range(n)]
        else:
            ins_m = outs_m = zin = zout = []
    half = len(ins)
    for i, t in enumerate(ins):
        _inv_block(t, f"in_blocks.{i}", out)
    _inv_block(p["mid_block"], "mid_block", out)
    for i, t in enumerate(outs):
        _inv_block(t, f"out_blocks.{i}", out)

    if "mask_embed" in p:
        mp = mask_patch_size or patch_size
        _inv_patch_embed(p["mask_embed"], "mask_embed.proj", out, mp)
        _inv_linear(p["decoder_pred_mask"], "decoder_pred_mask", out)
        if "final_layer_mask" in p:
            _inv_conv2d(p["final_layer_mask"]["conv"], "final_layer_mask", out)
        if "pos_embed_mask" in p:
            out["pos_embed_mask"] = np.asarray(p["pos_embed_mask"])
        if "mid_block_mask" in p:
            _inv_block(p["mid_block_mask"], "mid_block_mask", out)
            _inv_conv1d_from_dense(
                p["zero_convs_mid"]["conv"], f"zero_convs.{2 * half + 1}.conv", out
            )
        for i, t in enumerate(ins_m):
            _inv_block(t, f"in_blocks_mask.{i}", out)
        for i, t in enumerate(outs_m):
            _inv_block(t, f"out_blocks_mask.{i}", out)
        for i, t in enumerate(zin):
            _inv_conv1d_from_dense(t["conv"], f"zero_convs.{2 * i + 1}.conv", out)
        for i, t in enumerate(zout):
            li = half + 1 + i
            _inv_conv1d_from_dense(t["conv"], f"zero_convs.{2 * li + 1}.conv", out)
    return out


def save_torch_state_dict(sd: Mapping[str, np.ndarray], path: str) -> None:
    """Write an exported state dict as a torch .pth loadable by the reference."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
