"""Scanned transformer stacks: one compiled block body regardless of depth.

TPU/XLA design: a Python loop over N blocks inlines N copies of the block into
the jitted program, and a sampler that embeds the network k times multiplies
that again — compile time scales O(N*k).  `nn.scan` over parameters stacked
along a leading 'layers' axis compiles the block body ONCE and loops it on
device, with identical math.  The U-ViT structure maps cleanly:

  * in-stack: carry x, emit per-layer skips as scan ys,
  * out-stack: carry x, consume the (reversed) stacked skips as scan xs,
  * dual-stream (panoptic) variants carry (x, m) and run image block, mask
    block and the zero-conv coupling inside one body.

`use_checkpoint` composes as remat-of-body (the standard remat_scan pattern),
giving O(sqrt)-style activation memory for deep models.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..parallel.mesh import constrain_tokens
from .layers import Block, ZeroConv

Dtype = Any


def resolve_remat_policy(name: Optional[str]):
    """Map a config string to a jax.checkpoint policy.  None/'' = the nn.remat
    default (recompute everything).  'dots_no_batch' saves MXU (matmul) outputs
    and recomputes only the cheap VPU elementwise work in the backward pass —
    usually the best time/memory trade for transformer blocks on TPU."""
    if not name:
        return None
    import jax

    policies = {
        "dots": jax.checkpoint_policies.checkpoint_dots,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "nothing": jax.checkpoint_policies.nothing_saveable,
        "everything": jax.checkpoint_policies.everything_saveable,
        # Save ONLY the per-block attention outputs (named in
        # models/layers.py::Attention): one bf16 (B, L, C) per block.
        # attn_out is the Pallas custom-call output (not a dot output, so
        # dots_no_batch does not save it), but byte-wise it is smaller than
        # dots_no_batch's saved (B, L, 3C) qkv GEMM output, so it fits
        # wherever that measured policy fits; the remat replay skips
        # re-running the attention kernel (its VJP residual is qkv, which
        # the replay still recomputes cheaply).  Grad-parity-verified on
        # chip (scripts/verify_kernel_tpu.py); see BENCH.md "Training remat
        # policy" for the measured A/B.
        "save_attn": jax.checkpoint_policies.save_only_these_names("attn_out"),
    }
    if name not in policies:
        raise ValueError(f"unknown remat_policy {name!r}; one of {sorted(policies)}")
    return policies[name]


def _scanned(body_cls, length: int, remat: bool, name: str,
             remat_policy: Optional[str] = None, **body_kwargs):
    if remat:
        body_cls = nn.remat(
            body_cls, prevent_cse=False, policy=resolve_remat_policy(remat_policy)
        )
    scan_cls = nn.scan(
        body_cls,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=length,
        metadata_params={nn.PARTITION_NAME: None},
    )
    return scan_cls(name=name, **body_kwargs)


class _BlockBody(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    skip: bool = False
    emit_skip: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    gelu_approx: bool = False
    # Sequence parallelism: NamedSharding for the (B, L, C) carry, or None.
    # Re-asserted at every layer so the scan carry stays L-sharded on 'sp'.
    token_sharding: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip):
        x = Block(
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            skip=self.skip,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            gelu_approx=self.gelu_approx,
            token_sharding=self.token_sharding,
            name="block",
        )(x, skip)
        x = constrain_tokens(x, self.token_sharding)
        return x, (x if self.emit_skip else None)


def in_stack(x, *, length, remat=False, remat_policy=None, name="in_blocks", **cfg):
    """x -> (x, skips) with skips stacked (length, B, L, D)."""
    stack = _scanned(_BlockBody, length, remat, name, remat_policy,
                     emit_skip=True, skip=False, **cfg)
    return stack(x, None)


def out_stack(x, skips, *, length, remat=False, remat_policy=None, use_skip=True,
              name="out_blocks", **cfg):
    """Consume stacked skips in reverse (LIFO, matching the reference's
    skips.pop(), `libs/uvit.py:221-222`)."""
    stack = _scanned(_BlockBody, length, remat, name, remat_policy,
                     emit_skip=False, skip=use_skip, **cfg)
    x, _ = stack(x, skips[::-1] if use_skip else None)
    return x


class _DualBody(nn.Module):
    """One coupled layer of the dual-stream panoptic U-ViT: image block +
    mask-stream block over [x ; m] + zero-conv gate (semantics of reference
    `libs/uvit_t2i.py:419-473`)."""

    img_len: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    skip: bool = False
    emit_skip: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    gelu_approx: bool = False
    token_sharding: Optional[Any] = None

    @nn.compact
    def __call__(self, carry, skips):
        x, m = carry
        skip_x, skip_mx = skips if skips is not None else (None, None)
        mx = jnp.concatenate([x, m], axis=1)

        def blk(name, skip_on):
            return Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                skip=skip_on,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                gelu_approx=self.gelu_approx,
                token_sharding=self.token_sharding,
                name=name,
            )

        x = blk("block", self.skip)(x, skip_x)
        mx = blk("block_mask", self.skip)(mx, skip_mx)
        x_add = ZeroConv(dtype=self.dtype, name="zero_conv")(
            mx[:, : self.img_len, :]
        )
        x = x + x_add
        m = mx[:, self.img_len :, :]
        x = constrain_tokens(x, self.token_sharding)
        m = constrain_tokens(m, self.token_sharding)
        ys = (x, mx) if self.emit_skip else None
        return (x, m), ys


def dual_in_stack(x, m, *, img_len, length, remat=False, remat_policy=None,
                  name="in_blocks_dual", **cfg):
    stack = _scanned(
        _DualBody, length, remat, name, remat_policy,
        img_len=img_len, emit_skip=True, skip=False, **cfg
    )
    (x, m), (skips_x, skips_mx) = stack((x, m), None)
    return x, m, skips_x, skips_mx


def dual_out_stack(x, m, skips_x, skips_mx, *, img_len, length, remat=False,
                   remat_policy=None, use_skip=True, name="out_blocks_dual", **cfg):
    stack = _scanned(
        _DualBody, length, remat, name, remat_policy,
        img_len=img_len, emit_skip=False, skip=use_skip, **cfg
    )
    xs = (skips_x[::-1], skips_mx[::-1]) if use_skip else None
    (x, m), _ = stack((x, m), xs)
    return x, m
