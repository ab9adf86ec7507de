"""Shared transformer layers for the U-ViT family (flax.linen, NHWC, bf16-ready).

Functional equivalents of the reference building blocks (`libs/uvit.py:20-135`,
`libs/timm.py`), re-designed for TPU:

  * channel-last (NHWC) layout everywhere — the native TPU conv/reshape layout,
  * patch embedding as reshape + matmul instead of a strided conv (identical math
    for kernel_size == stride, but lowers to a single MXU matmul),
  * attention behind `ops.attention_qkv` (XLA path, or the packed-qkv Pallas
    kernel on the inference hot path),
  * float32 parameters with a configurable compute dtype (bf16 on TPU).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..ops.attention import attention_qkv

Dtype = Any

# Matches torch trunc_normal_(std=.02) used throughout the reference
# (`libs/timm.py:8-62`); the +-2 absolute truncation there is ~100 sigma, i.e.
# effectively an untruncated normal, so a 2-sigma truncated normal is equivalent
# in practice.
default_init = nn.initializers.truncated_normal(stddev=0.02)


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embeddings, [cos | sin] order (reference
    `libs/uvit.py:20-38`).  timesteps: (B,) possibly fractional."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def patchify(imgs, patch_size: int):
    """(B, H, W, C) -> (B, h*w, p*p*C); per-patch vector ordered (p1, p2, C)."""
    b, h, w, c = imgs.shape
    p = patch_size
    x = imgs.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B h w p1 p2 C
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def unpatchify(x, channels: int):
    """(B, h*w, p*p*C) -> (B, H, W, C); inverse of :func:`patchify`."""
    b, l, pd = x.shape
    h = w = int(round(l ** 0.5))
    p = int(round((pd // channels) ** 0.5))
    assert h * w == l and p * p * channels == pd
    x = x.reshape(b, h, w, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B h p1 w p2 C
    return x.reshape(b, h * p, w * p, channels)


class PatchEmbed(nn.Module):
    """Patchify + linear projection (== stride-p conv, one MXU matmul)."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = patchify(x, self.patch_size)
        return nn.Dense(
            self.embed_dim,
            kernel_init=default_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj",
        )(x)


class ZeroConv(nn.Module):
    """Per-token linear projection, zero-initialized (ControlNet coupling).

    Equivalent to the reference's Conv1d(embed, embed, 1) with zero init
    (`libs/uvit_t2i.py:246-257,366-369`): at init the mask stream contributes
    nothing to the image stream; training opens the gate.  Shared by the
    unrolled (uvit_t2i) and scanned (scan_stack) dual-stream layouts — the
    child Dense is named "conv" in both, which the torch bridge and the
    freeze-mask path rules rely on.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        zeros = nn.initializers.zeros
        return nn.Dense(
            x.shape[-1],
            kernel_init=zeros,
            bias_init=zeros,
            dtype=self.dtype,
            name="conv",
        )(x)


class Mlp(nn.Module):
    """fc -> GELU -> fc (reference `libs/timm.py:96-112`).

    gelu_approx=True swaps the exact erf GELU (the reference's torch
    nn.GELU default) for the tanh approximation: |error| <= 3e-4 per
    activation, measured 13% faster on the UViT-L forward (erf dominates
    the VPU budget — BENCH.md op ablation).  Opt-in because it is different
    MATH, not just different rounding; full-forward deviation at bf16 is
    ~1%, the same order as the bf16 rounding noise itself."""

    hidden_features: int
    out_features: Optional[int] = None
    dtype: Dtype = jnp.float32
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x):
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(
            self.hidden_features,
            kernel_init=default_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dense(
            out_features,
            kernel_init=default_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc2",
        )(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention (reference `libs/uvit.py:54-92`)."""

    num_heads: int
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # NamedSharding of (B, L, C) activations under sequence parallelism;
    # consumed only by the 'ring' impl (ops/ring_attention.py).
    token_sharding: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        head_dim = c // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        qkv = nn.Dense(
            c * 3,
            use_bias=self.qkv_bias,
            kernel_init=default_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="qkv",
        )(x)
        out = attention_qkv(qkv, self.num_heads, scale=scale,
                            impl=self.attn_impl,
                            token_sharding=self.token_sharding)
        # Names the attention output for remat_policy='save_attn'
        # (scan_stack.resolve_remat_policy): saving it lets the remat replay
        # drop the forward attention kernel entirely — the flash-style VJP
        # needs only qkv (recomputed from the cheap LN+GEMM replay).  A bare
        # `name` primitive otherwise; erased at lowering, zero cost.
        out = checkpoint_name(out, "attn_out")
        return nn.Dense(
            c,
            kernel_init=default_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj",
        )(out)


class Block(nn.Module):
    """Pre-norm transformer block with optional long-skip fusion
    (reference `libs/uvit.py:95-120`).  The skip projection runs BEFORE the
    attention residual, matching the reference ordering."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    skip: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    gelu_approx: bool = False
    token_sharding: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip=None):
        dim = x.shape[-1]
        if self.skip:
            x = nn.Dense(
                dim,
                kernel_init=default_init,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="skip_linear",
            )(jnp.concatenate([x, skip], axis=-1))
        x = x + Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            token_sharding=self.token_sharding,
            name="attn",
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x))
        x = x + Mlp(
            hidden_features=int(dim * self.mlp_ratio),
            dtype=self.dtype,
            gelu_approx=self.gelu_approx,
            name="mlp",
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x))
        return x


class TimeEmbed(nn.Module):
    """Optional MLP over the sinusoidal embedding (reference `libs/uvit.py:150-154`)."""

    embed_dim: int
    mlp: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        if not self.mlp:
            return t_emb
        x = nn.Dense(
            4 * self.embed_dim,
            kernel_init=default_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc1",
        )(t_emb)
        x = nn.silu(x)
        return nn.Dense(
            self.embed_dim,
            kernel_init=default_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc2",
        )(x)


class Conv3x3(nn.Module):
    """Final 3x3 'same' conv head (reference `libs/uvit.py:183`)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=(3, 3),
            padding="SAME",
            kernel_init=nn.initializers.lecun_normal(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)
