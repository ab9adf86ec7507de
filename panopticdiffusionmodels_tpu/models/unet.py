"""SD-style UNet2DCondition backbone with an optional panoptic mask stream.

Covers the reference's pretrained-UNet path (SURVEY.md §2 item 19 /
`train_t2i_discrete.py:273-294`, `utils.py:15-271`).  The reference calls
`unet.add_mask_stream()` on a PRIVATELY patched diffusers — that code was never
published — so this module implements (a) the standard Stable-Diffusion-1.x
UNet2DCondition architecture faithfully, and (b) OUR mask stream design in the
same spirit as the paper's U-ViT variant: zero-initialized gating of mask
features into the image path and a mask-prediction head, so at init the UNet's
image behavior is exactly the pretrained one.

Architecture (SD-1.x at 32x32 latents): conv_in -> 4 levels of
[2 x (ResBlock + SpatialTransformer at levels 0-2)] with stride-2 downsampling,
mid (ResBlock, SpatialTransformer, ResBlock), symmetric up path with skip
concatenation, GN-silu-conv out.  NHWC, bf16-ready.

Mask stream (enable_panoptic=True):
  * mask_encoder: strided convs bring (mask_size, mask_size, mask_bits) analog
    bits to the latent resolution; a ZERO-initialized 1x1 conv adds them to the
    conv_in features (ControlNet-style gate — inert at init),
  * mask head: a conv decoder from the final up-path features, upsampling back
    to mask resolution, 3x3 conv -> tanh (the same head shape as the U-ViT
    variant, `libs/uvit_t2i.py:343-348,510-513`).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import timestep_embedding

Dtype = Any


def _gn(x, dtype, name, eps=1e-5):
    """SD-1.x GroupNorm: the LDM UNet's normalization() is torch GroupNorm
    with the default eps 1e-5 (ResBlocks, out norm); only the
    SpatialTransformer's Normalize uses eps 1e-6."""
    return nn.GroupNorm(num_groups=32, epsilon=eps, dtype=dtype, name=name)(x)


class ResBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = _gn(x, self.dtype, "norm1")
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = _gn(h, self.dtype, "norm2")
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class _Attn(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        from ..ops.attention import multi_head_attention

        b, l, c = x.shape
        ctx = x if context is None else context
        head_dim = c // self.num_heads
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        def split(t):
            return t.reshape(b, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        out = multi_head_attention(split(q), split(k), split(v), impl="xla")
        out = out.transpose(0, 2, 1, 3).reshape(b, l, c)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = x + _Attn(self.num_heads, dtype=self.dtype, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        )
        x = x + _Attn(self.num_heads, dtype=self.dtype, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), context
        )
        # GEGLU feed-forward
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        c = x.shape[-1]
        hg = nn.Dense(8 * c, dtype=self.dtype, name="ff_proj")(h)
        a, g = jnp.split(hg, 2, axis=-1)
        h = a * nn.gelu(g, approximate=False)
        x = x + nn.Dense(c, dtype=self.dtype, name="ff_out")(h)
        return x


class SpatialTransformer(nn.Module):
    num_heads: int
    depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        x = _gn(x, self.dtype, "norm", eps=1e-6)  # LDM attention Normalize
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.num_heads, dtype=self.dtype, name=f"block_{i}"
            )(x, context)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + res


class UNet2DCondition(nn.Module):
    """SD-1.x conditional UNet (+ optional panoptic mask stream)."""

    sample_size: int = 32
    in_chans: int = 4
    out_chans: int = 4
    model_channels: int = 320
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    num_heads: int = 8
    clip_dim: int = 768
    num_clip_token: int = 77  # trainer plumbing; the UNet itself is length-agnostic
    # panoptic mask stream
    enable_panoptic: bool = False
    mask_bits: int = 8
    mask_size: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context, mask_token=None,
                 use_ground_truth: bool = False):
        """x: (B, h, w, C) latents; context: (B, 77, clip_dim); mask_token:
        optional (B, mask_size, mask_size, mask_bits) analog bits.
        Returns noise, or (noise, mask_pred)."""
        ch0 = self.model_channels
        temb = timestep_embedding(timesteps, ch0)
        temb = nn.Dense(4 * ch0, dtype=self.dtype, name="time_fc1")(temb.astype(self.dtype))
        temb = nn.Dense(4 * ch0, dtype=self.dtype, name="time_fc2")(nn.silu(temb))
        context = nn.Dense(
            self.clip_dim, dtype=self.dtype, name="context_proj"
        )(context) if context.shape[-1] != self.clip_dim else context.astype(self.dtype)

        panoptic = self.enable_panoptic and mask_token is not None

        h = nn.Conv(ch0, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(x)

        if panoptic:
            # mask encoder to latent resolution, zero-gated into conv_in features
            m = mask_token
            steps = 0
            size = self.mask_size
            while size > self.sample_size:
                steps += 1
                size //= 2
            for i in range(steps):
                m = nn.Conv(ch0 // 2, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=self.dtype, name=f"mask_down_{i}")(m)
                m = nn.silu(m)
            m = nn.Conv(ch0, (3, 3), padding="SAME", dtype=self.dtype,
                        name="mask_embed_conv")(m)
            gate = nn.Conv(
                ch0, (1, 1), kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="mask_zero_gate",
            )(m)
            h = h + gate

        levels = len(self.channel_mult)
        skips = [h]
        for i, mult in enumerate(self.channel_mult):
            ch = ch0 * mult
            for j in range(self.num_res_blocks):
                h = ResBlock(ch, dtype=self.dtype, name=f"down_{i}_res_{j}")(h, temb)
                if i < levels - 1:  # SD: no attention at the deepest level
                    h = SpatialTransformer(
                        self.num_heads, dtype=self.dtype, name=f"down_{i}_attn_{j}"
                    )(h, context)
                skips.append(h)
            if i < levels - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        h = ResBlock(h.shape[-1], dtype=self.dtype, name="mid_res_1")(h, temb)
        h = SpatialTransformer(self.num_heads, dtype=self.dtype, name="mid_attn")(
            h, context
        )
        h = ResBlock(h.shape[-1], dtype=self.dtype, name="mid_res_2")(h, temb)

        for i, mult in reversed(list(enumerate(self.channel_mult))):
            ch = ch0 * mult
            for j in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(ch, dtype=self.dtype, name=f"up_{i}_res_{j}")(h, temb)
                if i < levels - 1:
                    h = SpatialTransformer(
                        self.num_heads, dtype=self.dtype, name=f"up_{i}_attn_{j}"
                    )(h, context)
            if i > 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), method="nearest")
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        assert not skips

        feats = h
        h = _gn(h, self.dtype, "norm_out")
        h = nn.silu(h)
        noise = nn.Conv(self.out_chans, (3, 3), padding="SAME", dtype=self.dtype,
                        name="conv_out")(h)

        if mask_token is None:
            return noise
        if use_ground_truth:
            return noise, mask_token
        # mask head: decode up-path features back to mask resolution
        m = feats
        size = self.sample_size
        k = 0
        while size < self.mask_size:
            b, hh, ww, cc = m.shape
            m = jax.image.resize(m, (b, hh * 2, ww * 2, cc), method="nearest")
            m = nn.Conv(max(cc // 2, self.mask_bits * 4), (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"mask_up_{k}")(m)
            m = nn.silu(m)
            size *= 2
            k += 1
        m = nn.Conv(self.mask_bits, (3, 3), padding="SAME", dtype=self.dtype,
                    name="mask_out")(m)
        return noise, jnp.tanh(m)
