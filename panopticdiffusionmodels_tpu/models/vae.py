"""Frozen Stable-Diffusion KL autoencoder in flax (NHWC, bf16-ready).

TPU-native re-implementation of the reference conv VAE
(reference `libs/autoencoder.py:209-484`): Encoder/Decoder with ResnetBlocks
(GroupNorm-32 + swish), a single mid-block spatial attention, asymmetric-padding
stride-2 downsampling and nearest-neighbor upsampling.  The default config is the
SD f8 KL VAE: z=4ch, ch=128, mult (1,2,4,4), 2 res blocks, 256px
(reference `libs/autoencoder.py:471-484`).

The module is pure; freezing is a property of how the caller treats the params
(they live outside the optimizer), mirroring `requires_grad_(False)` in the
reference (`libs/autoencoder.py:426-427`).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def swish(x):
    return x * jax.nn.sigmoid(x)


class GroupNorm32(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)


def conv3x3(features, name, dtype):
    return nn.Conv(features, (3, 3), padding="SAME", dtype=dtype, name=name)


def conv1x1(features, name, dtype):
    return nn.Conv(features, (1, 1), dtype=dtype, name=name)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = swish(h)
        h = conv3x3(self.out_channels, "conv1", self.dtype)(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = swish(h)
        h = conv3x3(self.out_channels, "conv2", self.dtype)(h)
        if in_channels != self.out_channels:
            x = conv1x1(self.out_channels, "nin_shortcut", self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention (reference `libs/autoencoder.py:143-195`)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hid = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        q = conv1x1(c, "q", self.dtype)(hid).reshape(b, h * w, c)
        k = conv1x1(c, "k", self.dtype)(hid).reshape(b, h * w, c)
        v = conv1x1(c, "v", self.dtype)(hid).reshape(b, h * w, c)
        attn = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (c ** -0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        out = conv1x1(c, "proj_out", self.dtype)(out)
        return x + out


class Downsample(nn.Module):
    """Stride-2 conv with the reference's asymmetric (0,1,0,1) padding
    (reference `libs/autoencoder.py:53-72`)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest 2x + conv3x3 (reference `libs/autoencoder.py:35-50`)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return conv3x3(c, "conv", self.dtype)(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = conv3x3(self.ch, "conv_in", self.dtype)(x)
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    self.ch * mult, dtype=self.dtype, name=f"down_{i_level}_block_{i_block}"
                )(h)
            if i_level != len(self.ch_mult) - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return conv3x3(out_ch, "conv_out", self.dtype)(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        block_in = self.ch * self.ch_mult[-1]
        h = conv3x3(block_in, "conv_in", self.dtype)(z)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i_level in reversed(range(len(self.ch_mult))):
            out_c = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    out_c, dtype=self.dtype, name=f"up_{i_level}_block_{i_block}"
                )(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        return conv3x3(self.out_ch, "conv_out", self.dtype)(h)


class AutoencoderKL(nn.Module):
    """KL-regularized autoencoder; `method` dispatch mirrors the reference API
    (`libs/autoencoder.py:428-460`): encode_moments / sample / encode / decode."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    out_ch: int = 3
    scale_factor: float = 0.18215
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            z_channels=self.z_channels,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            out_ch=self.out_ch,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x):
        h = self.encoder(x)
        return self.quant_conv(h)

    def sample_from_moments(self, key, moments):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
        return self.scale_factor * z

    def encode(self, key, x):
        return self.sample_from_moments(key, self.encode_moments(x))

    def decode(self, z):
        z = (1.0 / self.scale_factor) * z
        z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x, key=None, method: str = "encode_moments"):
        if method == "encode_moments":
            return self.encode_moments(x)
        if method == "encode":
            return self.encode(key, x)
        if method == "decode":
            return self.decode(x)
        raise NotImplementedError(method)


def sample_from_moments(key, moments, scale_factor: float = 0.18215):
    """Standalone reparameterized draw from pre-extracted moments (the training
    hot path reads (mean, logvar) features, reference `libs/autoencoder.py:433-439`).
    Channel-last: moments (..., 2*C)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    z = mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return scale_factor * z


def get_model(scale_factor: float = 0.18215, dtype=jnp.float32) -> AutoencoderKL:
    """The SD f8 KL-VAE configuration (reference `libs/autoencoder.py:471-484`)."""
    return AutoencoderKL(
        ch=128,
        ch_mult=(1, 2, 4, 4),
        num_res_blocks=2,
        z_channels=4,
        embed_dim=4,
        out_ch=3,
        scale_factor=scale_factor,
        dtype=dtype,
    )
