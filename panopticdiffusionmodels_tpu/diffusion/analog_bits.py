"""Analog-bit codec for panoptic masks (Bit Diffusion style).

The reference encodes integer category-id maps into 8 binary channels and back
(reference `utils.py:475-518`, channel-first, Python loops).  Here the codec is a
vectorized, channel-last JAX program: a single shift-and-mask broadcast instead of a
per-bit Python loop, so it fuses into the surrounding computation under jit.

Bit order matches the reference: channel 0 is the MOST significant bit
(reference builds `y = cat(x >> i, y)` for i=1..n-1, so the earliest channel holds
the highest shift; decoding weights channel i by 2**(n-1-i), `utils.py:499`).
"""
from __future__ import annotations

import jax.numpy as jnp


def int2bits(x, n: int = 8, out_dtype=jnp.float32):
    """Convert integer maps (..., H, W, C) into bits (..., H, W, C*n).

    For the common panoptic case C == 1 this maps (B, H, W, 1) -> (B, H, W, n).
    Channel layout: for input channel c, output channels [c*n, (c+1)*n) hold the
    bits of x[..., c], MSB first.
    """
    x = x.astype(jnp.int32)
    shifts = jnp.arange(n - 1, -1, -1, dtype=jnp.int32)  # MSB first
    # (..., H, W, C, n)
    bits = jnp.bitwise_and(jnp.right_shift(x[..., None], shifts), 1)
    bits = bits.reshape(*x.shape[:-1], x.shape[-1] * n)
    return bits.astype(out_dtype)


def bits2int(x, n: int = 8, out_dtype=jnp.int32):
    """Convert bit maps (..., H, W, C*n) back to integers (..., H, W, C).

    Inverse of :func:`int2bits`; thresholding (e.g. `bits > 0` on analog values in
    [-1, 1]) is the caller's job, matching the reference call sites
    (`utils.py:596`: `bits2int(pred_mask > 0, ...)`).
    """
    x = x.astype(jnp.int32)
    c = x.shape[-1] // n
    bits = x.reshape(*x.shape[:-1], c, n)
    weights = jnp.left_shift(1, jnp.arange(n - 1, -1, -1, dtype=jnp.int32))
    return jnp.sum(bits * weights, axis=-1).astype(out_dtype)


def ints_to_analog(x, n: int = 8, dtype=jnp.float32):
    """Integer map -> analog bits in [-1, 1] (the training-space encoding,
    reference `train_t2i_discrete.py:157-158`)."""
    return int2bits(x, n=n, out_dtype=dtype) * 2.0 - 1.0


def analog_to_ints(x, n: int = 8):
    """Analog bits (any real values) -> integer map by sign thresholding."""
    return bits2int(x > 0, n=n)
