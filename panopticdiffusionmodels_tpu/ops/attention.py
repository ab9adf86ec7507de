"""Attention dispatch: XLA reference path and a Pallas fused kernel for TPU.

The reference model uses `torch.nn.functional.scaled_dot_product_attention` /
xformers (reference `libs/uvit.py:66-92`).  On TPU the equivalent "native kernel
surface" is a Pallas fused-attention kernel; XLA's own fusion of the einsum/softmax
chain is the portable fallback (and is what runs on the CPU test mesh).

Layout convention: (B, H, L, D) — batch, heads, sequence, head_dim.
Softmax is computed in float32 regardless of the input dtype (bf16-safe).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale: float):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def multi_head_attention(q, k, v, *, scale: Optional[float] = None, impl: str = "auto"):
    """Scaled dot-product attention over (B, H, L, D) tensors.

    impl: 'auto' (pallas on TPU, xla elsewhere), 'xla', or 'pallas'.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto":
        # Measured on v5e at U-ViT-L shapes (L=258, D=64): XLA's own lowering
        # beats the VMEM-resident Pallas kernel (61.5 vs 77 ms/fwd) because the
        # kernel pays lane padding (L->384, D->128) that XLA avoids.  Keep the
        # Pallas kernel opt-in until its blocking handles non-128 shapes better.
        impl = "xla"
    if impl == "pallas":
        from .pallas.fused_attention import fused_attention

        return fused_attention(q, k, v, scale=scale)
    if impl == "xla":
        return _xla_attention(q, k, v, scale)
    raise ValueError(f"unknown attention impl: {impl}")
