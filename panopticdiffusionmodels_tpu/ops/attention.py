"""Attention dispatch: XLA reference path and a Pallas fused kernel for TPU.

The reference model uses `torch.nn.functional.scaled_dot_product_attention` /
xformers (reference `libs/uvit.py:66-92`).  On TPU the equivalent "native kernel
surface" is a Pallas fused-attention kernel; XLA's own fusion of the einsum/softmax
chain is the portable fallback (and is what runs on the CPU test mesh).

Layout convention: (B, H, L, D) — batch, heads, sequence, head_dim.
Softmax is computed in float32 regardless of the input dtype (bf16-safe).
"""
from __future__ import annotations

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

    impl: 'auto'/'infer' (resolve to XLA here — the fused inference kernel
    lives behind `attention_qkv`, which avoids the transpose boundary this
    entry point forces), 'xla', or 'pallas' (the standalone kernel).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl in ("auto", "infer"):
        # Training-safe default: XLA schedules fwd+bwd+remat together and beats
        # the Pallas-fwd + recompute-VJP combination for training (measured 163
        # vs 125 img/s on the panoptic trainer).  For inference the win lives
        # in the packed-qkv kernel (`attention_qkv`), not here: a (B,H,L,D)
        # pallas_call forces q/k/v transposes to materialize at its boundary
        # and blocks XLA's fusion with the projections (round-1 BENCH.md).
        impl = "xla"
    if impl == "pallas":
        from .pallas.fused_attention import fused_attention

        return fused_attention(q, k, v, scale)
    if impl == "xla":
        return _xla_attention(q, k, v, scale)
    raise ValueError(f"unknown attention impl: {impl}")


def attention_qkv(qkv, heads: int, *, scale: Optional[float] = None,
                  impl: str = "auto"):
    """Attention from the qkv projection's packed (B, L, 3C) output; returns
    (B, L, C) with heads concatenated (the output projection's input layout).

    impl: 'infer' uses the fused Pallas kernel on TPU (inference hot path —
    no transposes at the kernel boundary, projections stay fusible in XLA);
    'auto'/'xla' use the XLA path (training, CPU meshes); 'pallas' forces the
    kernel (TPU only).
    """
    b, l, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    if scale is None:
        scale = d ** -0.5
    if impl == "infer":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from .pallas.fused_qkv_attention import fused_attention_qkv

        return fused_attention_qkv(qkv, heads, scale)
    # XLA path: classic reshape/transpose; XLA fuses these into neighbors.
    qkv = qkv.reshape(b, l, 3, heads, d).transpose(2, 0, 3, 1, 4)
    out = _xla_attention(qkv[0], qkv[1], qkv[2], scale)
    return out.transpose(0, 2, 1, 3).reshape(b, l, c)
