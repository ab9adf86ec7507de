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


def _xla_attention_qkv(qkv, heads: int, scale: float):
    """XLA path: classic reshape/transpose; XLA fuses these into neighbors."""
    b, l, c3 = qkv.shape
    c = c3 // 3
    t = qkv.reshape(b, l, 3, heads, c // heads).transpose(2, 0, 3, 1, 4)
    out = _xla_attention(t[0], t[1], t[2], scale)
    return out.transpose(0, 2, 1, 3).reshape(b, l, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _qkv_attn_trainable(qkv, heads: int, scale: float, interpret: bool,
                        bwd: str):
    """Pallas forward + a selectable backward (pallas_call has no reverse
    rule of its own):

      bwd='pallas'        — the flash-style Pallas backward kernel
                            (`fused_attention_qkv_vjp`): scores recomputed in
                            VMEM, no (L, L) tensor in HBM.
      bwd='xla_recompute' — re-differentiate the XLA attention for the VJP
                            (the round-2 shipped path: +3.7% over pure XLA on
                            the panoptic train step; the packed-qkv boundary
                            is what makes even this a win — the round-1
                            (B,H,L,D) kernel LOST the same comparison)."""
    from .pallas.fused_qkv_attention import fused_attention_qkv

    return fused_attention_qkv(qkv, heads, scale, interpret=interpret)


def _qkv_attn_fwd(qkv, heads, scale, interpret, bwd):
    from .pallas.fused_qkv_attention import fused_attention_qkv

    return fused_attention_qkv(qkv, heads, scale, interpret=interpret), qkv


def _qkv_attn_bwd(heads, scale, interpret, bwd, qkv, g):
    if bwd == "pallas":
        from .pallas.fused_qkv_attention import fused_attention_qkv_vjp

        return (fused_attention_qkv_vjp(qkv, g, heads, scale,
                                        interpret=interpret),)
    _, vjp = jax.vjp(lambda q: _xla_attention_qkv(q, heads, scale), qkv)
    return (vjp(g)[0],)


_qkv_attn_trainable.defvjp(_qkv_attn_fwd, _qkv_attn_bwd)


def attention_qkv(qkv, heads: int, *, scale: Optional[float] = None,
                  impl: str = "auto", token_sharding=None):
    """Attention from the qkv projection's packed (B, L, 3C) output; returns
    (B, L, C) with heads concatenated (the output projection's input layout).

    impl:
      'auto'   — on TPU: Pallas forward + the best supported backward
                 (the flash-style Pallas VJP kernel when its working set
                 fits VMEM, else XLA-recompute); elsewhere: XLA.
      'infer'  — on TPU: the Pallas kernel, forward only; elsewhere: XLA.
      'pallas_vjp' / 'pallas_recompute' — force the Pallas-forward backward
                 flavor (A/B handles; 'auto' picks between these).
      'xla'    — force the XLA path.
      'pallas' — force the kernel (TPU only).
      'ring'   — sequence-parallel ring attention over the mesh's 'sp' axis
                 (needs `token_sharding`; shapes that don't tile the mesh —
                 e.g. batch-1 init traces — fall back to XLA, which the
                 partitioner can still split along L).
    """
    d = qkv.shape[-1] // 3 // heads
    if scale is None:
        scale = d ** -0.5
    if impl == "ring":
        from .ring_attention import ring_attention_qkv, ring_supported

        if token_sharding is not None and ring_supported(
            token_sharding.mesh, qkv.shape[0], qkv.shape[1]
        ):
            return ring_attention_qkv(qkv, heads, scale, token_sharding)
        # Loud fallback (round-3 verdict: silent XLA fallback hid a capped
        # sp).  Batch-1 init/shape-probe traces are expected and stay quiet.
        if qkv.shape[0] > 1:
            import logging

            logging.getLogger(__name__).warning(
                "attention_qkv: impl='ring' requested but unsupported for "
                "batch=%d, L=%d on mesh %s — falling back to XLA attention "
                "(the partitioner will all-gather K/V over 'sp')",
                qkv.shape[0], qkv.shape[1],
                None if token_sharding is None
                else dict(token_sharding.mesh.shape),
            )
        impl = "xla"
    on_tpu = jax.default_backend() == "tpu"
    # The kernel holds one (L, 3C) slice + an f32 score block in VMEM (whole
    # (L, L) for short sequences, q-chunked (Q_CHUNK, L) beyond MAX_FULL_SEQ,
    # e.g. the 512-res panoptic dual stream at ~2126 tokens).  When even the
    # chunked working set exceeds VMEM, 'auto'/'infer' fall back to XLA
    # instead of raising.  Explicit impl='pallas' still raises — the caller
    # asked for the kernel specifically.
    from .pallas.fused_qkv_attention import bwd_kernel_supported, kernel_supported

    fits = kernel_supported(qkv.shape[1], qkv.shape[2], qkv.dtype.itemsize,
                            heads)
    bwd_fits = bwd_kernel_supported(qkv.shape[1], qkv.shape[2],
                                    qkv.dtype.itemsize, heads)
    if impl in ("auto", "pallas_vjp", "pallas_recompute") and on_tpu and fits:
        if impl == "pallas_vjp" and not bwd_fits:
            raise ValueError(
                "attention_qkv: impl='pallas_vjp' but the backward working "
                "set exceeds VMEM for this shape"
            )
        use_pallas_bwd = (impl == "pallas_vjp"
                          or (impl == "auto" and bwd_fits))
        return _qkv_attn_trainable(
            qkv, heads, scale, False,
            "pallas" if use_pallas_bwd else "xla_recompute")
    if impl in ("auto", "pallas_vjp", "pallas_recompute"):
        impl = "xla"
    if impl == "infer":
        impl = "pallas" if (on_tpu and fits) else "xla"
    if impl == "pallas":
        from .pallas.fused_qkv_attention import fused_attention_qkv

        return fused_attention_qkv(qkv, heads, scale)
    return _xla_attention_qkv(qkv, heads, scale)
