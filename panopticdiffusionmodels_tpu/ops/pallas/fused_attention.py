"""Pallas fused attention for TPU.

The U-ViT family runs short, static sequences (1 time token + optional 77 CLIP
tokens + N image patches [+ N mask patches]; max ~600 for the panoptic model,
reference `libs/uvit_t2i.py:280-288`).  At these lengths the whole (L, L) score
matrix for one (batch, head) fits comfortably in VMEM, so the speed-of-light
design is NOT an online-softmax flash loop — it is a single fused kernel per
(batch*head) that keeps Q/K/V, the scores and the softmax entirely on-chip and
writes only the (L, D) output back to HBM.  This removes the HBM round-trip for
the score matrix that a naive XLA lowering could incur, and computes softmax in
float32 while inputs/outputs stay bf16.

For long sequences (beyond `MAX_FULL_SEQ`) we fall back to the XLA path, which
XLA tiles with its own flash-style rewriter; a blocked Pallas flash kernel is the
planned upgrade path if a long-sequence model family is added.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest sequence handled by the single-block fused kernel.  L=1024 f32 scores
# are 4 MB — safely inside the ~16 MB/core VMEM budget next to Q/K/V.
MAX_FULL_SEQ = 1024

_LANE = 128
_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, l_actual: int):
    # Block shapes: q/o (1, Lq, Dp), k/v (1, Lk, Dp) — Lq is only sublane-
    # aligned (16) while Lk pays full 128-lane padding; scores are (Lq, Lk),
    # ~30% less padded work than square padding at L=258.  Softmax in f32.
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    lk = s.shape[-1]
    if l_actual != lk:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < l_actual, s, _NEG_INF)
    # Numerically stable softmax.
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale: float):
    """Fused softmax(QK^T * scale)V over (B, H, L, D) tensors.

    Differentiable: the forward runs the Pallas kernel; the backward is the
    analytic attention VJP in XLA (recompute-based, no saved score matrix) —
    pallas_call itself has no reverse rule."""
    return _fused_attention_fwd_impl(q, k, v, scale)


def _fused_attention_fwd(q, k, v, scale):
    return _fused_attention_fwd_impl(q, k, v, scale), (q, k, v)


def _fused_attention_bwd(scale, res, g):
    q, k, v = res
    # Recompute the softmax weights in f32 and apply the standard attention VJP.
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = scale * jnp.einsum("bhqk,bhkd->bhqd", ds, kf)
    dk = scale * jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def _fused_attention_fwd_impl(q, k, v, scale: float):
    b, h, l, d = q.shape
    if l > MAX_FULL_SEQ:
        from ..attention import _xla_attention

        return _xla_attention(q, k, v, scale)

    lq = _round_up(l, 16)  # query rows: sublane alignment only
    lk = _round_up(l, _LANE)  # key/value rows: lane dim of the score matrix
    dp = _round_up(d, _LANE)
    bh = b * h

    def prep(x, lpad):
        x = x.reshape(bh, l, d)
        if lpad != l or dp != d:
            x = jnp.pad(x, ((0, 0), (0, lpad - l), (0, dp - d)))
        return x

    qp = prep(q, lq)
    kp = prep(k, lk)
    vp = prep(v, lk)

    kernel = functools.partial(_attention_kernel, scale=scale, l_actual=l)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, lq, dp), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, lq, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (lq * lk * dp) * 2,
            bytes_accessed=2 * bh * (lq + lk) * dp * q.dtype.itemsize,
            transcendentals=bh * lq * lk,
        ),
    )(qp, kp, vp)

    out = out[:, :l, :d].reshape(b, h, l, d)
    return out
