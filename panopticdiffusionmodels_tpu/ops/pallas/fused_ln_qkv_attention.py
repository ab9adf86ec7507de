"""PROTOTYPE: LayerNorm + qkv GEMM + attention in ONE Pallas kernel.

The shipped packed-qkv kernel (`fused_qkv_attention.py`) starts AFTER the qkv
GEMM, so two HBM round trips remain per block on the attention path:
the LayerNorm output (B, L, C) is materialized for the GEMM to read, and the
GEMM's (B, L, 3C) output is materialized for the kernel to read.  This kernel
moves the boundary one step further out:

    XLA:    x (pre-norm residual stream)        -> (B, L, C)
    Pallas: LayerNorm -> qkv GEMM -> attention   -> (B, L, C)   [this file]
    XLA:    output Dense -> +residual

eliminating both round trips (~260 MB of HBM traffic per UViT-L block at
B=64).  The qkv weight (C, 3C) sits VMEM-resident across the batch grid
(constant index map -> fetched once), x rows are normalized in f32 (flax
LayerNorm semantics, eps inside rsqrt), and the GEMM feeds the MXU bf16
operands with f32 accumulation.

Whole-sequence path only (L <= MAX_FULL_SEQ) — the flagship shapes.  The
verdict on whether this beats the shipped boundary in situ lives in BENCH.md
("fused-LN prototype", round 3); reference surface `libs/uvit.py:54-92`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_qkv_attention import MAX_FULL_SEQ, _attend


def _kernel(x_ref, scale_ref, bias_ref, w_ref, o_ref, *, heads: int, c: int,
            attn_scale: float, eps: float):
    # LayerNorm in f32 (flax semantics: stats over the feature axis, eps
    # inside the rsqrt, then gamma/beta)
    x = x_ref[0].astype(jnp.float32)  # (L, C)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    # qkv GEMM on the MXU: bf16 operands, f32 accumulation
    qkv = jax.lax.dot_general(
        xn.astype(w_ref.dtype), w_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)  # (L, 3C)
    d = c // heads
    for h in range(heads):
        q = qkv[:, h * d:(h + 1) * d]
        k = qkv[:, c + h * d:c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        o_ref[0, :, h * d:(h + 1) * d] = _attend(q, k, v, attn_scale, o_ref.dtype)


def fused_ln_qkv_attention(x, ln_scale, ln_bias, w_qkv, heads: int,
                           attn_scale: float, eps: float = 1e-5,
                           *, interpret: bool = False):
    """LayerNorm(x) @ w_qkv -> multi-head attention, all in VMEM.

    x: (B, L, C); ln_scale/ln_bias: (C,); w_qkv: (C, 3C) packed head-major.
    Returns (B, L, C) heads-concatenated (the output projection's layout).
    Inference-only prototype (no VJP); qkv_bias unsupported (the UViT family
    uses qkv_bias=False).
    """
    b, l, c = x.shape
    assert w_qkv.shape == (c, 3 * c)
    assert l <= MAX_FULL_SEQ, "prototype covers the whole-sequence path only"
    kernel = functools.partial(
        _kernel, heads=heads, c=c, attn_scale=attn_scale, eps=eps)
    cost = pl.CostEstimate(
        flops=2 * b * l * c * 3 * c + 4 * b * l * l * c,
        bytes_accessed=(2 * b * l * c + 3 * c * c) * x.dtype.itemsize,
        transcendentals=b * heads * l * l,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            # constant index map: the weight stays VMEM-resident across the grid
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=cost,
        interpret=interpret,
    )(x, ln_scale, ln_bias, w_qkv)
