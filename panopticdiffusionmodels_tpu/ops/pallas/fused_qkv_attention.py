"""Pallas attention that consumes the qkv GEMM's own output layout.

Round-1 finding (BENCH.md): a standalone (B, H, L, D) Pallas attention kernel
wins every isolated microbench but LOSES in situ, because the q/k/v transposes
materialize at the `pallas_call` boundary and block XLA's fusion with the qkv
and output projections (reference surface: `libs/uvit.py:66-92` SDPA).

This kernel moves the boundary to where nothing needs to fuse across it:

    XLA:    LayerNorm -> qkv Dense          -> (B, L, 3C)
    Pallas: per-head slice -> softmax(QK^T)V -> (B, L, C)   [this file]
    XLA:    output Dense -> +residual

The (B, L, 3C) input IS the qkv GEMM's natural output (row-major head-major:
[q all heads | k all heads | v all heads]); the (B, L, C) output IS the proj
GEMM's natural input (heads concatenated).  No transposes exist on either side,
so both projections stay in XLA's fusion scope, and the kernel keeps the score
matrix and softmax entirely in VMEM in float32.

U-ViT sequences are short and static (max ~600 tokens, `libs/uvit_t2i.py:284`),
so one (batch) grid step holds a whole (L, 3C) slice comfortably in VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One (L, 3C) slice + one f32 (L, L) score block must fit VMEM.
MAX_FULL_SEQ = 1024


def _kernel(qkv_ref, o_ref, *, heads: int, c: int, scale: float):
    d = c // heads
    for h in range(heads):
        # Feed the MXU native bf16 inputs with f32 ACCUMULATION — upcasting the
        # operands to f32 first would drop the matmuls to f32 MXU throughput
        # (4x slower).  Softmax stays in f32 for stability; the probabilities
        # go back to the input dtype for the PV matmul.
        q = qkv_ref[0, :, h * d:(h + 1) * d]
        k = qkv_ref[0, :, c + h * d:c + (h + 1) * d]
        v = qkv_ref[0, :, 2 * c + h * d:2 * c + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def fused_attention_qkv(qkv, heads: int, scale: float, *, interpret: bool = False):
    """softmax(Q K^T * scale) V from a packed (B, L, 3C) qkv tensor.

    Returns (B, L, C) with heads concatenated (the output projection's input
    layout).  Inference-only: sampling paths never differentiate through
    attention; training uses the XLA path (ops/attention.py `auto`).
    """
    b, l, c3 = qkv.shape
    assert c3 % 3 == 0
    c = c3 // 3
    assert c % heads == 0
    if l > MAX_FULL_SEQ:
        raise ValueError(f"fused_attention_qkv: L={l} > {MAX_FULL_SEQ}")

    kernel = functools.partial(_kernel, heads=heads, c=c, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, c), qkv.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * l * l * c,
            bytes_accessed=(c3 + c) * l * qkv.dtype.itemsize,
            transcendentals=heads * l * l,
        ),
        interpret=interpret,
    )(qkv)
