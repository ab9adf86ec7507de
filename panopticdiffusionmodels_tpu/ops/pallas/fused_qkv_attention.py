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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One (L, 3C) slice + one f32 (L, L) score block must fit VMEM.
MAX_FULL_SEQ = 1024
# Beyond MAX_FULL_SEQ a per-(batch, head-group) grid is used instead: each
# step holds three (L, g*d) views of the packed input (g = the smallest
# lane-aligned head group) plus a (Q_CHUNK, L) f32 score block, so the
# working set stays bounded for long sequences.
Q_CHUNK = 256
# Conservative per-grid-step working-set budget (v5e VMEM is 128 MiB/core but
# shared with XLA's own buffers; double buffering doubles block bytes).  The
# estimate in kernel_supported() may be pessimistic for some backend — raise
# it via PDM_VMEM_BUDGET_BYTES instead of editing the kernel.
VMEM_BUDGET_BYTES = int(
    os.environ.get("PDM_VMEM_BUDGET_BYTES", 12 * 1024 * 1024)
)


def _head_group(heads: int, d: int):
    """Smallest head-group size g (dividing heads) whose block width g*d is
    lane-aligned (multiple of 128) — the Pallas TPU block-shape requirement.
    None when no such g exists."""
    for g in range(1, heads + 1):
        if heads % g == 0 and (g * d) % 128 == 0:
            return g
    return None


def kernel_supported(l: int, c3: int, itemsize: int = 2, heads: int = 8) -> bool:
    """Can the kernel hold one grid step's working set in VMEM?
    (x2 for pallas's input/output double buffering across grid steps.)"""
    if l <= MAX_FULL_SEQ:
        # whole-sequence path: (L, 3C) in + (L, C) out blocks, f32 (L, L)
        # scores + exp intermediate
        in_out = (c3 + c3 // 3) * l * itemsize
        scores = l * l * 4 * 2
        return 2 * in_out + scores <= VMEM_BUDGET_BYTES
    d = c3 // 3 // heads
    g = _head_group(heads, d)
    if g is None:
        return False
    per_step = 4 * l * g * d * itemsize  # q, k, v views + output block
    scores = Q_CHUNK * l * 4 * 2  # f32 score block + exp intermediate
    return 2 * per_step + scores <= VMEM_BUDGET_BYTES


def _attend(q, k, v, scale: float, out_dtype):
    """softmax(q k^T * scale) v for one head's (rows, d) blocks — shared by
    both kernels.  Feed the MXU native bf16 inputs with f32 ACCUMULATION —
    upcasting the operands to f32 first would drop the matmuls to f32 MXU
    throughput (4x slower).  Softmax stays in f32 for stability; the
    probabilities go back to the input dtype for the PV matmul."""
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
    return o.astype(out_dtype)


def _kernel(qkv_ref, o_ref, *, heads: int, c: int, scale: float):
    d = c // heads
    for h in range(heads):
        q = qkv_ref[0, :, h * d:(h + 1) * d]
        k = qkv_ref[0, :, c + h * d:c + (h + 1) * d]
        v = qkv_ref[0, :, 2 * c + h * d:2 * c + (h + 1) * d]
        o_ref[0, :, h * d:(h + 1) * d] = _attend(q, k, v, scale, o_ref.dtype)


def _kernel_long(q_ref, k_ref, v_ref, o_ref, *, scale: float, l: int,
                 g: int, d: int):
    """One (batch, head-group) grid step: q/k/v are (1, L, g*d) views of the
    SAME packed array (three BlockSpecs with different head-column index
    maps; the group keeps the block width lane-aligned).  q is processed in
    Q_CHUNK rows so the f32 score block is (chunk, L); softmax still sees
    full rows — no online-softmax carry needed."""
    for j in range(g):
        k = k_ref[0, :, j * d:(j + 1) * d]
        v = v_ref[0, :, j * d:(j + 1) * d]
        for q0 in range(0, l, Q_CHUNK):
            q1 = min(q0 + Q_CHUNK, l)
            q = q_ref[0, q0:q1, j * d:(j + 1) * d]
            o_ref[0, q0:q1, j * d:(j + 1) * d] = _attend(
                q, k, v, scale, o_ref.dtype
            )


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
    d = c // heads
    if not interpret:
        if l > MAX_FULL_SEQ and _head_group(heads, d) is None:
            raise ValueError(
                f"fused_attention_qkv: head_dim {d} cannot form a "
                f"lane-aligned head group"
            )
        if not kernel_supported(l, c3, qkv.dtype.itemsize, heads):
            raise ValueError(
                f"fused_attention_qkv: (L={l}, 3C={c3}) working set exceeds VMEM"
            )
    cost = pl.CostEstimate(
        flops=4 * b * l * l * c,
        bytes_accessed=b * (c3 + c) * l * qkv.dtype.itemsize,
        transcendentals=b * heads * l * l,
    )

    if l > MAX_FULL_SEQ:
        # Per-(batch, head-group) grid; q/k/v are three views of the SAME
        # packed array, selected by head-column index maps (columns blocked
        # in units of the lane-aligned group width g*d: q block j, k block
        # groups+j, v block 2*groups+j).
        g = _head_group(heads, d) or heads  # None only in interpret mode
        groups = heads // g
        kernel = functools.partial(_kernel_long, scale=scale, l=l, g=g, d=d)
        head_spec = lambda off: pl.BlockSpec(
            (1, l, g * d), lambda i, j, off=off: (i, 0, off + j),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, l, c), qkv.dtype),
            grid=(b, groups),
            in_specs=[head_spec(0), head_spec(groups), head_spec(2 * groups)],
            out_specs=pl.BlockSpec((1, l, g * d), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            cost_estimate=cost,
            interpret=interpret,
        )(qkv, qkv, qkv)

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
        cost_estimate=cost,
        interpret=interpret,
    )(qkv)
