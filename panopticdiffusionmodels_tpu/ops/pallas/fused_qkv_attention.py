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
# The backward kernel carries two f32 score blocks (probabilities + dp) plus
# two (L, d) f32 accumulators per head, so its q chunk is half the forward's
# to keep the long-sequence working set inside the same VMEM budget.
BWD_Q_CHUNK = 128
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


def bwd_kernel_supported(l: int, c3: int, itemsize: int = 2,
                         heads: int = 8) -> bool:
    """Can the BACKWARD kernel hold one grid step's working set in VMEM?
    The backward carries the incoming cotangent as an extra input, writes a
    packed dqkv block, and keeps two f32 score-sized temporaries live
    (probabilities + dp; ds overwrites one of them)."""
    c = c3 // 3
    if l <= MAX_FULL_SEQ:
        # qkv in + cotangent in + packed dqkv out, double-buffered
        in_out = (2 * c3 + c) * l * itemsize
        scores = l * l * 4 * 2
        return 2 * in_out + scores <= VMEM_BUDGET_BYTES
    d = c // heads
    g = _head_group(heads, d)
    if g is None:
        return False
    # q/k/v/do views + dq/dk/dv output blocks (one head group each)
    per_step = 7 * l * g * d * itemsize
    scores = BWD_Q_CHUNK * l * 4 * 2
    acc = 2 * l * d * 4  # f32 dk/dv accumulators across q chunks
    return 2 * per_step + scores + acc <= VMEM_BUDGET_BYTES


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


def _attend_bwd(q, k, v, do, scale: float):
    """Gradients of o = softmax(q k^T * scale) v for one head's blocks.

    q/do are (rows, d) row blocks; k/v are the full (L, d).  Returns
    (dq (rows, d), dk_contrib (L, d), dv_contrib (L, d)) in f32 — the k/v
    contributions are partial sums the caller accumulates across row blocks.
    Scores/probabilities are recomputed here (flash-style: the forward saves
    nothing), softmax math in f32, MXU inputs in the network dtype with f32
    accumulation."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    pd = p.astype(v.dtype)
    # dv += p^T do
    dv = jax.lax.dot_general(
        pd, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dp = do v^T; ds = p * (dp - rowsum(dp * p)) * scale
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale).astype(
        v.dtype
    )
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dk += ds^T q
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dq, dk, dv


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


def _kernel_bwd(qkv_ref, g_ref, dqkv_ref, *, heads: int, c: int, scale: float):
    """Whole-sequence backward: one batch element per grid step, all heads,
    packed (1, L, 3C) dqkv written in the qkv GEMM's own layout so the
    projection's VJP consumes it without any relayout."""
    d = c // heads
    for h in range(heads):
        q = qkv_ref[0, :, h * d:(h + 1) * d]
        k = qkv_ref[0, :, c + h * d:c + (h + 1) * d]
        v = qkv_ref[0, :, 2 * c + h * d:2 * c + (h + 1) * d]
        do = g_ref[0, :, h * d:(h + 1) * d]
        dq, dk, dv = _attend_bwd(q, k, v, do, scale)
        dt = dqkv_ref.dtype
        dqkv_ref[0, :, h * d:(h + 1) * d] = dq.astype(dt)
        dqkv_ref[0, :, c + h * d:c + (h + 1) * d] = dk.astype(dt)
        dqkv_ref[0, :, 2 * c + h * d:2 * c + (h + 1) * d] = dv.astype(dt)


def _kernel_bwd_long(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                     scale: float, l: int, g: int, d: int):
    """Long-sequence backward, one (batch, head-group) grid step: q processed
    in BWD_Q_CHUNK rows (f32 score blocks stay (chunk, L)); dk/dv accumulate
    across chunks in f32 and are written once per head."""
    for j in range(g):
        k = k_ref[0, :, j * d:(j + 1) * d]
        v = v_ref[0, :, j * d:(j + 1) * d]
        dk_acc = jnp.zeros((l, d), jnp.float32)
        dv_acc = jnp.zeros((l, d), jnp.float32)
        for q0 in range(0, l, BWD_Q_CHUNK):
            q1 = min(q0 + BWD_Q_CHUNK, l)
            q = q_ref[0, q0:q1, j * d:(j + 1) * d]
            do = do_ref[0, q0:q1, j * d:(j + 1) * d]
            dq, dk, dv = _attend_bwd(q, k, v, do, scale)
            dq_ref[0, q0:q1, j * d:(j + 1) * d] = dq.astype(dq_ref.dtype)
            dk_acc = dk_acc + dk
            dv_acc = dv_acc + dv
        dk_ref[0, :, j * d:(j + 1) * d] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, j * d:(j + 1) * d] = dv_acc.astype(dv_ref.dtype)


def fused_attention_qkv_vjp(qkv, g, heads: int, scale: float, *,
                            interpret: bool = False):
    """dL/dqkv of `fused_attention_qkv` from the packed (B, L, 3C) input and
    the (B, L, C) output cotangent.  Flash-style: scores and probabilities
    are recomputed inside the kernel (the forward saves no residuals beyond
    qkv itself), so no (L, L) tensor ever touches HBM — the XLA-recompute
    alternative materializes f32 (B, H, L, L) logits several times in the
    backward pass (reference surface: training through
    `libs/uvit.py:66-92`'s SDPA)."""
    b, l, c3 = qkv.shape
    assert c3 % 3 == 0
    c = c3 // 3
    assert c % heads == 0 and g.shape == (b, l, c)
    d = c // heads
    if not interpret:
        if l > MAX_FULL_SEQ and _head_group(heads, d) is None:
            raise ValueError(
                f"fused_attention_qkv_vjp: head_dim {d} cannot form a "
                f"lane-aligned head group"
            )
        if not bwd_kernel_supported(l, c3, qkv.dtype.itemsize, heads):
            raise ValueError(
                f"fused_attention_qkv_vjp: (L={l}, 3C={c3}) working set "
                f"exceeds VMEM"
            )
    cost = pl.CostEstimate(
        flops=10 * b * l * l * c,  # 5 GEMMs, 2 l*l*d MACs each
        bytes_accessed=2 * b * (c3 + c) * l * qkv.dtype.itemsize,
        transcendentals=b * heads * l * l,
    )

    if l > MAX_FULL_SEQ:
        grp = _head_group(heads, d) or heads  # None only in interpret mode
        groups = heads // grp
        kernel = functools.partial(_kernel_bwd_long, scale=scale, l=l, g=grp,
                                   d=d)
        head_spec = lambda off: pl.BlockSpec(
            (1, l, grp * d), lambda i, j, off=off: (i, 0, off + j),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec((1, l, grp * d), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((b, l, c), qkv.dtype)
        dq, dk, dv = pl.pallas_call(
            kernel,
            out_shape=(shape, shape, shape),
            grid=(b, groups),
            in_specs=[head_spec(0), head_spec(groups), head_spec(2 * groups),
                      pl.BlockSpec((1, l, grp * d), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=(out_spec, out_spec, out_spec),
            cost_estimate=cost,
            interpret=interpret,
        )(qkv, qkv, qkv, g)
        # The packed cotangent the qkv projection's VJP expects; XLA fuses
        # the concatenate into that GEMM's operand read.
        return jnp.concatenate([dq, dk, dv], axis=-1)

    kernel = functools.partial(_kernel_bwd, heads=heads, c=c, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, c3), qkv.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, c3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=cost,
        interpret=interpret,
    )(qkv, g)


def fused_attention_qkv(qkv, heads: int, scale: float, *, interpret: bool = False):
    """softmax(Q K^T * scale) V from a packed (B, L, 3C) qkv tensor.

    Returns (B, L, C) with heads concatenated (the output projection's input
    layout).  Forward only — training differentiates through this via the
    custom VJP in ops/attention.py (`fused_attention_qkv_vjp` when its
    working set fits VMEM, XLA recompute otherwise).
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
