"""Ring attention for the sequence-parallel ('sp') mesh axis.

Under sequence parallelism the token dim of every activation is sharded over
'sp' (`parallel/mesh.py::token_sharding`).  Attention is the one op whose
rows need every other token: left to the automatic partitioner, the einsum
chain is resolved by ALL-GATHERING K and V over 'sp' at every one of the
model's `depth+1` attentions — each device re-materializes the full (L, C)
K/V and a (L/sp, L) score block, and the gather serializes against the MXU.

Ring attention (Liu et al., arXiv:2310.01889 — the standard TPU recipe for
context parallelism) never gathers: each device keeps its (L/sp)-token Q
shard resident and the K/V shards rotate around the 'sp' ring one hop per
step via `ppermute` (ICI neighbour traffic only).  A streaming softmax
(running row-max m, denominator den, unnormalized accumulator o — the same
algebra as flash attention's outer loop) makes the result exact: after sp
hops every Q row has attended to every K/V row, in f32, regardless of the
order chunks arrived.  Peak per-device score memory drops from (L/sp, L) to
(L/sp, L/sp), and the hop-i+1 transfer overlaps the hop-i compute because
XLA schedules the ppermute asynchronously between uses.

Per-hop local math runs through the Pallas hop kernel
(`ops/pallas/ring_hop.py`) on TPU: each hop emits unnormalized flash partials
(o_hop, m_hop, den_hop) with the (L/sp, L/sp) f32 score block confined to
VMEM — without it, XLA materializes that block in its buffer space per
(batch, head, hop), forfeiting at the long-sequence geometry exactly the
memory win the packed-qkv kernel bought on the unsharded path.  The combine
across hops is O(L·C) elementwise f32 XLA fuses for free.  Off-TPU (the CPU
test mesh) and for shapes the kernel can't tile, the same hop math runs as
plain XLA einsums.  Training differentiates the kernel hop via a custom VJP
that re-differentiates the XLA hop expression (flash-style recompute).

Token counts that don't divide the ring are padded to the next multiple of
sp and the padded K/V columns masked inside the hop (score -1e30), so e.g.
the 512-res panoptic dual stream (L = 2126 = 2·1063) runs at sp = 4 instead
of silently falling back to XLA beyond sp = 2.

This replaces the round-3 stopgap of forcing attn_impl='xla' under sp (the
packed-qkv Pallas kernel is one opaque custom call the partitioner cannot
split along L; this module is the sequence-partitionable native path).

The reference has no sequence parallelism at all (SURVEY.md §2.2: attention
is always full and single-device, `libs/uvit.py:66-92`); this is a
TPU-native extension for the long-sequence geometries (512-res panoptic
dual stream, L≈2126).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .pallas.ring_hop import NEG_BIG, attention_hop, hop_kernel_supported

# Batch axes of the data-parallel layout (parallel/mesh.py::batch_sharding):
# the shard_map body is pointwise in batch, so dp/fsdp just ride along.
_BATCH_AXES = ("dp", "fsdp")


def ring_supported(mesh: Mesh, b: int, l: int) -> bool:
    """Whether the ring path can run: the batch must tile the mesh and the
    ring must have at least one valid token per shard after padding.

    Batch-1 traces (model.init, shape probes) and odd eval batches fall back
    to the partitionable XLA path — shard_map is strict about divisibility
    where with_sharding_constraint would silently replicate.  Token counts
    that don't divide sp are PADDED (masked inside the hop), not rejected.
    """
    sp = mesh.shape.get("sp", 1)
    if sp <= 1:
        return False
    dbatch = mesh.shape.get("dp", 1) * mesh.shape.get("fsdp", 1)
    if mesh.shape.get("tp", 1) > 1:
        # tp shards the packed 3C head columns; combining both manual specs
        # is not worth it for this model family (heads are cheap to keep
        # whole under sp).  The trainer rejects sp>1 with tp>1 upstream.
        return False
    return l >= sp and b % dbatch == 0


def _hop_xla(q, kv, heads: int, scale: float, nvalid):
    """One hop's flash partials in plain XLA: q (b, lq, C) packed columns,
    kv (b, lk, 2C) packed [k | v].  Returns (o (b, lq, C) network dtype,
    m (b, lq, heads, 1) f32, den (b, lq, heads, 1) f32) — o unnormalized
    relative to this hop's own rowmax m."""
    b, lq, c = q.shape
    lk = kv.shape[1]
    d = c // heads

    def split(t):  # (b, l, C) -> (b, h, l, d)
        return t.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)

    qh = split(q)
    kh = split(kv[..., :c])
    vh = split(kv[..., c:])
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, lk), 3)
    s = jnp.where(col < nvalid, s, NEG_BIG)
    m = jnp.max(s, axis=-1, keepdims=True)  # (b, h, lq, 1)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vh.dtype), vh,
                   preferred_element_type=jnp.float32)
    o = o.astype(q.dtype).transpose(0, 2, 1, 3).reshape(b, lq, c)
    return o, m.transpose(0, 2, 1, 3), den.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _hop_pallas(q, kv, heads: int, scale: float, interpret: bool, nvalid):
    o, m, den = attention_hop(q, kv, heads, scale, nvalid,
                              interpret=interpret)
    return o, _stats(m, heads), _stats(den, heads)


def _stats(t, heads):
    """Kernel stats (b, groups, lq, 128) -> (b, lq, heads, 1): column jj of
    group j's block is head j*g+jj."""
    b, groups, lq, _ = t.shape
    g = heads // groups
    return t[..., :g].transpose(0, 2, 1, 3).reshape(b, lq, heads, 1)


def _hop_pallas_fwd(q, kv, heads, scale, interpret, nvalid):
    return _hop_pallas(q, kv, heads, scale, interpret, nvalid), (q, kv, nvalid)


def _hop_pallas_bwd(heads, scale, interpret, res, cots):
    # Flash-style recompute: re-differentiate the XLA hop expression (scores
    # rebuilt in XLA's fusion scope for the backward only).  m/den receive
    # real cotangents from the cross-hop combine.
    q, kv, nvalid = res
    _, vjp = jax.vjp(lambda q_, kv_: _hop_xla(q_, kv_, heads, scale, nvalid),
                     q, kv)
    dq, dkv = vjp(cots)
    return dq, dkv, np.zeros(jnp.shape(nvalid), jax.dtypes.float0)


_hop_pallas.defvjp(_hop_pallas_fwd, _hop_pallas_bwd)


def _ring_body(qkv, heads: int, scale: float, sp: int, l_true: int,
               use_kernel: bool):
    """shard_map body: qkv is the LOCAL (b_loc, l_pad/sp, 3C) shard; rows of
    the GLOBAL token index >= l_true are padding (masked as K/V, garbage as
    Q — the caller slices them off)."""
    b, l_loc, c3 = qkv.shape
    c = c3 // 3
    d = c // heads

    q = qkv[..., :c]
    kv = qkv[..., c:]
    idx = jax.lax.axis_index("sp")
    if use_kernel:
        hop_fn = lambda q, kv, h, s, nv: _hop_pallas(q, kv, h, s, False, nv)
    else:
        hop_fn = _hop_xla

    def hop_partials(kv, hop):
        # After `hop` rotations along perm (i -> i+1), device i holds the
        # K/V shard originally on device (i - hop) mod sp; its chunk covers
        # global tokens [src*l_loc, (src+1)*l_loc) of which the first
        # `l_true - src*l_loc` (clipped) are real.
        src = jax.lax.rem(idx - hop + sp, sp)
        nvalid = jnp.clip(l_true - src * l_loc, 0, l_loc).astype(jnp.int32)
        return hop_fn(q, kv, heads, scale, nvalid)

    perm = [(i, (i + 1) % sp) for i in range(sp)]
    # sp is a static mesh size (2-8 for every supported layout); the hops are
    # unrolled so XLA overlaps hop i's compute with hop i+1's ppermute.
    o_hop, m, den = hop_partials(kv, 0)
    o = o_hop.astype(jnp.float32).reshape(b, l_loc, heads, d)
    for hop in range(1, sp):
        kv = jax.lax.ppermute(kv, "sp", perm)
        o_hop, m_hop, den_hop = hop_partials(kv, hop)
        m_new = jnp.maximum(m, m_hop)
        corr = jnp.exp(m - m_new)
        corr_hop = jnp.exp(m_hop - m_new)
        den = den * corr + den_hop * corr_hop
        o = (o * corr
             + o_hop.astype(jnp.float32).reshape(b, l_loc, heads, d)
             * corr_hop)
        m = m_new

    out = (o / den).astype(qkv.dtype)  # (b, lq, h, d)
    return out.reshape(b, l_loc, c)


def ring_attention_qkv(qkv, heads: int, scale: float,
                       token_sharding: NamedSharding):
    """softmax(Q K^T * scale) V from packed (B, L, 3C) qkv, computed as a
    ring over the 'sp' mesh axis.  Same layout contract as
    `ops.attention.attention_qkv`: returns (B, L, C), heads concatenated.

    Exactness: the hop-partial combine is associative re-bracketing of the
    same f32 sums flash attention uses; equivalence vs the full XLA attention
    is asserted to ~bf16 tolerance in tests/test_ring_attention.py (including
    padded L % sp != 0 shapes).

    Differentiable: autodiff flows through ppermute (its transpose is the
    inverted ring) and the unrolled hops; the kernel hop carries a custom
    VJP (XLA-recompute).  The sp>1 trainer path takes grads straight through
    this.
    """
    mesh = token_sharding.mesh
    sp = mesh.shape["sp"]
    b, l, c3 = qkv.shape
    c = c3 // 3
    l_pad = -(-l // sp) * sp
    if l_pad != l:
        qkv = jnp.pad(qkv, ((0, 0), (0, l_pad - l), (0, 0)))
    use_kernel = (
        jax.default_backend() == "tpu"
        and os.environ.get("PDM_RING_LOCAL", "") != "xla"
        and hop_kernel_supported(l_pad // sp, l_pad // sp, c, heads,
                                 qkv.dtype.itemsize)
    )
    spec = P(_BATCH_AXES, "sp", None)
    fn = jax.shard_map(
        lambda t: _ring_body(t, heads, scale, sp, l, use_kernel),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        # The body is replicated over tp (size 1 here) and pointwise in
        # dp/fsdp; skip the replication checker like parallel/pipeline.py.
        check_vma=False,
    )
    out = fn(qkv)
    return out[:, :l] if l_pad != l else out
