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
(running row-max m, denominator l, unnormalized accumulator o — the same
algebra as flash attention's outer loop) makes the result exact: after sp
hops every Q row has attended to every K/V row, in f32, regardless of the
order chunks arrived.  Peak per-device score memory drops from (L/sp, L) to
(L/sp, L/sp), and the hop-i+1 transfer overlaps the hop-i compute because
XLA schedules the ppermute asynchronously between uses.

This replaces the round-3 stopgap of forcing attn_impl='xla' under sp (the
packed-qkv Pallas kernel is one opaque custom call the partitioner cannot
split along L; this module is the sequence-partitionable native path).
Local per-hop compute is plain einsums — MXU-native bf16 with f32
accumulation, fused by XLA inside the shard_map body.

The reference has no sequence parallelism at all (SURVEY.md §2.2: attention
is always full and single-device, `libs/uvit.py:66-92`); this is a
TPU-native extension for the long-sequence geometries (512-res panoptic
dual stream, L≈2126).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Batch axes of the data-parallel layout (parallel/mesh.py::batch_sharding):
# the shard_map body is pointwise in batch, so dp/fsdp just ride along.
_BATCH_AXES = ("dp", "fsdp")


def ring_supported(mesh: Mesh, b: int, l: int) -> bool:
    """Whether the ring path can run: tokens and batch must tile the mesh.

    Batch-1 traces (model.init, shape probes) and odd eval batches fall back
    to the partitionable XLA path — shard_map is strict about divisibility
    where with_sharding_constraint would silently replicate.
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
    return l % sp == 0 and b % dbatch == 0


def _ring_body(qkv, heads: int, scale: float, sp: int):
    """shard_map body: qkv is the LOCAL (b_loc, l_loc, 3C) shard."""
    b, l_loc, c3 = qkv.shape
    c = c3 // 3
    d = c // heads

    def split_heads(t):  # (b, l_loc, C) -> (b, h, l_loc, d)
        return t.reshape(b, l_loc, heads, d).transpose(0, 2, 1, 3)

    q = split_heads(qkv[..., :c])
    kv = jnp.stack([split_heads(qkv[..., c:2 * c]),
                    split_heads(qkv[..., 2 * c:])])  # (2, b, h, l_loc, d)

    # Streaming-softmax state, all f32: running row max, denominator,
    # unnormalized output.
    m = jnp.full((b, heads, l_loc, 1), -jnp.inf, jnp.float32)
    den = jnp.zeros((b, heads, l_loc, 1), jnp.float32)
    o = jnp.zeros((b, heads, l_loc, d), jnp.float32)

    perm = [(i, (i + 1) % sp) for i in range(sp)]
    # sp is a static mesh size (2-8 for every supported layout); the hops are
    # unrolled so XLA overlaps hop i's einsums with hop i+1's ppermute.
    for hop in range(sp):
        k, v = kv[0], kv[1]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        den = den * corr + jnp.sum(p, axis=-1, keepdims=True)
        o = o * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        m = m_new
        if hop + 1 < sp:
            kv = jax.lax.ppermute(kv, "sp", perm)

    out = (o / den).astype(qkv.dtype)  # (b, h, l_loc, d)
    return out.transpose(0, 2, 1, 3).reshape(b, l_loc, c)


def ring_attention_qkv(qkv, heads: int, scale: float,
                       token_sharding: NamedSharding):
    """softmax(Q K^T * scale) V from packed (B, L, 3C) qkv, computed as a
    ring over the 'sp' mesh axis.  Same layout contract as
    `ops.attention.attention_qkv`: returns (B, L, C), heads concatenated.

    Exactness: the streaming softmax is associative re-bracketing of the same
    f32 sums flash attention uses; equivalence vs the full XLA attention is
    asserted to ~bf16 tolerance in tests/test_ring_attention.py.

    Differentiable: autodiff flows through ppermute (its transpose is the
    inverted ring) and the unrolled hops; the sp>1 trainer path takes grads
    straight through this.
    """
    mesh = token_sharding.mesh
    sp = mesh.shape["sp"]
    spec = P(_BATCH_AXES, "sp", None)
    fn = jax.shard_map(
        lambda t: _ring_body(t, heads, scale, sp),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        # The body is replicated over tp (size 1 here) and pointwise in
        # dp/fsdp; skip the replication checker like parallel/pipeline.py.
        check_vma=False,
    )
    return fn(qkv)
