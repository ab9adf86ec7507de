#!/usr/bin/env python
"""On-chip verification of the packed-qkv Pallas attention kernel.

CPU tests can't compile Pallas, so this is the numerical evidence that the
kernel the HEADLINE runs computes the same attention as the XLA reference:

  1. dispatch proof — the lowered HLO for impl='infer' must contain a TPU
     custom call (i.e. the kernel is actually selected on this backend);
  2. kernel vs XLA outputs across the shipped shapes (258 = ImageNet-256/512
     UViT-L tokens, 590 = panoptic dual-stream, incl. a lane-unaligned L);
  3. full UViT-L forward with attn_impl='infer' vs 'xla' on shared weights;
  4. the training path — forward parity and gradient parity vs the pure-XLA
     path for every custom-VJP flavor ('pallas_vjp' = the flash-style Pallas
     backward kernel, 'pallas_recompute' = XLA-recompute, and 'auto'), at
     the whole-sequence AND q-chunked long-sequence backward lengths.

Run: python scripts/verify_kernel_tpu.py   (one TPU process at a time)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


def main():
    from panopticdiffusionmodels_tpu.ops.attention import attention_qkv

    print("backend:", jax.default_backend(), "| devices:", jax.devices())

    # 1. dispatch proof: the infer path must lower to a TPU custom call.
    qkv0 = jnp.zeros((2, 258, 3 * 1024), jnp.bfloat16)
    hlo = jax.jit(lambda q: attention_qkv(q, 16, impl="infer")).lower(qkv0).as_text()
    uses_kernel = ("tpu_custom_call" in hlo) or ("custom_call" in hlo)
    print(f"infer dispatch lowers to custom call: {uses_kernel}")
    assert uses_kernel, (
        "impl='infer' did not select the Pallas kernel on this backend — "
        "the headline bench would silently run XLA"
    )

    # 2. kernel vs XLA numerics (bf16 inputs, f32 softmax both sides).
    for (b, l, heads, d) in [(32, 258, 16, 64), (8, 590, 8, 64),
                             (4, 130, 4, 32), (64, 258, 16, 64),
                             (8, 258, 16, 72),   # H models: lane-unaligned head_dim
                             (2, 2126, 8, 64)]:  # 512-panoptic: q-chunked path
        c = heads * d
        qkv = jax.random.normal(jax.random.PRNGKey(l), (b, l, 3 * c)) * 0.5
        qkv = qkv.astype(jnp.bfloat16)
        x = jax.jit(lambda q: attention_qkv(q, heads, impl="xla"))(qkv)
        p = jax.jit(lambda q: attention_qkv(q, heads, impl="pallas"))(qkv)
        r = rel(p, x)
        print(f"kernel parity B{b} L{l} H{heads} D{d}: rel dev {r:.2e}")
        assert r < 5e-3, (b, l, heads, d, r)

    # 3. full UViT-L forward, shared weights.
    from panopticdiffusionmodels_tpu.models import UViT

    kwargs = dict(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                  depth=20, num_heads=16, num_classes=1001,
                  dtype=jnp.bfloat16, scan_blocks=True)
    m_x = UViT(attn_impl="xla", **kwargs)
    m_p = UViT(attn_impl="infer", **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 4))
    t = jnp.full((8,), 500.0)
    y = jnp.zeros((8,), jnp.int32)
    params = jax.jit(m_x.init)(jax.random.PRNGKey(1), x[:1], t[:1], y[:1])
    out_x = jax.jit(m_x.apply)(params, x, t, y)
    out_p = jax.jit(m_p.apply)(params, x, t, y)
    r = rel(out_p, out_x)
    print(f"UViT-L forward infer vs xla: rel dev {r:.2e}")
    assert r < 2e-2, r  # bf16 noise compounds over 21 blocks

    # 4. training path: forward parity + gradient parity for BOTH custom-VJP
    # backends (the flash-style Pallas backward kernel and the XLA-recompute
    # fallback), plus the q-chunked long-sequence backward at the 512-res
    # panoptic length.
    def loss(q, impl, heads):
        return jnp.sum(
            attention_qkv(q, heads, impl=impl).astype(jnp.float32) ** 2)

    for (b, l, heads, d) in [(8, 258, 8, 64),     # whole-seq bwd
                             (2, 2126, 8, 64)]:   # q-chunked long bwd
        c = heads * d
        qkv = (jax.random.normal(jax.random.PRNGKey(9), (b, l, 3 * c)) * 0.5
               ).astype(jnp.bfloat16)
        lx, gx = jax.jit(
            jax.value_and_grad(lambda q: loss(q, "xla", heads)))(qkv)
        for impl in ("pallas_vjp", "pallas_recompute", "auto"):
            lp, gp = jax.jit(
                jax.value_and_grad(lambda q, i=impl: loss(q, i, heads)))(qkv)
            fdev = abs(float(lp - lx)) / abs(float(lx))
            gdev = rel(gp, gx)
            print(f"train path L{l} {impl}: fwd rel dev {fdev:.2e}, "
                  f"grad rel dev {gdev:.2e}")
            assert fdev < 5e-3, (l, impl, fdev)
            assert gdev < 5e-3, (l, impl, gdev)

    # 5. the pipelined apply (parallel/pipeline.py): shard_map + per-layer
    # scan + ppermute with the Pallas kernel INSIDE the manual-SPMD body.
    # A 1-device (pp=1) mesh traces the identical program structure as a
    # multi-stage mesh, so this proves pallas-in-shard_map lowers and matches
    # the plain forward on hardware (a multi-chip pp mesh can't be built in
    # this 1-chip image).
    from panopticdiffusionmodels_tpu.models import UViTT2I
    from panopticdiffusionmodels_tpu.parallel.mesh import make_mesh
    from panopticdiffusionmodels_tpu.parallel.pipeline import make_pipelined_apply

    model = UViTT2I(
        img_size=32, patch_size=2, in_chans=4, embed_dim=512, depth=12,
        num_heads=8, clip_dim=768, num_clip_token=77, mask_bits=8,
        mask_size=64, enable_panoptic=True, separate=True,
        dtype=jnp.bfloat16, scan_blocks=True, attn_impl="infer",
    )
    b = 4
    x = jnp.zeros((b, 32, 32, 4))
    t = jnp.full((b,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 77, 768)) * 0.1
    mask = jax.random.normal(jax.random.PRNGKey(2), (b, 64, 64, 8)) * 0.1
    params = jax.jit(lambda k: model.init(k, x, t, ctx, mask_token=mask))(
        jax.random.PRNGKey(0)
    )
    pipe = make_pipelined_apply(model, make_mesh(dp=1, pp=1), num_micro=2)
    plain = jax.jit(
        lambda p, x, t, c, m: model.apply(p, x, t, c, mask_token=m)
    )(params, x, t, ctx, mask)
    piped = jax.jit(
        lambda p, x, t, c, m: pipe(p, x, t, c, mask_token=m)
    )(params, x, t, ctx, mask)
    pdev = max(
        rel(a, b2) for a, b2 in zip(jax.tree.leaves(plain), jax.tree.leaves(piped))
    )
    print(f"pipelined apply (pallas in shard_map) vs plain: rel dev {pdev:.2e}")
    assert pdev < 1e-3, pdev

    # 6. remat policies over the Pallas custom-VJP attention: the full UViT
    # train-path gradient under use_checkpoint with each shipped
    # remat_policy (incl. 'save_attn' = save_only_these_names over the
    # kernel's named output) must match the no-remat gradient ON CHIP —
    # jax.checkpoint policies interact with custom_vjp at lowering time, so
    # the CPU-mesh test (which runs XLA attention) does not cover this.
    base = dict(img_size=32, patch_size=2, in_chans=4, embed_dim=512,
                depth=4, num_heads=8, num_classes=11, dtype=jnp.bfloat16,
                scan_blocks=True, attn_impl="auto")
    xb = jax.random.normal(jax.random.PRNGKey(3), (8, 32, 32, 4))
    tb = jnp.full((8,), 500.0)
    yb = jnp.zeros((8,), jnp.int32)
    m0 = UViT(use_checkpoint=False, **base)
    params = jax.jit(m0.init)(jax.random.PRNGKey(4), xb[:1], tb[:1], yb[:1])

    def train_loss(p, model):
        return jnp.mean(model.apply(p, xb, tb, yb).astype(jnp.float32) ** 2)

    g0 = jax.jit(jax.grad(lambda p: train_loss(p, m0)))(params)
    for policy in (None, "save_attn", "dots_no_batch"):
        m1 = UViT(use_checkpoint=True, remat_policy=policy, **base)
        g1 = jax.jit(jax.grad(lambda p: train_loss(p, m1)))(params)
        gdev = max(
            rel(a, b2)
            for a, b2 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
        )
        print(f"remat_policy={policy!r} grad vs no-remat: rel dev {gdev:.2e}")
        assert gdev < 5e-3, (policy, gdev)

    # 7. ring-hop kernel (ops/pallas/ring_hop.py — the sp path's per-hop
    # local math): compiled kernel vs the XLA hop expression at the 512-res
    # panoptic LOCAL shapes (L=2126, sp=2 -> lq=lk=1063, head group g=2),
    # with and without masked (padded) trailing K/V columns.  The ring's
    # cross-hop combine is pure XLA and is covered on the CPU mesh; this is
    # the on-chip evidence for the kernel itself.
    from panopticdiffusionmodels_tpu.ops.pallas.ring_hop import attention_hop
    from panopticdiffusionmodels_tpu.ops.ring_attention import _hop_xla, _stats

    heads, d = 8, 64
    c = heads * d
    for (lq, lk, nvalid) in [(1063, 1063, 1063), (1064, 1064, 1000),
                             (258, 258, 258)]:
        q = (jax.random.normal(jax.random.PRNGKey(5), (2, lq, c)) * 0.5
             ).astype(jnp.bfloat16)
        kv = (jax.random.normal(jax.random.PRNGKey(6), (2, lk, 2 * c)) * 0.5
              ).astype(jnp.bfloat16)
        o_k, m_k, den_k = jax.jit(
            lambda q, kv: attention_hop(q, kv, heads, d ** -0.5,
                                        jnp.int32(nvalid))
        )(q, kv)
        o_x, m_x, den_x = jax.jit(
            lambda q, kv: _hop_xla(q, kv, heads, d ** -0.5, nvalid)
        )(q, kv)
        rs = (rel(o_k, o_x), rel(_stats(np.asarray(m_k), heads), m_x),
              rel(_stats(np.asarray(den_k), heads), den_x))
        print(f"ring hop Lq{lq} Lk{lk} nvalid{nvalid}: "
              f"o/m/den rel dev {rs[0]:.2e}/{rs[1]:.2e}/{rs[2]:.2e}")
        assert max(rs) < 5e-3, (lq, lk, nvalid, rs)

    print("kernel verification OK")


if __name__ == "__main__":
    main()
