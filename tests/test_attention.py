import jax
import jax.numpy as jnp
import numpy as np

from panopticdiffusionmodels_tpu.ops.attention import multi_head_attention


def _naive(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    w = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32))


def test_xla_attention_matches_naive(rng):
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (2, 4, 37, 16))
    k = jax.random.normal(ks[1], (2, 4, 37, 16))
    v = jax.random.normal(ks[2], (2, 4, 37, 16))
    out = multi_head_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_naive(q, k, v, 16 ** -0.5)), rtol=1e-5, atol=1e-5
    )


def test_auto_dispatch_on_cpu_uses_xla(rng):
    q = jax.random.normal(rng, (1, 2, 10, 8))
    out = multi_head_attention(q, q, q, impl="auto")  # must not require TPU
    assert out.shape == q.shape


def test_custom_scale(rng):
    q = jax.random.normal(rng, (1, 1, 5, 4))
    out1 = multi_head_attention(q, q, q, impl="xla", scale=1.0)
    out2 = multi_head_attention(q, q, q, impl="xla", scale=0.1)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_attention_qkv_matches_transpose_path(rng):
    """Packed-qkv dispatch == classic reshape/transpose path."""
    from panopticdiffusionmodels_tpu.ops.attention import attention_qkv

    b, l, heads, d = 2, 37, 4, 16
    c = heads * d
    qkv = jax.random.normal(rng, (b, l, 3 * c), jnp.float32)
    out = attention_qkv(qkv, heads, impl="xla")
    q, k, v = (
        qkv.reshape(b, l, 3, heads, d).transpose(2, 0, 3, 1, 4)
    )
    ref = multi_head_attention(q, k, v, impl="xla")
    ref = ref.transpose(0, 2, 1, 3).reshape(b, l, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_fused_qkv_kernel_interpret_parity(rng):
    """The Pallas packed-qkv kernel (interpret mode on CPU) == XLA path at the
    flagship (L=258) and panoptic (L=590) sequence shapes, plus a
    beyond-MAX_FULL_SEQ length that exercises the q-chunked path (incl. a
    ragged final chunk)."""
    from panopticdiffusionmodels_tpu.ops.attention import attention_qkv
    from panopticdiffusionmodels_tpu.ops.pallas.fused_qkv_attention import (
        MAX_FULL_SEQ,
        fused_attention_qkv,
    )

    # (MAX_FULL_SEQ+70, 2, 16): ragged final chunk, g=None fallback path;
    # (MAX_FULL_SEQ+70, 4, 64): g=2 head groups, groups=2 — covers the
    # off+j block-index arithmetic the real 512-panoptic shape uses.
    for l, heads, d in [(258, 4, 32), (590, 2, 64), (65, 3, 8),
                        (MAX_FULL_SEQ + 70, 2, 16),
                        (MAX_FULL_SEQ + 70, 4, 64)]:
        c = heads * d
        k1 = jax.random.fold_in(rng, l)
        qkv = jax.random.normal(k1, (2, l, 3 * c), jnp.float32)
        ref = attention_qkv(qkv, heads, impl="xla")
        out = fused_attention_qkv(qkv, heads, d ** -0.5, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_infer_impl_resolves_off_tpu(rng):
    """impl='infer' must fall back to XLA on non-TPU backends."""
    from panopticdiffusionmodels_tpu.ops.attention import attention_qkv

    qkv = jax.random.normal(rng, (1, 9, 3 * 16), jnp.float32)
    out = attention_qkv(qkv, 2, impl="infer")
    ref = attention_qkv(qkv, 2, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_oversized_sequence_falls_back_to_xla_on_tpu(rng, monkeypatch):
    """Working sets beyond the kernel's VMEM budget must resolve
    'infer'/'auto' to XLA instead of raising.  Simulate a TPU backend; if
    dispatch wrongly picked the kernel, pallas would fail to compile on CPU."""
    from panopticdiffusionmodels_tpu.ops import attention as att
    from panopticdiffusionmodels_tpu.ops.pallas.fused_qkv_attention import (
        kernel_supported,
    )

    # the 512-res panoptic dual stream fits the q-chunked kernel...
    assert kernel_supported(2126, 3 * 512, 2, heads=8)
    # ...a 4k-token full-width model does not...
    assert not kernel_supported(4096, 3 * 1024, 4, heads=16)
    # ...nor does a short-but-wide f32 working set (whole-seq path accounting)
    assert not kernel_supported(1024, 3 * 2048, 4, heads=16)
    # single wide f32 head: small logits (cheap to execute) yet over budget
    l, c, heads = 1100, 1152, 1
    assert not kernel_supported(l, 3 * c, 4, heads=heads)
    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    qkv = jax.random.normal(rng, (1, l, 3 * c), jnp.float32)
    ref = att.attention_qkv(qkv, heads, impl="xla")
    for impl in ("infer", "auto"):
        out = att.attention_qkv(qkv, heads, impl=impl)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_trainable_qkv_kernel_grad_matches_xla(rng):
    """Both custom-VJP backends (the flash-style Pallas backward kernel and
    the XLA-recompute fallback) must produce the same gradient as
    differentiating the XLA path (interpret mode on CPU)."""
    from panopticdiffusionmodels_tpu.ops.attention import (
        _qkv_attn_trainable,
        _xla_attention_qkv,
    )

    heads, d = 3, 8
    qkv = jax.random.normal(rng, (2, 33, 3 * heads * d), jnp.float32)
    scale = d ** -0.5

    def loss_xla(q):
        return jnp.sum(jnp.sin(_xla_attention_qkv(q, heads, scale)))

    g_x = jax.grad(loss_xla)(qkv)
    for bwd in ("xla_recompute", "pallas"):
        def loss_pallas(q, bwd=bwd):
            return jnp.sum(jnp.sin(_qkv_attn_trainable(q, heads, scale, True,
                                                       bwd)))

        g_p = jax.grad(loss_pallas)(qkv)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                   atol=2e-5, rtol=2e-5, err_msg=bwd)


def test_bwd_kernel_interpret_parity_shapes(rng):
    """The Pallas backward kernel (interpret mode) == the XLA VJP at the
    flagship (L=258), panoptic (L=590), and a beyond-MAX_FULL_SEQ length
    exercising the q-chunked long path (ragged final chunk + head groups)."""
    from panopticdiffusionmodels_tpu.ops.attention import _xla_attention_qkv
    from panopticdiffusionmodels_tpu.ops.pallas.fused_qkv_attention import (
        MAX_FULL_SEQ,
        fused_attention_qkv_vjp,
    )

    for l, heads, d in [(258, 4, 32), (590, 2, 64),
                        (MAX_FULL_SEQ + 70, 4, 64)]:
        c = heads * d
        k1, k2 = jax.random.split(jax.random.fold_in(rng, l))
        qkv = jax.random.normal(k1, (2, l, 3 * c), jnp.float32)
        g = jax.random.normal(k2, (2, l, c), jnp.float32)
        scale = d ** -0.5
        _, vjp = jax.vjp(lambda q: _xla_attention_qkv(q, heads, scale), qkv)
        ref = vjp(g)[0]
        out = fused_attention_qkv_vjp(qkv, g, heads, scale, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5, err_msg=str(l))


def test_bwd_kernel_supported_budget():
    """Shipped training geometries fit the backward kernel's VMEM budget;
    clearly-oversized ones do not."""
    from panopticdiffusionmodels_tpu.ops.pallas.fused_qkv_attention import (
        bwd_kernel_supported,
    )

    # flagship UViT-L (L=258, C=1024, bf16) and panoptic S/2 dual stream
    # (L=590, C=512) on the whole-sequence path
    assert bwd_kernel_supported(258, 3 * 1024, 2, heads=16)
    assert bwd_kernel_supported(590, 3 * 512, 2, heads=8)
    # 512-res panoptic dual stream on the q-chunked long path
    assert bwd_kernel_supported(2126, 3 * 512, 2, heads=8)
    # 4k-token full-width model: over budget
    assert not bwd_kernel_supported(4096, 3 * 1024, 4, heads=16)
    # unalignable head_dim on the long path
    assert not bwd_kernel_supported(2048, 3 * 320, 2, heads=8)


def test_auto_impl_uses_pallas_bwd_when_supported(rng, monkeypatch):
    """On a (simulated) TPU backend, 'auto' must route the backward to the
    Pallas kernel when its working set fits and fall back to XLA-recompute
    when only the forward fits."""
    from panopticdiffusionmodels_tpu.ops import attention as att

    calls = []

    def fake_trainable(qkv, heads, scale, interpret, bwd):
        calls.append(bwd)
        return qkv[..., : qkv.shape[-1] // 3]

    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(att, "_qkv_attn_trainable", fake_trainable)
    qkv = jax.random.normal(rng, (1, 64, 3 * 128), jnp.bfloat16)
    att.attention_qkv(qkv, 2, impl="auto")
    assert calls == ["pallas"]
    # forward fits but backward does not: (L=512, C=1024, bf16) is inside the
    # fwd budget yet outside the bwd budget -> xla_recompute
    from panopticdiffusionmodels_tpu.ops.pallas.fused_qkv_attention import (
        bwd_kernel_supported,
        kernel_supported,
    )

    assert kernel_supported(512, 3 * 1024, 2, heads=8)
    assert not bwd_kernel_supported(512, 3 * 1024, 2, heads=8)
    qkv = jax.random.normal(rng, (1, 512, 3 * 1024), jnp.bfloat16)
    att.attention_qkv(qkv, 8, impl="auto")
    assert calls[-1] == "xla_recompute"
    with np.testing.assert_raises(ValueError):
        att.attention_qkv(qkv, 8, impl="pallas_vjp")
