"""Interpret-mode numerics for the fused LN+QKV+attention prototype kernel
(the on-chip in-situ verdict lives in scripts/bench_fused_ln.py / BENCH.md)."""
import jax
import jax.numpy as jnp
import numpy as np

from panopticdiffusionmodels_tpu.ops.pallas.fused_ln_qkv_attention import (
    fused_ln_qkv_attention,
)


def _reference(x, s, b, w, heads, scale, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * s + b
    qkv = xn.astype(x.dtype) @ w  # (B, L, 3C)
    B, L, C = x.shape
    d = C // heads
    outs = []
    for h in range(heads):
        q = qkv[..., h * d:(h + 1) * d].astype(jnp.float32)
        k = qkv[..., C + h * d:C + (h + 1) * d].astype(jnp.float32)
        v = qkv[..., 2 * C + h * d:2 * C + (h + 1) * d].astype(jnp.float32)
        p = jax.nn.softmax(jnp.einsum("bld,bmd->blm", q, k) * scale, axis=-1)
        outs.append(jnp.einsum("blm,bmd->bld", p, v))
    return jnp.concatenate(outs, axis=-1)


def test_fused_ln_qkv_attention_interpret():
    key = jax.random.PRNGKey(0)
    B, L, C, heads = 2, 16, 64, 4
    x = jax.random.normal(key, (B, L, C), jnp.float32)
    s = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (C,))
    b = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (C,))
    w = 0.1 * jax.random.normal(jax.random.fold_in(key, 3), (C, 3 * C))
    scale = (C // heads) ** -0.5
    out = fused_ln_qkv_attention(x, s, b, w, heads, scale, interpret=True)
    ref = _reference(x, s, b, w, heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
