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
