import jax
import jax.numpy as jnp
import numpy as np

from panopticdiffusionmodels_tpu.models import UViT, get_nnet
from panopticdiffusionmodels_tpu.models.layers import (
    patchify,
    timestep_embedding,
    unpatchify,
)


def test_patchify_roundtrip(rng):
    x = jax.random.normal(rng, (2, 16, 16, 3))
    p = patchify(x, 4)
    assert p.shape == (2, 16, 48)
    back = unpatchify(p, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_timestep_embedding_properties():
    t = jnp.array([0.0, 10.0, 999.0])
    emb = timestep_embedding(t, 64)
    assert emb.shape == (3, 64)
    # t=0: cos part all ones, sin part all zeros
    np.testing.assert_allclose(np.asarray(emb[0, :32]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 32:]), 0.0, atol=1e-6)
    # odd dim padding
    emb_odd = timestep_embedding(t, 63)
    assert emb_odd.shape == (3, 63)


def _tiny_uvit(**kw):
    cfg = dict(
        img_size=8,
        patch_size=2,
        in_chans=3,
        embed_dim=32,
        depth=4,
        num_heads=4,
        mlp_ratio=2.0,
        attn_impl="xla",
    )
    cfg.update(kw)
    return UViT(**cfg)


def test_uvit_uncond_forward(rng):
    model = _tiny_uvit()
    x = jax.random.normal(rng, (2, 8, 8, 3))
    t = jnp.array([10.0, 500.0])
    params = model.init(rng, x, t)
    out = jax.jit(model.apply)(params, x, t)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_uvit_class_cond_forward(rng):
    model = _tiny_uvit(num_classes=11)
    x = jax.random.normal(rng, (2, 8, 8, 3))
    t = jnp.array([10.0, 500.0])
    y = jnp.array([3, 10])
    params = model.init(rng, x, t, y)
    out = model.apply(params, x, t, y)
    assert out.shape == x.shape
    # different labels give different outputs
    out2 = model.apply(params, x, t, jnp.array([4, 10]))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_uvit_gelu_approx(rng):
    """gelu_approx=True (tanh) must share the parameter tree with the exact
    erf model and produce close-but-not-identical outputs (|gelu error| <=
    3e-4 per activation; the knob changes math, not shapes)."""
    x = jax.random.normal(rng, (2, 8, 8, 3))
    t = jnp.array([10.0, 500.0])
    m_erf = _tiny_uvit()
    m_tanh = _tiny_uvit(gelu_approx=True)
    params = m_erf.init(rng, x, t)
    o_erf = np.asarray(m_erf.apply(params, x, t), np.float32)
    o_tanh = np.asarray(m_tanh.apply(params, x, t), np.float32)
    assert not np.array_equal(o_erf, o_tanh)
    rel = np.linalg.norm(o_erf - o_tanh) / np.linalg.norm(o_erf)
    assert rel < 5e-3, rel
    # scanned stack honors the knob too
    m_scan = _tiny_uvit(gelu_approx=True, scan_blocks=True)
    params_s = m_scan.init(rng, x, t)
    out_s = m_scan.apply(params_s, x, t)
    assert bool(jnp.all(jnp.isfinite(out_s)))


def test_uvit_no_conv_head(rng):
    model = _tiny_uvit(conv=False)
    x = jax.random.normal(rng, (1, 8, 8, 3))
    params = model.init(rng, x, jnp.ones((1,)))
    out = model.apply(params, x, jnp.ones((1,)))
    assert out.shape == x.shape


def test_uvit_remat_matches(rng):
    x = jax.random.normal(rng, (1, 8, 8, 3))
    t = jnp.ones((1,))
    m1 = _tiny_uvit(use_checkpoint=False)
    m2 = _tiny_uvit(use_checkpoint=True)
    params = m1.init(rng, x, t)
    np.testing.assert_allclose(
        np.asarray(m1.apply(params, x, t)),
        np.asarray(m2.apply(params, x, t)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_factory():
    m = get_nnet("uvit", img_size=8, patch_size=2, embed_dim=16, depth=2, num_heads=2)
    assert isinstance(m, UViT)


def test_uvit_skip_connections_matter(rng):
    """Long skips change the function: with skip=False out_blocks ignore skips."""
    x = jax.random.normal(rng, (1, 8, 8, 3))
    t = jnp.ones((1,))
    m_skip = _tiny_uvit(skip=True)
    m_noskip = _tiny_uvit(skip=False)
    p1 = m_skip.init(rng, x, t)
    p2 = m_noskip.init(rng, x, t)
    n1 = sum(a.size for a in jax.tree.leaves(p1))
    n2 = sum(a.size for a in jax.tree.leaves(p2))
    assert n1 > n2  # skip_linear params present
