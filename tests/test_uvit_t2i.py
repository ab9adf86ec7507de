import jax
import jax.numpy as jnp
import numpy as np

from panopticdiffusionmodels_tpu.models import UViTT2I


def _tiny(**kw):
    cfg = dict(
        img_size=8,
        patch_size=2,
        in_chans=4,
        embed_dim=32,
        depth=4,
        num_heads=4,
        mlp_ratio=2.0,
        clip_dim=16,
        num_clip_token=7,
        mask_bits=8,
        mask_size=16,
        attn_impl="xla",
    )
    cfg.update(kw)
    return UViTT2I(**cfg)


def _inputs(rng, b=2, mask=True):
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (b, 8, 8, 4))
    t = jnp.full((b,), 100.0)
    ctx = jax.random.normal(ks[1], (b, 7, 16))
    m = jax.random.normal(ks[2], (b, 16, 16, 8)) if mask else None
    return x, t, ctx, m


def test_dual_stream_forward(rng):
    model = _tiny(separate=True)
    x, t, ctx, m = _inputs(rng)
    params = model.init(rng, x, t, ctx, mask_token=m)
    noise, mask_pred = jax.jit(model.apply)(params, x, t, ctx, mask_token=m)
    assert noise.shape == x.shape
    assert mask_pred.shape == m.shape
    # tanh head bounds the mask prediction
    assert float(jnp.max(jnp.abs(mask_pred))) <= 1.0


def test_single_stream_forward(rng):
    model = _tiny(separate=False)
    x, t, ctx, m = _inputs(rng)
    params = model.init(rng, x, t, ctx, mask_token=m)
    noise, mask_pred = model.apply(params, x, t, ctx, mask_token=m)
    assert noise.shape == x.shape and mask_pred.shape == m.shape


def test_no_mask_token_falls_back_to_t2i(rng):
    model = _tiny(separate=True)
    x, t, ctx, m = _inputs(rng)
    params = model.init(rng, x, t, ctx, mask_token=m)
    out = model.apply(params, x, t, ctx)  # no mask -> plain t2i forward
    assert out.shape == x.shape


def test_zeroconv_init_makes_mask_stream_inert(rng):
    """At init, zero-convs gate the mask stream off: the image output must be
    IDENTICAL whatever the mask input is (ControlNet property)."""
    model = _tiny(separate=True)
    x, t, ctx, m = _inputs(rng)
    params = model.init(rng, x, t, ctx, mask_token=m)
    n1, _ = model.apply(params, x, t, ctx, mask_token=m)
    m2 = m * -3.0 + 1.7
    n2, _ = model.apply(params, x, t, ctx, mask_token=m2)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-6)


def test_use_ground_truth_echoes_mask(rng):
    model = _tiny(separate=True)
    x, t, ctx, m = _inputs(rng)
    params = model.init(rng, x, t, ctx, mask_token=m)
    noise, mask_pred = model.apply(
        params, x, t, ctx, mask_token=m, use_ground_truth=True
    )
    assert noise.shape == x.shape
    np.testing.assert_array_equal(np.asarray(mask_pred), np.asarray(m))


def test_context_changes_output(rng):
    model = _tiny(separate=True)
    x, t, ctx, m = _inputs(rng)
    params = model.init(rng, x, t, ctx, mask_token=m)
    n1, _ = model.apply(params, x, t, ctx, mask_token=m)
    n2, _ = model.apply(params, x, t, ctx * 0.0, mask_token=m)
    assert not np.allclose(np.asarray(n1), np.asarray(n2))


def test_mask_patch_size_derivation():
    model = _tiny(mask_size=16)
    assert model.mask_patch_size == 4  # patch 2 * (16/8)
    model2 = _tiny(mask_size=8)
    assert model2.mask_patch_size == 2


def test_grads_flow_to_mask_stream(rng):
    model = _tiny(separate=True)
    x, t, ctx, m = _inputs(rng, b=1)
    params = model.init(rng, x, t, ctx, mask_token=m)

    def loss(p):
        noise, mask_pred = model.apply(p, x, t, ctx, mask_token=m)
        return jnp.mean(noise ** 2) + jnp.mean(mask_pred ** 2)

    g = jax.grad(loss)(params)
    gm = g["params"]["in_blocks_mask_0"]["attn"]["qkv"]["kernel"]
    assert float(jnp.abs(gm).max()) > 0.0
    gz = g["params"]["zero_convs_mid"]["conv"]["kernel"]
    assert float(jnp.abs(gz).max()) > 0.0
