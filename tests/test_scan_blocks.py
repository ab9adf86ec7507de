"""Scanned block stacks must be numerically identical to the unrolled loop
given the same (stacked) parameters."""
import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticdiffusionmodels_tpu.models import UViT, UViTT2I


def _stack_uvit_params(params, depth):
    """Per-layer loop params -> scan layout (leading 'layers' axis)."""
    flat = tu.flatten_dict(params["params"])
    out = {}
    half = depth // 2
    for k, v in flat.items():
        name = k[0]
        if name.startswith("in_blocks_") or name.startswith("out_blocks_"):
            continue
        out[k] = v
    for prefix in ("in_blocks", "out_blocks"):
        sample = {kk: v for kk, v in flat.items() if kk[0] == f"{prefix}_0"}
        for kk in sample:
            stacked = np.stack(
                [flat[(f"{prefix}_{i}",) + kk[1:]] for i in range(half)]
            )
            out[(prefix, "block") + kk[1:]] = jnp.asarray(stacked)
    return {"params": tu.unflatten_dict(out)}


def test_uvit_scan_matches_loop(rng):
    depth = 4
    kw = dict(
        img_size=8, patch_size=2, in_chans=3, embed_dim=32, depth=depth,
        num_heads=4, mlp_ratio=2.0, attn_impl="xla",
    )
    loop_model = UViT(**kw, scan_blocks=False)
    scan_model = UViT(**kw, scan_blocks=True)
    x = jax.random.normal(rng, (2, 8, 8, 3))
    t = jnp.array([10.0, 400.0])
    params = loop_model.init(rng, x, t)
    ref = loop_model.apply(params, x, t)
    scan_params = _stack_uvit_params(params, depth)
    got = scan_model.apply(scan_params, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-6)


def _stack_t2i_params(params, depth):
    flat = tu.flatten_dict(params["params"])
    out = {}
    half = depth // 2
    for k, v in flat.items():
        name = k[0]
        if (
            name.startswith("in_blocks_")
            or name.startswith("out_blocks_")
            or name.startswith("zero_convs_in_")
            or name.startswith("zero_convs_out_")
        ):
            continue
        out[k] = v

    def stacked(fmt, suffix):
        return jnp.asarray(
            np.stack([flat[(fmt.format(i),) + suffix] for i in range(half)])
        )

    for phase, scan_name in (("in", "in_blocks_dual"), ("out", "out_blocks_dual")):
        img_keys = {
            kk[1:] for kk in flat if kk[0] == f"{phase}_blocks_0"
        }
        for suffix in img_keys:
            out[(scan_name, "block") + suffix] = stacked(phase + "_blocks_{}", suffix)
        mask_keys = {kk[1:] for kk in flat if kk[0] == f"{phase}_blocks_mask_0"}
        for suffix in mask_keys:
            out[(scan_name, "block_mask") + suffix] = stacked(
                phase + "_blocks_mask_{}", suffix
            )
        zc_keys = {kk[1:] for kk in flat if kk[0] == f"zero_convs_{phase}_0"}
        for suffix in zc_keys:
            out[(scan_name, "zero_conv") + suffix] = stacked(
                "zero_convs_" + phase + "_{}", suffix
            )
    return {"params": tu.unflatten_dict(out)}


def test_uvit_t2i_dual_scan_matches_loop(rng):
    depth = 4
    kw = dict(
        img_size=8, patch_size=2, in_chans=4, embed_dim=32, depth=depth,
        num_heads=4, mlp_ratio=2.0, clip_dim=16, num_clip_token=7, mask_bits=8,
        mask_size=8, separate=True, attn_impl="xla",
    )
    loop_model = UViTT2I(**kw, scan_blocks=False)
    scan_model = UViTT2I(**kw, scan_blocks=True)
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (2, 8, 8, 4))
    t = jnp.array([10.0, 900.0])
    ctx = jax.random.normal(ks[1], (2, 7, 16))
    mask = jax.random.normal(ks[2], (2, 8, 8, 8))
    params = loop_model.init(ks[3], x, t, ctx, mask_token=mask)
    # open the zero-conv gates so the coupling path is numerically exercised
    import flax.traverse_util as tu2

    flat = dict(tu2.flatten_dict(params["params"]))
    rng_np = np.random.default_rng(0)
    for k in flat:
        if k[0].startswith("zero_convs"):
            flat[k] = jnp.asarray(rng_np.normal(0, 0.02, flat[k].shape), jnp.float32)
    params = {"params": tu2.unflatten_dict(flat)}

    ref_noise, ref_mask = loop_model.apply(params, x, t, ctx, mask_token=mask)
    scan_params = _stack_t2i_params(params, depth)
    got_noise, got_mask = scan_model.apply(scan_params, x, t, ctx, mask_token=mask)
    np.testing.assert_allclose(np.asarray(got_noise), np.asarray(ref_noise), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_mask), np.asarray(ref_mask), rtol=2e-5, atol=1e-6)


def test_scan_init_and_grads(rng):
    """Scanned model initializes its own params and trains."""
    model = UViT(
        img_size=8, patch_size=2, in_chans=3, embed_dim=32, depth=6, num_heads=4,
        mlp_ratio=2.0, scan_blocks=True, use_checkpoint=True, attn_impl="xla",
    )
    x = jax.random.normal(rng, (2, 8, 8, 3))
    t = jnp.ones((2,))
    params = model.init(rng, x, t)
    # stacked leading dim
    k = params["params"]["in_blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert k.shape[0] == 3

    def loss(p):
        return jnp.mean(model.apply(p, x, t) ** 2)

    g = jax.grad(loss)(params)
    gk = g["params"]["out_blocks"]["block"]["skip_linear"]["kernel"]
    assert float(jnp.abs(gk).max()) > 0


def test_remat_policy_grads_match_default(rng):
    """remat_policy changes WHAT is saved for the backward pass, never the
    math: loss and gradients must match the default policy bitwise-closely."""
    def build(policy):
        return UViT(
            img_size=8, patch_size=2, in_chans=3, embed_dim=32, depth=6,
            num_heads=4, mlp_ratio=2.0, scan_blocks=True, use_checkpoint=True,
            attn_impl="xla", remat_policy=policy,
        )

    x = jax.random.normal(rng, (2, 8, 8, 3))
    t = jnp.ones((2,))
    ref_model = build(None)
    params = ref_model.init(rng, x, t)

    def loss(model, p):
        return jnp.mean(model.apply(p, x, t) ** 2)

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(ref_model, p))(params)
    for policy in ("dots", "dots_no_batch", "save_attn"):
        model = build(policy)
        l, g = jax.value_and_grad(lambda p: loss(model, p))(params)
        assert float(jnp.abs(l - l_ref)) < 1e-6
        flat_ref = jax.tree.leaves(g_ref)
        flat = jax.tree.leaves(g)
        for a, b in zip(flat, flat_ref):
            assert jnp.allclose(a, b, atol=1e-5), policy


def test_remat_policy_unknown_raises(rng):
    import pytest

    model = UViT(img_size=8, patch_size=2, in_chans=3, embed_dim=32, depth=4,
                 num_heads=4, scan_blocks=True, use_checkpoint=True,
                 attn_impl="xla", remat_policy="bogus")
    x = jax.random.normal(rng, (1, 8, 8, 3))
    with pytest.raises(ValueError):
        model.init(rng, x, jnp.ones((1,)))
