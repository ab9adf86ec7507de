"""Numerical parity vs. the reference PyTorch implementation.

These tests import the READ-ONLY reference repo (if present) purely as a test
oracle: build a tiny torch model, convert its weights through the torch bridge,
and require the flax forward pass to match.  Skipped when the reference or torch
is unavailable (e.g. in a user deployment).
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):
    pytest.skip("reference repo not available", allow_module_level=True)
sys.path.insert(0, REFERENCE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from panopticdiffusionmodels_tpu.models import UViT, UViTT2I  # noqa: E402
from panopticdiffusionmodels_tpu.models.vae import AutoencoderKL  # noqa: E402
from panopticdiffusionmodels_tpu.utils.torch_bridge import (  # noqa: E402
    convert_autoencoder_kl,
    convert_uvit,
    convert_uvit_t2i,
)


def _to_numpy_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("num_classes", [-1, 5])
def test_uvit_forward_parity(num_classes):
    import libs.uvit as ref_uvit

    torch.manual_seed(0)
    cfg = dict(
        img_size=8, patch_size=2, in_chans=3, embed_dim=32, depth=4, num_heads=4,
        mlp_ratio=2.0, qkv_bias=False, mlp_time_embed=True, num_classes=num_classes,
    )
    tmodel = ref_uvit.UViT(**cfg).eval()

    x = torch.randn(2, 3, 8, 8)
    t = torch.tensor([10.0, 500.0])
    y = torch.tensor([1, 4]) if num_classes > 0 else None
    with torch.no_grad():
        ref_out = tmodel(x, t, y) if y is not None else tmodel(x, t)

    params = convert_uvit(
        _to_numpy_sd(tmodel), depth=4, mlp_time_embed=True, num_classes=num_classes
    )
    jmodel = UViT(
        img_size=8, patch_size=2, in_chans=3, embed_dim=32, depth=4, num_heads=4,
        mlp_ratio=2.0, mlp_time_embed=True, num_classes=num_classes, attn_impl="xla",
    )
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    tj = jnp.asarray(t.numpy())
    yj = jnp.asarray(y.numpy()) if y is not None else None
    out = jmodel.apply(params, xj, tj, yj) if yj is not None else jmodel.apply(params, xj, tj)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-4, atol=1e-5
    )


def test_uvit_t2i_panoptic_forward_parity():
    """Full dual-stream parity (mask at image resolution, where the reference
    snapshot is self-consistent; see SURVEY.md §2.3 on patch_factor)."""
    import libs.uvit_t2i as ref_t2i

    torch.manual_seed(0)
    depth = 4
    tmodel = ref_t2i.UViT(
        img_size=8, patch_size=2, in_chans=4, embed_dim=32, depth=depth, num_heads=4,
        mlp_ratio=2.0, qkv_bias=False, mlp_time_embed=False, clip_dim=16,
        num_clip_token=7, num_panoptic_class=8, enable_panoptic=True,
        use_ground_truth=False, separate=True,
    ).eval()
    # give the zero convs non-zero weights so the coupling path is exercised
    with torch.no_grad():
        for zc in tmodel.zero_convs:
            zc.conv.weight.normal_(0, 0.02)
            zc.conv.bias.normal_(0, 0.02)

    x = torch.randn(2, 4, 8, 8)
    t = torch.tensor([10.0, 900.0])
    ctx = torch.randn(2, 7, 16)
    mask = torch.randn(2, 8, 8, 8)  # (B, bits, H, W) in torch layout
    with torch.no_grad():
        ref_noise, ref_mask = tmodel(
            x, t, ctx, mask_token=mask, use_ground_truth=False, enable_panoptic=True
        )

    params = convert_uvit_t2i(_to_numpy_sd(tmodel), depth=depth)
    jmodel = UViTT2I(
        img_size=8, patch_size=2, in_chans=4, embed_dim=32, depth=depth, num_heads=4,
        mlp_ratio=2.0, clip_dim=16, num_clip_token=7, mask_bits=8, mask_size=8,
        enable_panoptic=True, separate=True, attn_impl="xla",
    )
    noise, mask_pred = jmodel.apply(
        params,
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()),
        mask_token=jnp.asarray(mask.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(noise).transpose(0, 3, 1, 2), ref_noise.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mask_pred).transpose(0, 3, 1, 2), ref_mask.numpy(), rtol=1e-4, atol=1e-5
    )


def test_uvit_scan_bridge_parity():
    """torch weights -> stacked scan layout must match the torch forward too."""
    import libs.uvit as ref_uvit

    torch.manual_seed(1)
    tmodel = ref_uvit.UViT(
        img_size=8, patch_size=2, in_chans=3, embed_dim=32, depth=6, num_heads=4,
        mlp_ratio=2.0, num_classes=-1,
    ).eval()
    x = torch.randn(2, 3, 8, 8)
    t = torch.tensor([5.0, 100.0])
    with torch.no_grad():
        ref_out = tmodel(x, t)
    params = convert_uvit(_to_numpy_sd(tmodel), depth=6, scan_blocks=True)
    jmodel = UViT(
        img_size=8, patch_size=2, in_chans=3, embed_dim=32, depth=6, num_heads=4,
        mlp_ratio=2.0, scan_blocks=True, attn_impl="xla",
    )
    out = jmodel.apply(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), jnp.asarray(t.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-4, atol=1e-5
    )


def test_uvit_t2i_scan_bridge_parity():
    import libs.uvit_t2i as ref_t2i

    torch.manual_seed(2)
    depth = 4
    tmodel = ref_t2i.UViT(
        img_size=8, patch_size=2, in_chans=4, embed_dim=32, depth=depth, num_heads=4,
        mlp_ratio=2.0, mlp_time_embed=False, clip_dim=16, num_clip_token=7,
        num_panoptic_class=8, enable_panoptic=True, separate=True,
    ).eval()
    with torch.no_grad():
        for zc in tmodel.zero_convs:
            zc.conv.weight.normal_(0, 0.02)
            zc.conv.bias.normal_(0, 0.02)
    x = torch.randn(2, 4, 8, 8)
    t = torch.tensor([10.0, 900.0])
    ctx = torch.randn(2, 7, 16)
    mask = torch.randn(2, 8, 8, 8)
    with torch.no_grad():
        ref_noise, ref_mask = tmodel(
            x, t, ctx, mask_token=mask, use_ground_truth=False, enable_panoptic=True
        )
    params = convert_uvit_t2i(_to_numpy_sd(tmodel), depth=depth, scan_blocks=True)
    jmodel = UViTT2I(
        img_size=8, patch_size=2, in_chans=4, embed_dim=32, depth=depth, num_heads=4,
        mlp_ratio=2.0, clip_dim=16, num_clip_token=7, mask_bits=8, mask_size=8,
        enable_panoptic=True, separate=True, scan_blocks=True, attn_impl="xla",
    )
    noise, mask_pred = jmodel.apply(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()),
        mask_token=jnp.asarray(mask.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(noise).transpose(0, 3, 1, 2), ref_noise.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mask_pred).transpose(0, 3, 1, 2), ref_mask.numpy(), rtol=1e-4, atol=1e-5
    )


def test_autoencoder_parity():
    import libs.autoencoder as ref_ae

    torch.manual_seed(0)
    ddconfig = dict(
        double_z=True, z_channels=4, resolution=16, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0,
    )
    enc = ref_ae.Encoder(**ddconfig).eval()
    dec = ref_ae.Decoder(**ddconfig).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)

    sd = {}
    sd.update({f"encoder.{k}": v.detach().numpy() for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v.detach().numpy() for k, v in dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v.detach().numpy() for k, v in quant.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v.detach().numpy() for k, v in post_quant.state_dict().items()})

    x = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        moments_ref = quant(enc(x))
        z = torch.randn(1, 4, 8, 8)
        dec_ref = dec(post_quant(z))

    params = convert_autoencoder_kl(sd, ch_mult=(1, 2), num_res_blocks=1)
    jvae = AutoencoderKL(
        ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4, embed_dim=4,
        out_ch=3, scale_factor=1.0,
    )
    moments = jvae.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), method="encode_moments")
    np.testing.assert_allclose(
        np.asarray(moments).transpose(0, 3, 1, 2), moments_ref.numpy(), rtol=1e-4, atol=1e-4
    )
    dec_out = jvae.apply(
        params, jnp.asarray(z.numpy().transpose(0, 2, 3, 1)) * 1.0, method="decode"
    )
    np.testing.assert_allclose(
        np.asarray(dec_out).transpose(0, 3, 1, 2), dec_ref.numpy(), rtol=1e-4, atol=1e-4
    )
