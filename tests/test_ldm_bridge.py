"""LDM checkpoint -> flax UNet converter: the fake state dict below enumerates
the CANONICAL CompVis-LDM key layout (independently of the converter's tables),
so a key/shape/transpose mismatch in either direction fails loudly."""
import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np

from panopticdiffusionmodels_tpu.models.unet import UNet2DCondition
from panopticdiffusionmodels_tpu.utils.ldm_bridge import convert_ldm_unet

M = 32          # model_channels
MULT = (1, 2)
CTX = 16
RES = 1         # num_res_blocks


def _fake_ldm_sd(rng):
    sd = {}

    def conv(name, o, i, k=3):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32)

    def lin(name, o, i, bias=True):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32)

    def gn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(c,)).astype(np.float32)

    def resblock(prefix, cin, cout):
        gn(f"{prefix}.in_layers.0", cin)
        conv(f"{prefix}.in_layers.2", cout, cin)
        lin(f"{prefix}.emb_layers.1", cout, 4 * M)
        gn(f"{prefix}.out_layers.0", cout)
        conv(f"{prefix}.out_layers.3", cout, cout)
        if cin != cout:
            conv(f"{prefix}.skip_connection", cout, cin, k=1)

    def transformer(prefix, c):
        gn(f"{prefix}.norm", c)
        conv(f"{prefix}.proj_in", c, c, k=1)
        conv(f"{prefix}.proj_out", c, c, k=1)
        tb = f"{prefix}.transformer_blocks.0"
        for n in ("norm1", "norm2", "norm3"):
            gn(f"{tb}.{n}", c)
        lin(f"{tb}.attn1.to_q", c, c, bias=False)
        lin(f"{tb}.attn1.to_k", c, c, bias=False)
        lin(f"{tb}.attn1.to_v", c, c, bias=False)
        lin(f"{tb}.attn1.to_out.0", c, c)
        lin(f"{tb}.attn2.to_q", c, c, bias=False)
        lin(f"{tb}.attn2.to_k", c, CTX, bias=False)
        lin(f"{tb}.attn2.to_v", c, CTX, bias=False)
        lin(f"{tb}.attn2.to_out.0", c, c)
        lin(f"{tb}.ff.net.0.proj", 8 * c, c)
        lin(f"{tb}.ff.net.2", c, 4 * c)

    # canonical LDM layout for mult (1,2), res 1, attention at level 0 (+mid)
    lin("time_embed.0", 4 * M, M)
    lin("time_embed.2", 4 * M, 4 * M)
    conv("input_blocks.0.0", M, 4)
    resblock("input_blocks.1.0", M, M)
    transformer("input_blocks.1.1", M)
    conv("input_blocks.2.0.op", M, M)            # downsample level 0
    resblock("input_blocks.3.0", M, 2 * M)       # level 1, no attn
    resblock("middle_block.0", 2 * M, 2 * M)
    transformer("middle_block.1", 2 * M)
    resblock("middle_block.2", 2 * M, 2 * M)
    # up path: level 1 first (2 res blocks), then upsample at .1 (no attn)
    resblock("output_blocks.0.0", 2 * M + 2 * M, 2 * M)
    resblock("output_blocks.1.0", 2 * M + M, 2 * M)
    conv("output_blocks.1.1.conv", 2 * M, 2 * M)  # upsample
    # level 0 (attn present)
    resblock("output_blocks.2.0", 2 * M + M, M)
    transformer("output_blocks.2.1", M)
    resblock("output_blocks.3.0", M + M, M)
    transformer("output_blocks.3.1", M)
    gn("out.0", M)
    conv("out.2", 4, M)
    return sd


def _model():
    return UNet2DCondition(
        sample_size=8, in_chans=4, out_chans=4, model_channels=M,
        channel_mult=MULT, num_res_blocks=RES, num_heads=4, clip_dim=CTX,
        enable_panoptic=True, mask_bits=8, mask_size=16,
    )


def test_ldm_conversion_shapes_and_apply(rng):
    np_rng = np.random.default_rng(0)
    sd = {f"model.diffusion_model.{k}": v for k, v in _fake_ldm_sd(np_rng).items()}
    converted = convert_ldm_unet(sd, channel_mult=MULT, num_res_blocks=RES)

    model = _model()
    x = jax.random.normal(rng, (1, 8, 8, 4))
    t = jnp.ones((1,))
    ctx = jax.random.normal(rng, (1, 7, CTX))
    m = jax.random.normal(rng, (1, 16, 16, 8))
    params = model.init(rng, x, t, ctx, mask_token=m)

    # every converted leaf must exist in the model with the same shape
    flat_model = tu.flatten_dict(params["params"])
    flat_conv = tu.flatten_dict(converted["params"])
    for key, val in flat_conv.items():
        assert key in flat_model, f"converter produced unknown param {key}"
        assert flat_model[key].shape == np.shape(val), (
            f"{key}: {flat_model[key].shape} vs {np.shape(val)}"
        )
    # image-stream coverage: everything except the mask stream is converted
    missing = {
        k for k in flat_model
        if k not in flat_conv and not str(k[0]).startswith(("mask_", "context_proj"))
    }
    assert not missing, f"unconverted image-stream params: {missing}"

    # transpose direction spot check: conv_in kernel is OIHW -> HWIO
    src = sd["model.diffusion_model.input_blocks.0.0.weight"]
    np.testing.assert_array_equal(
        np.asarray(flat_conv[("conv_in", "kernel")]), src.transpose(2, 3, 1, 0)
    )

    # merged params run end to end and the zero gate still protects the
    # pretrained image behavior
    from panopticdiffusionmodels_tpu.train.trainer import _merge_params

    merged = _merge_params(params, converted)
    n1, mp = model.apply(merged, x, t, ctx, mask_token=m)
    n2, _ = model.apply(merged, x, t, ctx, mask_token=m * -3.0)
    assert n1.shape == x.shape and mp.shape == m.shape
    assert bool(jnp.isfinite(n1).all())
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-5)
