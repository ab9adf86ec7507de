import jax
import jax.numpy as jnp
import numpy as np

from panopticdiffusionmodels_tpu.models import get_nnet
from panopticdiffusionmodels_tpu.models.unet import UNet2DCondition


def _tiny(**kw):
    cfg = dict(
        sample_size=8, in_chans=4, out_chans=4, model_channels=32,
        channel_mult=(1, 2), num_res_blocks=1, num_heads=4, clip_dim=16,
        enable_panoptic=True, mask_bits=8, mask_size=16,
    )
    cfg.update(kw)
    return UNet2DCondition(**cfg)


def _inputs(rng, b=2):
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (b, 8, 8, 4))
    t = jnp.full((b,), 500.0)
    ctx = jax.random.normal(ks[1], (b, 7, 16))
    m = jax.random.normal(ks[2], (b, 16, 16, 8))
    return x, t, ctx, m


def test_unet_panoptic_forward(rng):
    model = _tiny()
    x, t, ctx, m = _inputs(rng)
    params = model.init(rng, x, t, ctx, mask_token=m)
    noise, mask_pred = jax.jit(model.apply)(params, x, t, ctx, mask_token=m)
    assert noise.shape == x.shape
    assert mask_pred.shape == m.shape
    assert float(jnp.max(jnp.abs(mask_pred))) <= 1.0
    assert bool(jnp.isfinite(noise).all())


def test_unet_zero_gate_inert_at_init(rng):
    """ControlNet property: at init the mask input must not change the image
    output (the pretrained UNet behaves exactly as before)."""
    model = _tiny()
    x, t, ctx, m = _inputs(rng)
    params = model.init(rng, x, t, ctx, mask_token=m)
    n1, _ = model.apply(params, x, t, ctx, mask_token=m)
    n2, _ = model.apply(params, x, t, ctx, mask_token=m * -2.0 + 0.3)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-6)


def test_unet_no_mask_plain_t2i(rng):
    model = _tiny()
    x, t, ctx, m = _inputs(rng)
    params = model.init(rng, x, t, ctx, mask_token=m)
    out = model.apply(params, x, t, ctx)
    assert out.shape == x.shape


def test_unet_ground_truth_mode(rng):
    model = _tiny()
    x, t, ctx, m = _inputs(rng)
    params = model.init(rng, x, t, ctx, mask_token=m)
    noise, mask_pred = model.apply(params, x, t, ctx, mask_token=m,
                                   use_ground_truth=True)
    np.testing.assert_array_equal(np.asarray(mask_pred), np.asarray(m))


def test_unet_context_changes_output(rng):
    model = _tiny()
    x, t, ctx, m = _inputs(rng)
    params = model.init(rng, x, t, ctx, mask_token=m)
    n1, _ = model.apply(params, x, t, ctx, mask_token=m)
    n2, _ = model.apply(params, x, t, ctx * 0.0 + 1.0, mask_token=m)
    assert not np.allclose(np.asarray(n1), np.asarray(n2))


def test_unet_grads_flow_everywhere(rng):
    model = _tiny()
    x, t, ctx, m = _inputs(rng, b=1)
    params = model.init(rng, x, t, ctx, mask_token=m)

    def loss(p):
        noise, mask_pred = model.apply(p, x, t, ctx, mask_token=m)
        return jnp.mean(noise ** 2) + jnp.mean(mask_pred ** 2)

    g = jax.grad(loss)(params)["params"]
    assert float(jnp.abs(g["mask_zero_gate"]["kernel"]).max()) > 0
    assert float(jnp.abs(g["mid_attn"]["block_0"]["attn2"]["to_k"]["kernel"]).max()) > 0
    assert float(jnp.abs(g["mask_out"]["kernel"]).max()) > 0


def test_unet_factory():
    m = get_nnet("unet_t2i", sample_size=8, model_channels=32,
                 channel_mult=(1, 2), num_res_blocks=1, num_heads=4, clip_dim=16)
    assert isinstance(m, UNet2DCondition)


def test_unet_trainer_end_to_end(tmp_path):
    """The unet_t2i family drives the same engine: train a few steps + sample."""
    from panopticdiffusionmodels_tpu.configs import get_config
    from panopticdiffusionmodels_tpu.configs.base import d
    from panopticdiffusionmodels_tpu.train.trainer import Trainer

    config = get_config("mscoco_unet")
    config.compute_dtype = "float32"
    config.z_shape = (8, 8, 4)
    config.nnet.update(dict(sample_size=8, model_channels=32, channel_mult=[1, 2],
                            num_res_blocks=1, num_heads=4, clip_dim=16,
                            num_clip_token=7, mask_size=16))
    config.dataset = d(name="synthetic", style="coco", n=32, z_shape=(8, 8, 8),
                       clip_shape=(7, 16), mask_size=16)
    config.train.batch_size = 8
    config.train.log_interval = 1
    config.lr_scheduler.warmup_steps = 2
    trainer = Trainer(config, str(tmp_path))
    assert trainer.task == "t2i_discrete"
    metrics = trainer.fit(max_steps=3)
    assert all(np.isfinite(m["loss"]) and np.isfinite(m["loss_mask"]) for m in metrics)

    sample_fn = jax.jit(trainer.build_sample_fn(sample_steps=6))
    x, pred_mask = sample_fn(*trainer.sample_weights(), jax.random.PRNGKey(0),
                             jnp.zeros((2, 7, 16)))
    assert x.shape == (2, 8, 8, 4)
    assert pred_mask.shape == (2, 16, 16, 8)
