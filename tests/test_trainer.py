import os

import jax
import numpy as np
import pytest

from panopticdiffusionmodels_tpu.configs import get_config
from panopticdiffusionmodels_tpu.train.trainer import Trainer, infer_task


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    config = get_config("synthetic_tiny")
    wd = str(tmp_path_factory.mktemp("run"))
    return Trainer(config, wd)


def test_infer_task():
    assert infer_task(get_config("cifar10_uvit_small")) == "pixel_sde"
    assert infer_task(get_config("mscoco_uvit_small")) == "t2i_discrete"
    # every zoo config declares its task explicitly; latent inference is refused
    assert get_config("imagenet256_uvit_large").task == "latent_discrete"
    import pytest
    with pytest.raises(ValueError, match="ambiguous latent config"):
        infer_task(get_config("imagenet256_uvit_large"))


def test_fit_smoke(tiny_trainer):
    metrics = tiny_trainer.fit(max_steps=10)
    assert int(tiny_trainer.state.step) == 10
    assert metrics, "no metrics logged"
    for m in metrics:
        assert np.isfinite(m["loss"]) and np.isfinite(m["loss_mask"])


def test_fit_with_bf16_transfer(tmp_path):
    """train.transfer_dtype='bfloat16' casts f32 batch fields on host before
    the device copy; training must run and int fields stay untouched."""
    config = get_config("synthetic_tiny")
    config.train.transfer_dtype = "bfloat16"
    trainer = Trainer(config, str(tmp_path))
    batch = next(trainer.data_stream())
    import jax.numpy as jnp

    assert batch[0].dtype == jnp.bfloat16  # moments
    assert batch[1].dtype == jnp.bfloat16  # context
    # panoptic ids ship at their natural width (8-bit analog-bits codec)
    assert batch[2].dtype == jnp.uint8
    metrics = trainer.fit(max_steps=4)
    assert all(np.isfinite(m["loss"]) for m in metrics)

    # opt-out restores the int32 feed
    config.train.transfer_mask_uint8 = False
    trainer2 = Trainer(config, str(tmp_path / "wide"))
    batch2 = next(trainer2.data_stream())
    assert batch2[2].dtype == jnp.int32


def test_data_stream_resumes_at_step(tmp_path):
    """data_stream(start_step=k) yields batch k of the step-0 stream — fit()
    wires the resumed state.step in, so an interrupted run consumes the same
    batch sequence the uninterrupted run would have."""
    config = get_config("synthetic_tiny")
    trainer = Trainer(config, str(tmp_path))
    s0 = trainer.data_stream()
    want = [jax.tree.map(np.asarray, next(s0)) for _ in range(5)]
    s3 = trainer.data_stream(start_step=3)
    got = jax.tree.map(np.asarray, next(s3))
    for a, b in zip(got, want[3]):
        np.testing.assert_array_equal(a, b)


def test_loss_decreases_on_tiny_overfit(tmp_path):
    config = get_config("synthetic_tiny")
    config.dataset.n = 16
    config.train.batch_size = 16
    config.optimizer.lr = 1e-3
    config.lr_scheduler.warmup_steps = 1
    trainer = Trainer(config, str(tmp_path))
    metrics = trainer.fit(max_steps=60)
    first = np.mean([m["loss"] + m["loss_mask"] for m in metrics[:3]])
    last = np.mean([m["loss"] + m["loss_mask"] for m in metrics[-3:]])
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_sample_fn_shapes(tiny_trainer):
    sample_fn = jax.jit(tiny_trainer.build_sample_fn(sample_steps=6))
    key = jax.random.PRNGKey(0)
    ctx = jax.numpy.zeros((4, 7, 16))
    x, pred_mask = sample_fn(*tiny_trainer.sample_weights(), key, ctx)
    assert x.shape == (4, 8, 8, 4)  # no VAE weights -> stays in latent space
    assert pred_mask.shape == (4, 16, 16, 8)
    assert bool(jax.numpy.isfinite(x).all())


def test_sampling_batch_is_deterministic_given_key(tiny_trainer):
    sample_fn = jax.jit(tiny_trainer.build_sample_fn(sample_steps=6))
    key = jax.random.PRNGKey(3)
    ctx = jax.numpy.zeros((2, 7, 16))
    w = tiny_trainer.sample_weights()
    x1, m1 = sample_fn(*w, key, ctx)
    x2, m2 = sample_fn(*w, key, ctx)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_ground_truth_mask_sampling(tmp_path):
    """nnet.use_ground_truth: the sampler conditions on (and echoes) the GT
    mask instead of integrating a mask trajectory (reference
    train_t2i_discrete.py:491-494,539)."""
    from panopticdiffusionmodels_tpu.configs import get_config
    from panopticdiffusionmodels_tpu.train.trainer import Trainer
    from panopticdiffusionmodels_tpu.diffusion.analog_bits import ints_to_analog

    config = get_config("synthetic_tiny")
    config.nnet.use_ground_truth = True
    trainer = Trainer(config, str(tmp_path))
    sample_fn = jax.jit(trainer.build_sample_fn(sample_steps=6))
    panoptic = jax.numpy.asarray(
        np.random.default_rng(0).integers(0, 201, (2, 16, 16, 1))
    )
    x, pred_mask = sample_fn(
        *trainer.sample_weights(), jax.random.PRNGKey(0),
        jax.numpy.zeros((2, 7, 16)), panoptic
    )
    assert x.shape == (2, 8, 8, 4)
    # GT mode echoes the analog-encoded ground truth exactly
    expected = np.asarray(ints_to_analog(panoptic))
    np.testing.assert_allclose(np.asarray(pred_mask), expected, atol=1e-6)
