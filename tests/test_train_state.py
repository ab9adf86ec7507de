import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from panopticdiffusionmodels_tpu.train import (
    TrainState,
    create_train_state,
    latest_step,
    load_checkpoint,
    make_lr_schedule,
    make_optimizer,
    resume,
    save_checkpoint,
)
from panopticdiffusionmodels_tpu.train.state import frozen_mask_from_prefixes


def _params(rng):
    k1, k2 = jax.random.split(rng)
    return {
        "image_block": {"kernel": jax.random.normal(k1, (4, 4))},
        "mask_block": {"kernel": jax.random.normal(k2, (4, 4))},
    }


def test_lr_schedule_warmup():
    sched = make_lr_schedule(2e-4, "customized", warmup_steps=100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(50)), 1e-4)
    np.testing.assert_allclose(float(sched(100)), 2e-4)
    np.testing.assert_allclose(float(sched(10_000)), 2e-4)


def test_train_step_and_ema(rng):
    params = _params(rng)
    tx = make_optimizer(lr=0.1, weight_decay=0.0, betas=(0.9, 0.999))
    state = create_train_state(params, tx)

    grads = jax.tree.map(jnp.ones_like, params)
    new_state = state.apply_gradients(grads, ema_rate=0.5)
    assert int(new_state.step) == 1
    # params moved against the gradient
    assert float(jnp.sum(new_state.params["image_block"]["kernel"])) < float(
        jnp.sum(params["image_block"]["kernel"])
    )
    # EMA is halfway between old and new at rate 0.5
    expect = 0.5 * params["image_block"]["kernel"] + 0.5 * new_state.params["image_block"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(new_state.ema_params["image_block"]["kernel"]),
        np.asarray(expect),
        rtol=1e-6,
    )


def test_frozen_mask(rng):
    params = _params(rng)
    mask = frozen_mask_from_prefixes(params, ["image_block"])
    assert mask["image_block"]["kernel"] is True
    assert mask["mask_block"]["kernel"] is False

    tx = make_optimizer(lr=0.1, weight_decay=0.0, frozen_mask=mask)
    state = create_train_state(params, tx)
    grads = jax.tree.map(jnp.ones_like, params)
    new_state = state.apply_gradients(grads, ema_rate=0.0)
    np.testing.assert_array_equal(
        np.asarray(new_state.params["image_block"]["kernel"]),
        np.asarray(params["image_block"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(new_state.params["mask_block"]["kernel"]),
        np.asarray(params["mask_block"]["kernel"]),
    )


def test_checkpoint_roundtrip(rng, tmp_path):
    params = _params(rng)
    tx = make_optimizer(lr=0.1)
    state = create_train_state(params, tx)
    grads = jax.tree.map(jnp.ones_like, params)
    state = state.apply_gradients(grads)

    root = str(tmp_path / "ckpts")
    save_checkpoint(root, state)  # step 1
    state2 = state.apply_gradients(grads)  # step 2
    save_checkpoint(root, state2)
    assert latest_step(root) == 2

    fresh = create_train_state(_params(jax.random.PRNGKey(9)), tx)
    restored, ok = resume(root, fresh)
    assert ok and int(restored.step) == 2
    np.testing.assert_allclose(
        np.asarray(restored.params["mask_block"]["kernel"]),
        np.asarray(state2.params["mask_block"]["kernel"]),
        rtol=1e-6,
    )


def test_async_save_then_immediate_resume(rng, tmp_path):
    """block=False returns before the directory commit; any subsequent read
    (latest_step/load) must wait for the in-flight write, so a resume issued
    right after an async save sees it."""
    from panopticdiffusionmodels_tpu.train.checkpoint import wait_for_saves

    params = _params(rng)
    tx = make_optimizer(lr=0.1)
    state = create_train_state(params, tx)
    grads = jax.tree.map(jnp.ones_like, params)
    root = str(tmp_path / "ckpts")
    for _ in range(3):  # overlapping saves serialize inside orbax
        state = state.apply_gradients(grads)
        save_checkpoint(root, state, block=False)
    restored, ok = resume(root, create_train_state(_params(jax.random.PRNGKey(9)), tx))
    assert ok and int(restored.step) == 3
    np.testing.assert_allclose(
        np.asarray(restored.params["mask_block"]["kernel"]),
        np.asarray(state.params["mask_block"]["kernel"]),
        rtol=1e-6,
    )
    wait_for_saves()  # idempotent with nothing in flight


def test_resume_empty_dir(rng, tmp_path):
    params = _params(rng)
    state = create_train_state(params, make_optimizer())
    restored, ok = resume(str(tmp_path / "nonexistent"), state)
    assert not ok


def test_panoptic_image_stream_mask():
    from panopticdiffusionmodels_tpu.train.state import panoptic_image_stream_mask
    import jax.numpy as jnp

    params = {
        "patch_embed": {"proj": {"kernel": jnp.zeros(1)}},
        "mid_block": {"attn": {"qkv": {"kernel": jnp.zeros(1)}}},
        "mid_block_mask": {"attn": {"qkv": {"kernel": jnp.zeros(1)}}},
        "in_blocks_0": {"norm1": {"scale": jnp.zeros(1)}},
        "in_blocks_mask_0": {"norm1": {"scale": jnp.zeros(1)}},
        "zero_convs_mid": {"conv": {"kernel": jnp.zeros(1)}},
        "mask_embed": {"proj": {"kernel": jnp.zeros(1)}},
        "decoder_pred": {"kernel": jnp.zeros(1)},
        "in_blocks_dual": {
            "block": {"norm1": {"scale": jnp.zeros(1)}},
            "block_mask": {"norm1": {"scale": jnp.zeros(1)}},
            "zero_conv": {"conv": {"kernel": jnp.zeros(1)}},
        },
    }
    m = panoptic_image_stream_mask(params)
    assert m["patch_embed"]["proj"]["kernel"] is True
    assert m["mid_block"]["attn"]["qkv"]["kernel"] is True
    assert m["mid_block_mask"]["attn"]["qkv"]["kernel"] is False  # must train
    assert m["in_blocks_0"]["norm1"]["scale"] is True
    assert m["in_blocks_mask_0"]["norm1"]["scale"] is False
    assert m["zero_convs_mid"]["conv"]["kernel"] is False
    assert m["mask_embed"]["proj"]["kernel"] is False
    assert m["decoder_pred"]["kernel"] is False  # reference keeps it trainable
    assert m["in_blocks_dual"]["block"]["norm1"]["scale"] is True
    assert m["in_blocks_dual"]["block_mask"]["norm1"]["scale"] is False
    assert m["in_blocks_dual"]["zero_conv"]["conv"]["kernel"] is False
