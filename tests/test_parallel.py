import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from panopticdiffusionmodels_tpu.parallel import (
    apply_sharding,
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_params_rules,
)
from panopticdiffusionmodels_tpu.parallel.mesh import local_batch_size


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["dp"] == 8 and mesh.shape["fsdp"] == 1 and mesh.shape["tp"] == 1
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    assert mesh.shape == {"pp": 1, "dp": 2, "fsdp": 2, "sp": 1, "tp": 2}
    with pytest.raises(AssertionError):
        make_mesh(dp=3, fsdp=2, tp=2)  # 12 > 8 devices
    # sub-meshes over fewer devices are allowed
    assert make_mesh(dp=1).shape == {
        "pp": 1, "dp": 1, "fsdp": 1, "sp": 1, "tp": 1,
    }
    assert make_mesh(dp=2, sp=2, tp=2).shape == {
        "pp": 1, "dp": 2, "fsdp": 1, "sp": 2, "tp": 2,
    }
    assert make_mesh(pp=2, dp=2, fsdp=2).shape == {
        "pp": 2, "dp": 2, "fsdp": 2, "sp": 1, "tp": 1,
    }


def test_batch_sharding_dp(rng):
    mesh = make_mesh(dp=8)
    x = jax.random.normal(rng, (16, 4, 4, 3))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (2, 4, 4, 3)
    # global mean across shards == local mean of all data
    np.testing.assert_allclose(float(jnp.mean(xs)), float(jnp.mean(x)), rtol=1e-5, atol=1e-7)


def test_local_batch_size():
    mesh = make_mesh(dp=4, fsdp=2)
    assert local_batch_size(32, mesh) == 4
    with pytest.raises(AssertionError):
        local_batch_size(30, mesh)


def test_tp_sharding_rules():
    mesh = make_mesh(dp=2, tp=4)
    params = {
        "block": {
            "attn": {
                "qkv": {"kernel": jnp.zeros((64, 192))},
                "proj": {"kernel": jnp.zeros((64, 64))},
            },
            "mlp": {
                "fc1": {"kernel": jnp.zeros((64, 256)), "bias": jnp.zeros((256,))},
                "fc2": {"kernel": jnp.zeros((256, 64))},
            },
        },
        "pos_embed": jnp.zeros((1, 17, 64)),
    }
    rules = shard_params_rules(params, mesh)
    assert rules["block"]["attn"]["qkv"]["kernel"].spec == P(None, "tp")
    assert rules["block"]["attn"]["proj"]["kernel"].spec == P("tp")
    assert rules["block"]["mlp"]["fc1"]["kernel"].spec == P(None, "tp")
    assert rules["block"]["mlp"]["fc2"]["kernel"].spec == P("tp")
    # small tensors replicated
    assert rules["block"]["mlp"]["fc1"]["bias"].spec == P()


def test_fsdp_sharding_rules():
    mesh = make_mesh(dp=1, fsdp=8)
    params = {"big": {"kernel": jnp.zeros((1024, 512))}, "small": jnp.zeros((17,))}
    rules = shard_params_rules(params, mesh)
    assert rules["big"]["kernel"].spec == P("fsdp")
    assert rules["small"].spec == P()
    sharded = apply_sharding(params, rules)
    assert sharded["big"]["kernel"].addressable_shards[0].data.shape == (128, 512)


def test_sharded_matmul_correctness(rng):
    """A tp-sharded matmul must give the same result as the replicated one —
    XLA inserts the collectives."""
    mesh = make_mesh(dp=1, tp=8)
    x = jax.random.normal(rng, (4, 64))
    w1 = jax.random.normal(jax.random.fold_in(rng, 1), (64, 256))
    w2 = jax.random.normal(jax.random.fold_in(rng, 2), (256, 64))
    expected = (x @ w1) @ w2

    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "tp")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P("tp")))
    xr = jax.device_put(x, replicated_sharding(mesh))

    @jax.jit
    def f(x, a, b):
        return (x @ a) @ b

    got = f(xr, w1s, w2s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-4)


def test_unet_tp_rules():
    mesh = make_mesh(dp=2, tp=4)
    params = {
        "mid_attn": {"block_0": {
            "attn1": {"to_q": {"kernel": jnp.zeros((64, 64))},
                      "to_out": {"kernel": jnp.zeros((64, 64))}},
            "ff_proj": {"kernel": jnp.zeros((64, 512))},
            "ff_out": {"kernel": jnp.zeros((256, 64))},
        }},
    }
    rules = shard_params_rules(params, mesh)
    b = rules["mid_attn"]["block_0"]
    assert b["attn1"]["to_q"]["kernel"].spec == P(None, "tp")
    assert b["attn1"]["to_out"]["kernel"].spec == P("tp")
    assert b["ff_proj"]["kernel"].spec == P(None, "tp")
    assert b["ff_out"]["kernel"].spec == P("tp")


def test_unet_multichip_train_step(tmp_path):
    """The UNet family's full training step jits and runs over a (2,2,2) mesh."""
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
    config.mesh.dp, config.mesh.fsdp, config.mesh.tp = 2, 2, 2
    trainer = Trainer(config, str(tmp_path))
    metrics = trainer.fit(max_steps=2)
    assert all(np.isfinite(m["loss"]) for m in metrics)
