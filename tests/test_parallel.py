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
    assert mesh.shape == {"dp": 2, "fsdp": 2, "tp": 2}
    with pytest.raises(AssertionError):
        make_mesh(dp=3, fsdp=2, tp=2)  # 12 > 8 devices
    # sub-meshes over fewer devices are allowed
    assert make_mesh(dp=1).shape == {"dp": 1, "fsdp": 1, "tp": 1}


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
