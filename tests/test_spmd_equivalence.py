"""SPMD correctness: the jitted train step must compute the SAME numbers
whatever the mesh layout — sharding is a placement decision, not a semantic one.
"""
import jax
import jax.numpy as jnp
import numpy as np

from panopticdiffusionmodels_tpu.configs import get_config
from panopticdiffusionmodels_tpu.train.trainer import Trainer


def _losses(mesh_kwargs, tmp_path, steps=3):
    config = get_config("synthetic_tiny")
    for k, v in mesh_kwargs.items():
        config.mesh[k] = v
    config.train.batch_size = 16
    trainer = Trainer(config, str(tmp_path))
    stream = trainer.data_stream()
    out = []
    for i in range(steps):
        batch = next(stream)
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        trainer.state, metrics = trainer._train_step(trainer.state, batch, key)
        out.append((float(metrics["loss"]), float(metrics["loss_mask"])))
    return out


def test_dp8_matches_dp1(tmp_path):
    a = _losses(dict(dp=1, fsdp=1, tp=1), tmp_path / "a")
    b = _losses(dict(dp=8, fsdp=1, tp=1), tmp_path / "b")
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fsdp_tp_matches_dp1(tmp_path):
    a = _losses(dict(dp=1, fsdp=1, tp=1), tmp_path / "a")
    c = _losses(dict(dp=2, fsdp=2, tp=2), tmp_path / "c")
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)
