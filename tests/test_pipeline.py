"""Pipeline parallelism (the 'pp' mesh axis, parallel/pipeline.py).

Correctness bar: the boomerang pipeline is a SCHEDULING of the same math —
forward outputs, losses, and gradients must match the plain scanned forward
to float tolerance, for every supported trunk variant.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticdiffusionmodels_tpu.configs import get_config
from panopticdiffusionmodels_tpu.models import UViT, UViTT2I
from panopticdiffusionmodels_tpu.parallel.mesh import make_mesh
from panopticdiffusionmodels_tpu.parallel.pipeline import (
    make_pipelined_apply,
    pipeline_blocks,
)
from panopticdiffusionmodels_tpu.train.trainer import Trainer


# --- engine-level: pure functions, every schedule shape -----------------------

H, B, L, C = 4, 16, 6, 5


def _down(p, c):
    c = jnp.tanh(c @ p)
    return c, c


def _up(p, c, s):
    return jnp.tanh(jnp.concatenate([c, s], -1) @ p)


def _mid(p, c):
    return jnp.tanh(c @ p)


def _toy():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    w_in = jax.random.normal(ks[0], (H, C, C)) * 0.3
    w_out = jax.random.normal(ks[1], (H, 2 * C, C)) * 0.3
    w_mid = jax.random.normal(ks[2], (C, C)) * 0.3
    x = jax.random.normal(ks[3], (B, L, C))
    return x, (w_in, w_out, w_mid)


def _sequential(x, w_in, w_out, w_mid):
    skips = []
    c = x
    for i in range(H):
        c, s = _down(w_in[i], c)
        skips.append(s)
    c = _mid(w_mid, c)
    for i in range(H):
        c = _up(w_out[i], c, skips.pop())
    return c


@pytest.mark.parametrize(
    "pp,dp,fsdp,micro",
    [(2, 2, 2, 2), (2, 4, 1, 4), (4, 2, 1, 8), (1, 4, 2, 2)],
)
def test_engine_matches_sequential(pp, dp, fsdp, micro):
    x, (w_in, w_out, w_mid) = _toy()
    mesh = make_mesh(dp=dp, fsdp=fsdp, pp=pp)
    ref = _sequential(x, w_in, w_out, w_mid)
    out = jax.jit(
        lambda x, a, b, c: pipeline_blocks(
            x, a, b, c, mesh=mesh, num_micro=micro,
            down_fn=_down, up_fn=_up, mid_fn=_mid,
        )
    )(x, w_in, w_out, w_mid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_engine_grads_match_sequential_with_remat():
    x, params = _toy()
    mesh = make_mesh(dp=2, fsdp=1, pp=4)

    def loss_pipe(params, x):
        a, b, c = params
        o = pipeline_blocks(
            x, a, b, c, mesh=mesh, num_micro=4,
            down_fn=_down, up_fn=_up, mid_fn=_mid, remat=True,
        )
        return jnp.sum(o ** 2)

    def loss_ref(params, x):
        a, b, c = params
        return jnp.sum(_sequential(x, a, b, c) ** 2)

    g1 = jax.jit(jax.grad(loss_pipe))(params, x)
    g2 = jax.jit(jax.grad(loss_ref))(params, x)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


# --- model-level: pipelined apply == plain apply ------------------------------


def _pipe_vs_plain(nnet, args, kwargs, mesh, num_micro=2):
    init_kwargs = {k: v for k, v in kwargs.items() if k != "use_ground_truth"}
    params = nnet.init(jax.random.PRNGKey(0), *args, **init_kwargs)
    plain = nnet.apply(params, *args, **kwargs)
    pipe_fn = make_pipelined_apply(nnet, mesh, num_micro=num_micro)
    piped = jax.jit(lambda p, *a: pipe_fn(p, *a, **kwargs))(params, *args)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-5,
        ),
        plain,
        piped,
    )


def test_uvit_single_stream_pipelined_forward():
    nnet = UViT(
        img_size=8, patch_size=2, in_chans=3, embed_dim=16, depth=4,
        num_heads=4, num_classes=10, scan_blocks=True,
    )
    mesh = make_mesh(dp=2, fsdp=2, pp=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    t = jnp.full((8,), 10.0)
    y = jnp.arange(8) % 10
    _pipe_vs_plain(nnet, (x, t, y), {}, mesh)


def _t2i(separate, enable_panoptic=True):
    return UViTT2I(
        img_size=8, patch_size=2, in_chans=4, embed_dim=16, depth=4,
        num_heads=4, clip_dim=12, num_clip_token=7, mask_bits=8, mask_size=16,
        enable_panoptic=enable_panoptic, separate=separate, scan_blocks=True,
    )


def _t2i_args(b=8):
    x = jax.random.normal(jax.random.PRNGKey(2), (b, 8, 8, 4))
    t = jnp.full((b,), 10.0)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (b, 7, 12))
    m = jax.random.normal(jax.random.PRNGKey(4), (b, 16, 16, 8))
    return x, t, ctx, m


def test_t2i_dual_stream_pipelined_forward():
    x, t, ctx, m = _t2i_args()
    mesh = make_mesh(dp=2, fsdp=1, pp=2)
    _pipe_vs_plain(_t2i(separate=True), (x, t, ctx), {"mask_token": m}, mesh)


def test_t2i_joint_stream_pipelined_forward():
    """separate=False: mask tokens ride in the single stream; the head
    recovers the panoptic flag from the token count."""
    x, t, ctx, m = _t2i_args()
    mesh = make_mesh(dp=2, fsdp=1, pp=2)
    _pipe_vs_plain(_t2i(separate=False), (x, t, ctx), {"mask_token": m}, mesh)


def test_t2i_ground_truth_mode_pipelined_forward():
    x, t, ctx, m = _t2i_args()
    mesh = make_mesh(dp=2, fsdp=1, pp=2)
    _pipe_vs_plain(
        _t2i(separate=True), (x, t, ctx),
        {"mask_token": m, "use_ground_truth": True}, mesh,
    )


def test_stage_split_matches_full():
    """embed -> head composition equals the full forward when the trunk is
    applied in between by the plain scanned path (sanity of the stage API
    itself, independent of the pipeline engine)."""
    nnet = _t2i(separate=True)
    x, t, ctx, m = _t2i_args(b=4)
    params = nnet.init(jax.random.PRNGKey(0), x, t, ctx, mask_token=m)
    full = nnet.apply(params, x, t, ctx, mask_token=m)
    mesh = make_mesh(dp=1, fsdp=1, pp=1)  # engine degenerates to plain scan
    pipe_fn = make_pipelined_apply(nnet, mesh, num_micro=1)
    split = pipe_fn(params, x, t, ctx, mask_token=m)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-5,
        ),
        full,
        split,
    )


# --- trainer-level: pp train step == dp train step ----------------------------


def _losses(mesh_kwargs, tmp_path, steps=3, **cfg_over):
    config = get_config("synthetic_tiny")
    for k, v in mesh_kwargs.items():
        config.mesh[k] = v
    config.train.batch_size = 16
    config.nnet.scan_blocks = True
    for k, v in cfg_over.items():
        config.train[k] = v
    trainer = Trainer(config, str(tmp_path))
    stream = trainer.data_stream()
    out = []
    for i in range(steps):
        batch = next(stream)
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        trainer.state, metrics = trainer._train_step(trainer.state, batch, key)
        out.append((float(metrics["loss"]), float(metrics["loss_mask"])))
    return out


def test_pp_train_matches_dp(tmp_path):
    a = _losses(dict(dp=8, fsdp=1, tp=1), tmp_path / "a")
    b = _losses(dict(dp=2, fsdp=2, tp=1, pp=2), tmp_path / "b")
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_pp_with_more_microbatches_matches_dp(tmp_path):
    a = _losses(dict(dp=8, fsdp=1, tp=1), tmp_path / "a")
    b = _losses(dict(dp=2, fsdp=1, tp=1, pp=2), tmp_path / "b",
                pp_microbatches=4)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_pp_composes_with_grad_accum(tmp_path):
    """grad_accum microbatches the batch BEFORE the loss; the pipeline then
    microbatches each accumulation slice again — both reductions must
    commute with the dp-only step."""
    a = _losses(dict(dp=8, fsdp=1, tp=1), tmp_path / "a", grad_accum=2)
    b = _losses(dict(dp=2, fsdp=1, tp=1, pp=2), tmp_path / "b", grad_accum=2)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_pp_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of pp-sharded state: train 2 steps on a pp mesh,
    save, restore into a fresh trainer, and confirm the restored step/params
    match (arrays land back on the mesh with their pp shardings)."""
    from panopticdiffusionmodels_tpu.train import checkpoint as ckpt_lib

    config = get_config("synthetic_tiny")
    config.mesh.dp, config.mesh.fsdp, config.mesh.pp = 2, 2, 2
    config.train.batch_size = 16
    config.nnet.scan_blocks = True
    trainer = Trainer(config, str(tmp_path / "run"))
    stream = trainer.data_stream()
    for i in range(2):
        trainer.state, _ = trainer._train_step(
            trainer.state, next(stream), jax.random.fold_in(jax.random.PRNGKey(7), i)
        )
    root = str(tmp_path / "run" / "ckpts")
    ckpt_lib.save_checkpoint(root, trainer.state)

    fresh = Trainer(config, str(tmp_path / "run2"))
    restored, ok = ckpt_lib.resume(root, fresh.state)
    assert ok and int(restored.step) == 2
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        ),
        restored.params,
        trainer.state.params,
    )


def test_pp_shards_block_stacks(tmp_path):
    """The stacked block params (and their Adam moments) live pp-sharded on
    the layer axis — the pipeline's param-memory win must be real."""
    config = get_config("synthetic_tiny")
    config.mesh.dp, config.mesh.fsdp, config.mesh.pp = 2, 2, 2
    config.train.batch_size = 16
    config.nnet.scan_blocks = True
    trainer = Trainer(config, str(tmp_path))

    def pp_sharded_leaves(tree):
        found = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            names = [str(getattr(k, "key", k)) for k in path]
            if any(n in ("in_blocks_dual", "out_blocks_dual") for n in names):
                spec = leaf.sharding.spec
                axes = spec[0] if len(spec) else None
                axes = axes if isinstance(axes, tuple) else (axes,)
                assert "pp" in axes, (names, leaf.sharding)
                shard = leaf.addressable_shards[0].data
                assert shard.shape[0] == leaf.shape[0] // 2, (names, shard.shape)
                found.append(names)
        return found

    assert pp_sharded_leaves(trainer.state.params)
    assert pp_sharded_leaves(trainer.state.opt_state)


def test_pp_validation_errors(tmp_path):
    config = get_config("synthetic_tiny")
    config.mesh.dp, config.mesh.pp = 4, 2
    config.train.batch_size = 16
    config.nnet.scan_blocks = False
    with pytest.raises(ValueError, match="scan_blocks"):
        Trainer(config, str(tmp_path / "a"))
    config.nnet.scan_blocks = True
    config.nnet.depth = 6  # half=3 not divisible by pp=2
    with pytest.raises(ValueError, match="depth"):
        Trainer(config, str(tmp_path / "b"))
    config.nnet.depth = 4
    config.mesh.dp, config.mesh.tp = 2, 2
    with pytest.raises(ValueError, match="sp == tp == 1"):
        Trainer(config, str(tmp_path / "c"))


def test_pp_sampling_still_works(tmp_path):
    """Under a pp mesh the FULL sampling pipeline (CFG dual-stream solver +
    VAE decode) runs with the block trunk pipelined per model eval (the
    microbatch count self-adapts to the CFG-doubled batch) and matches the
    dp-mesh sampler to float tolerance."""
    def samples(mesh_kwargs, wd):
        config = get_config("synthetic_tiny")
        for k, v in mesh_kwargs.items():
            config.mesh[k] = v
        config.train.batch_size = 16
        config.nnet.scan_blocks = True
        trainer = Trainer(config, str(wd))
        sample_fn = jax.jit(trainer.build_sample_fn(sample_steps=5))
        ctx = jnp.zeros((8, *config.dataset.clip_shape))
        imgs, mask = sample_fn(*trainer.sample_weights(), jax.random.PRNGKey(3), ctx)
        return np.asarray(imgs, np.float32), np.asarray(mask, np.float32)

    ia, ma = samples(dict(dp=8), tmp_path / "a")
    ib, mb = samples(dict(dp=4, pp=2), tmp_path / "b")
    np.testing.assert_allclose(ia, ib, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ma, mb, rtol=1e-4, atol=1e-4)
