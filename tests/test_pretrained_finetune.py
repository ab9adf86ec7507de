"""Pretrained image-stream loading + freezing (reference
`train_t2i_discrete.py:300-319`): load a torch .pth, fine-tune, and verify the
image stream stays fixed while the mask stream trains."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference"):
    pytest.skip("reference not available", allow_module_level=True)
sys.path.insert(0, "/root/reference")

import flax.traverse_util as tu
import jax

from panopticdiffusionmodels_tpu.configs import get_config
from panopticdiffusionmodels_tpu.train.trainer import Trainer


def test_pretrained_load_and_freeze(tmp_path):
    import libs.uvit_t2i as ref_t2i

    torch.manual_seed(0)
    tmodel = ref_t2i.UViT(
        img_size=8, patch_size=2, in_chans=4, embed_dim=32, depth=4, num_heads=4,
        mlp_ratio=2.0, clip_dim=16, num_clip_token=7, num_panoptic_class=8,
        enable_panoptic=True, separate=True,
    )
    pth = str(tmp_path / "pretrained.pth")
    torch.save(tmodel.state_dict(), pth)

    config = get_config("synthetic_tiny")
    config.pretrained = pth
    config.optimizer.lr = 1e-2
    config.lr_scheduler.warmup_steps = 1
    trainer = Trainer(config, str(tmp_path / "wd"))

    before = tu.flatten_dict(jax.tree.map(np.asarray, trainer.state.params["params"]))
    # pretrained weights actually loaded (patch_embed matches the torch kernel)
    w_torch = tmodel.patch_embed.proj.weight.detach().numpy()
    d, c, p, _ = w_torch.shape
    expect = w_torch.transpose(2, 3, 1, 0).reshape(p * p * c, d)
    np.testing.assert_allclose(
        before[("patch_embed", "proj", "kernel")], expect, rtol=1e-6
    )

    trainer.fit(max_steps=3)
    after = tu.flatten_dict(jax.tree.map(np.asarray, trainer.state.params["params"]))

    # image stream frozen
    for key in before:
        top = key[0]
        if top in ("patch_embed", "context_embed", "mid_block") or (
            top.startswith(("in_blocks_", "out_blocks_")) and "mask" not in top
        ):
            np.testing.assert_array_equal(before[key], after[key]), key
    # mask stream trains
    moved = [
        key for key in before
        if ("mask" in key[0] or key[0].startswith("zero_convs"))
        and not np.array_equal(before[key], after[key])
    ]
    assert moved, "mask stream did not receive updates"


def test_image_only_checkpoint_into_dual_scan_model(tmp_path):
    """Fine-tuning setup for the SHIPPED headline config shape: an IMAGE-ONLY
    t2i checkpoint loaded into a dual-stream scan_blocks model must land its
    blocks at in_blocks_dual.block (review finding: the converter previously
    emitted plain-scan names that matched nothing, silently freezing a
    randomly initialized image stream)."""
    import libs.uvit_t2i as ref_t2i

    torch.manual_seed(0)
    tmodel = ref_t2i.UViT(
        img_size=8, patch_size=2, in_chans=4, embed_dim=32, depth=4, num_heads=4,
        mlp_ratio=2.0, clip_dim=16, num_clip_token=7, num_panoptic_class=8,
        enable_panoptic=False, separate=True,  # image-only checkpoint
    )
    pth = str(tmp_path / "pretrained_img.pth")
    torch.save(tmodel.state_dict(), pth)

    config = get_config("synthetic_tiny")
    config.nnet.scan_blocks = True
    config.pretrained = pth
    trainer = Trainer(config, str(tmp_path / "wd"))

    params = tu.flatten_dict(
        jax.tree.map(np.asarray, trainer.state.params["params"])
    )
    # the image half of the dual scan stack carries the checkpoint weights
    w_torch = tmodel.in_blocks[0].mlp.fc1.weight.detach().numpy()
    got = params[("in_blocks_dual", "block", "mlp", "fc1", "kernel")][0]
    np.testing.assert_allclose(got, w_torch.T, rtol=1e-6)
    # patch_embed too
    w_pe = tmodel.patch_embed.proj.weight.detach().numpy()
    d, c, p, _ = w_pe.shape
    np.testing.assert_allclose(
        params[("patch_embed", "proj", "kernel")],
        w_pe.transpose(2, 3, 1, 0).reshape(p * p * c, d), rtol=1e-6,
    )


def test_missing_pretrained_path_fails_loudly(tmp_path):
    """A typo'd pretrained path must raise, not silently freeze random
    weights (review finding)."""
    config = get_config("synthetic_tiny")
    config.pretrained = str(tmp_path / "does_not_exist.pth")
    with pytest.raises(FileNotFoundError, match="pretrained"):
        Trainer(config, str(tmp_path / "wd"))
