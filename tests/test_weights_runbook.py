"""Fixture-driven drill of docs/TRAINED_WEIGHTS_RUNBOOK.md: the complete
"reference checkpoint arrives" path, with a randomly initialized torch
checkpoint standing in for the real (zero-egress-blocked) release weights.

Chain under test (one go, composing pieces that are unit-tested elsewhere):
  reference torch UViT-T2I state_dict  -> torch.save .pth
  -> GenerationPipeline.from_config(nnet_path=...)  (eval.py's load path)
  -> generate() panoptic samples
  -> scripts/convert_checkpoint.py    (orbax resume path)
  -> Trainer resumes the converted checkpoint and samples
  -> PNG dirs -> fid_given_paths with the parity-proven Inception
  (CLIP scoring needs the env-blocked HF weights; its CLI surface is covered
  by tests/test_evaluation.py and stays out of this drill.)
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

from panopticdiffusionmodels_tpu.configs import get_config  # noqa: E402
from panopticdiffusionmodels_tpu.serving import GenerationPipeline  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_config():
    """synthetic_tiny with the mask at image resolution (the geometry where
    the reference snapshot is self-consistent; see tests/test_torch_parity.py)."""
    config = get_config("synthetic_tiny")
    config.nnet.mask_size = 8
    config.dataset.mask_size = 8
    config.nnet.mlp_time_embed = False
    return config


def _reference_pth(tmp_path):
    import libs.uvit_t2i as ref_t2i

    torch.manual_seed(0)
    tmodel = ref_t2i.UViT(
        img_size=8, patch_size=2, in_chans=4, embed_dim=32, depth=4,
        num_heads=4, mlp_ratio=2.0, qkv_bias=False, mlp_time_embed=False,
        clip_dim=16, num_clip_token=7, num_panoptic_class=8,
        enable_panoptic=True, use_ground_truth=False, separate=True,
    ).eval()
    with torch.no_grad():
        for zc in tmodel.zero_convs:
            zc.conv.weight.normal_(0, 0.02)
            zc.conv.bias.normal_(0, 0.02)
    path = str(tmp_path / "nnet_ema.pth")
    torch.save(tmodel.state_dict(), path)
    return path, tmodel


def test_checkpoint_arrival_chain(tmp_path):
    pth, tmodel = _reference_pth(tmp_path)
    config = _tiny_config()

    # --- leg 1: eval.py's direct .pth load (serving/from_config) ----------
    pipe = GenerationPipeline.from_config(config, nnet_path=pth)
    # the converted weights must actually be IN the pipeline params: compare
    # one deterministic leaf against the torch tensor.
    w_torch = tmodel.context_embed.weight.detach().numpy()  # (embed, clip_dim)
    w_flax = np.asarray(pipe.params["params"]["context_embed"]["kernel"])
    np.testing.assert_allclose(w_flax, w_torch.T, rtol=1e-6, atol=1e-7)

    images, mask_ids = pipe.generate(
        contexts=np.zeros((4, 7, 16), np.float32), steps=4, seed=0)
    assert images.shape[0] == 4 and np.isfinite(images).all()
    assert mask_ids.shape[1:3] == (8, 8) and mask_ids.dtype.kind == "i"

    # --- leg 2: convert_checkpoint.py -> orbax -> Trainer resume ----------
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_checkpoint",
        os.path.join(REPO, "scripts", "convert_checkpoint.py"),
    )
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)
    workdir = tmp_path / "resume"
    ckpt_root = workdir / "ckpts"
    argv = sys.argv
    sys.argv = ["convert_checkpoint.py", "--config", "synthetic_tiny",
                "--nnet", pth, "--out", str(ckpt_root)]
    # convert under the SAME tiny geometry overrides
    from panopticdiffusionmodels_tpu import cli as cli_mod

    orig_load = cli_mod.load_config
    cli_mod.load_config = lambda spec_: _tiny_config()
    try:
        cc.main()
    finally:
        sys.argv = argv
        cli_mod.load_config = orig_load
    assert (ckpt_root / "0.ckpt").exists()

    from panopticdiffusionmodels_tpu.train.trainer import Trainer

    trainer = Trainer(config, str(workdir))
    assert trainer.resume(), "trainer did not pick up the converted checkpoint"
    resumed = np.asarray(
        trainer.state.ema_params["params"]["context_embed"]["kernel"])
    np.testing.assert_allclose(resumed, w_torch.T, rtol=1e-6, atol=1e-7)
    sample_fn = trainer.build_sample_fn(sample_steps=3)
    out = sample_fn(*trainer.sample_weights(), jax.random.PRNGKey(0),
                    jnp.zeros((2, 7, 16)))
    imgs = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(imgs)).all()

    # --- leg 3: PNG dirs -> FID CLI math (random Inception weights) -------
    from panopticdiffusionmodels_tpu.evaluation.fid import fid_given_paths
    from panopticdiffusionmodels_tpu.evaluation.inception import (
        make_extractor,
        random_params,
    )
    from panopticdiffusionmodels_tpu.evaluation.sampler_io import _save_png

    rng = np.random.default_rng(0)
    for d, seed in (("a", 1), ("b", 2)):
        os.makedirs(tmp_path / d, exist_ok=True)
        for i in range(8):
            img = rng.random((32, 32, 3)).astype(np.float32)
            _save_png(img, str(tmp_path / d / f"{i}.png"))
    fid = fid_given_paths(str(tmp_path / "a"), str(tmp_path / "b"),
                          make_extractor(random_params(0)), batch_size=4)
    assert np.isfinite(fid) and fid >= 0.0
