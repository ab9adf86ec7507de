#!/usr/bin/env python
"""Training-throughput benchmark on the real chip, via the SAME Trainer
engine users run, on synthetic (host-random) data.

Protocols (BENCH_TASK env):
  panoptic (default) — dual-stream U-ViT-S/2, 32x32x4 latent moments, 77x768
      CLIP context, 64x64 panoptic map: the reference's headline training
      protocol (`train_t2i_discrete.py`).
  latentL — class-conditional ImageNet-256 U-ViT-L/2 latent training
      (reference `train_ldm_discrete.py` + `configs/imagenet256_uvit_large.py`),
      the model the sampling headline (bench.py) serves.
  panoptic512 — dual-stream S/2 at 512 res (64x64x4 latents, 128x128 map,
      L~2126 tokens: `configs/mscoco_uvit_small_512.py`) — the long-sequence
      training geometry where attention cost dominates.  Default batch 48
      (the post-backward-kernel sweep optimum: 39.8/40.9/45.5/45.4 img/s at
      24/32/48/64).

A/B over training-side levers (remat policy, attention impl):

  python scripts/bench_train.py [policy ...]   # default: '' dots_no_batch

One TPU process at a time (CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def build_config(policy: str, batch: int):
    from panopticdiffusionmodels_tpu.configs.base import (
        adamw,
        autoencoder_block,
        base_config,
        d,
        sample_block,
        train_block,
        uvit,
        uvit_t2i,
        warmup,
    )

    if os.environ.get("BENCH_TASK", "panoptic") == "latentL":
        config = base_config()
        config.task = "latent_discrete"
        config.z_shape = (32, 32, 4)
        config.compute_dtype = "bfloat16"
        config.autoencoder = autoencoder_block(scale_factor=0.23010)
        config.train = train_block(10, batch, mode="cond", log_interval=100,
                                   eval_interval=10**9, save_interval=10**9)
        config.optimizer = adamw(2e-4, 0.03, (0.99, 0.99))
        config.lr_scheduler = warmup(10)
        config.nnet = uvit(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                           depth=20, num_heads=16, num_classes=1001,
                           use_checkpoint=True, scan_blocks=True, conv=False,
                           remat_policy=policy)
        config.dataset = d(name="synthetic", style="imagenet", n=4 * batch,
                           z_shape=(32, 32, 8), num_classes=1001)
        config.sample = sample_block(50, 16, 16, algorithm="dpm_solver",
                                     cfg=True, scale=0.4)
        return config

    res512 = os.environ.get("BENCH_TASK", "panoptic") == "panoptic512"
    img = 64 if res512 else 32
    mask = 128 if res512 else 64
    config = base_config()
    config.task = "t2i_discrete"
    config.z_shape = (img, img, 4)
    config.compute_dtype = "bfloat16"
    config.autoencoder = autoencoder_block(scale_factor=0.23010)
    config.train = train_block(10, batch, log_interval=100, eval_interval=10**9,
                               save_interval=10**9)
    config.optimizer = adamw(2e-4, 0.03, (0.9, 0.9))
    config.lr_scheduler = warmup(10)
    config.nnet = uvit_t2i(
        img_size=img, patch_size=2, embed_dim=512, depth=12, num_heads=8,
        clip_dim=768, num_clip_token=77, enable_panoptic=True, separate=True,
        mask_size=mask, use_checkpoint=True, scan_blocks=True, remat_policy=policy,
    )
    config.dataset = d(name="synthetic", n=4 * batch, z_shape=(img, img, 8),
                       clip_shape=(77, 768), mask_size=mask)
    config.sample = sample_block(50, 16, 16, algorithm="dpm_solver", cfg=True, scale=1.0)
    return config


def apply_env_overrides(config):
    # BENCH_TRANSFER=bfloat16 -> cast f32 batch fields on host before the
    # host->device copy (train.transfer_dtype).
    td = os.environ.get("BENCH_TRANSFER", "")
    if td:
        config.train.transfer_dtype = td
    # BENCH_GELU=tanh -> nnet.gelu_approx (a legitimate architecture choice
    # for from-scratch training; erf remains the reference-parity default).
    if os.environ.get("BENCH_GELU", "") == "tanh":
        config.nnet.gelu_approx = True
    # BENCH_REMAT=off -> disable activation checkpointing entirely (the
    # Pallas backward removed the HBM-resident (L, L) logits, so the remat
    # trade is worth re-measuring: no-remat saves the recompute forward if
    # the saved activations fit HBM).
    if os.environ.get("BENCH_REMAT", "") == "off":
        config.nnet.use_checkpoint = False
    # BENCH_ATTN=xla|auto|pallas_vjp|pallas_recompute -> nnet.attn_impl: A/B
    # the training attention path (auto = Pallas fwd + flash-style Pallas
    # backward kernel on TPU when it fits VMEM, else XLA-recompute VJP;
    # pallas_recompute forces the round-2 recompute backward; xla = pure XLA).
    ai = os.environ.get("BENCH_ATTN", "")
    if ai:
        config.nnet.attn_impl = ai
    return config


def run(policy: str, batch: int, steps: int = 8):
    import tempfile

    import jax.numpy as jnp

    from panopticdiffusionmodels_tpu.train.trainer import Trainer

    config = apply_env_overrides(build_config(policy, batch))
    with tempfile.TemporaryDirectory() as wd:
        trainer = Trainer(config, wd)
        stream = trainer.data_stream()
        batch_data = next(stream)
        key = jax.random.PRNGKey(0)
        state = trainer.state
        # compile + warm
        state, metrics = trainer._train_step(state, batch_data, key)
        float(metrics["loss"])
        times = []
        for i in range(steps):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            state, metrics = trainer._train_step(state, batch_data, k)
            loss = float(metrics["loss"])  # device->host sync
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"policy={policy or '(default)':14s} batch={batch}  "
              f"{best * 1e3:7.1f} ms/step  {batch / best:7.1f} img/s  loss={loss:.4f}")
        if os.environ.get("BENCH_FIT", ""):
            # The REAL training loop (Trainer.fit): host-tracked step counter,
            # so the only per-step host work is data feed + dispatch; metrics
            # sync every log_interval.  Reports the best logged window.
            # (trainer.state was donated into the warmup steps above — hand
            # the live state back before entering fit.)
            trainer.state = state
            trainer.config.train.log_interval = 10
            hist = trainer.fit(max_steps=int(state.step) + 41)
            rates = [m["images_per_sec"] for m in hist[1:]]  # skip compile window
            print(f"fit loop: best window {max(rates):7.1f} img/s "
                  f"(windows: {[round(r, 1) for r in rates]})")


def main():
    default_b = "48" if os.environ.get("BENCH_TASK", "") == "panoptic512" else "64"
    batch = int(os.environ.get("BENCH_BATCH", default_b))
    policies = sys.argv[1:] or ["", "dots_no_batch"]
    for p in policies:
        run(p, batch)


if __name__ == "__main__":
    main()
