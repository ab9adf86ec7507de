"""Config builders shared by the config zoo.

Configs are ml_collections.ConfigDicts mirroring the reference's 15-config zoo
(reference `configs/*.py`) with framework-native field names:

  * `nnet.name` in {'uvit', 'uvit_t2i'}; panoptic knobs are `mask_bits` /
    `mask_size` (replacing the reference's `num_panoptic_class` /
    never-wired `patch_factor`, SURVEY.md §2.3),
  * `z_shape` etc. are channel-LAST (NHWC),
  * `mesh` selects (pp, dp, fsdp, sp, tp); dp = -1 means "all remaining
    devices"; sp shards the TOKEN dim of activations (sequence/context
    parallelism, for long-sequence geometries like the 512-res panoptic dual
    stream); pp pipelines the scanned block stacks over depth
    (parallel/pipeline.py — training path, requires nnet.scan_blocks),
  * `compute_dtype` selects bf16/f32 network compute.
"""
from __future__ import annotations

import ml_collections


def d(**kwargs):
    return ml_collections.ConfigDict(initial_dictionary=kwargs)


def base_config(seed: int = 1234) -> ml_collections.ConfigDict:
    config = ml_collections.ConfigDict()
    config.seed = seed
    # One of train.trainer.TASKS; every zoo config sets this explicitly
    # (replacing the reference's implicit per-script dispatch).
    config.task = ""
    config.pred = "noise_pred"
    config.compute_dtype = "bfloat16"
    config.ema_rate = 0.9999
    config.workdir = ""
    config.pretrained = ""
    config.mask_channel = 1
    config.mesh = d(dp=-1, fsdp=1, sp=1, tp=1, pp=1)
    return config


def adamw(lr=2e-4, weight_decay=0.03, betas=(0.99, 0.999)):
    return d(name="adamw", lr=lr, weight_decay=weight_decay, betas=list(betas))


def warmup(steps):
    return d(name="customized", warmup_steps=steps)


def train_block(n_steps, batch_size, mode=None, log_interval=10, eval_interval=5000,
                save_interval=50000):
    cfg = d(
        n_steps=n_steps,
        batch_size=batch_size,
        log_interval=log_interval,
        eval_interval=eval_interval,
        save_interval=save_interval,
    )
    if mode is not None:
        cfg.mode = mode
    return cfg


def autoencoder_block(pretrained_path="assets/stable-diffusion/autoencoder_kl.pth",
                      scale_factor=0.18215):
    return d(pretrained_path=pretrained_path, scale_factor=scale_factor)


def uvit(img_size, patch_size, embed_dim, depth, num_heads, in_chans=3,
         num_classes=-1, mlp_ratio=4, qkv_bias=False, mlp_time_embed=False,
         use_checkpoint=False, conv=True, scan_blocks=False,
         remat_policy="save_attn", gelu_approx=False):
    # remat_policy: checkpoint policy when use_checkpoint=True.  Default
    # "save_attn" (round 5): save only each block's attention output — the
    # remat replay then skips re-running the attention kernel, measured
    # faster than recompute-everything on EVERY shipped geometry at
    # identical loss (panoptic S/2 +5.6%, B128 +4.0%, latentL +1.9%,
    # 512-res +12%) for one bf16 (B, L, C) per block of extra HBM
    # (less than dots_no_batch's saved qkv output, which still fits at
    # every measured batch).  "" = recompute everything (the pre-round-5
    # default); see models/scan_stack.resolve_remat_policy and BENCH.md
    # "Training remat policy".
    # gelu_approx: opt-in tanh GELU (reference uses exact erf) — ~13% faster
    # forward, different math; see models/layers.Mlp and BENCH.md.
    return d(
        name="uvit",
        remat_policy=remat_policy,
        gelu_approx=gelu_approx,
        img_size=img_size,
        patch_size=patch_size,
        in_chans=in_chans,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=mlp_ratio,
        qkv_bias=qkv_bias,
        mlp_time_embed=mlp_time_embed,
        num_classes=num_classes,
        use_checkpoint=use_checkpoint,
        conv=conv,
        scan_blocks=scan_blocks,
    )


def uvit_t2i(img_size, patch_size, embed_dim, depth, num_heads, in_chans=4,
             mlp_ratio=4, qkv_bias=False, mlp_time_embed=False, clip_dim=768,
             num_clip_token=77, enable_panoptic=True, separate=True,
             use_ground_truth=False, mask_bits=8, mask_size=None,
             use_checkpoint=False, conv=True, scan_blocks=False,
             remat_policy="save_attn", gelu_approx=False):
    return d(
        name="uvit_t2i",
        remat_policy=remat_policy,
        gelu_approx=gelu_approx,
        img_size=img_size,
        patch_size=patch_size,
        in_chans=in_chans,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=mlp_ratio,
        qkv_bias=qkv_bias,
        mlp_time_embed=mlp_time_embed,
        clip_dim=clip_dim,
        num_clip_token=num_clip_token,
        enable_panoptic=enable_panoptic,
        separate=separate,
        use_ground_truth=use_ground_truth,
        mask_bits=mask_bits,
        mask_size=mask_size if mask_size is not None else 2 * img_size,
        use_checkpoint=use_checkpoint,
        conv=conv,
        scan_blocks=scan_blocks,
    )


def sample_block(sample_steps, n_samples, mini_batch_size, algorithm="dpm_solver",
                 cfg=False, scale=0.0, path="", accel=0.0, cfg_interval=(),
                 cfg_interval_mask_hold=True):
    # accel: forecast-skip logSNR threshold for DPM-Solver (0.0 = off, the
    # exact FID protocol; >0 trades NFE for throughput, quality-affecting).
    # cfg_interval: (lo, hi) in continuous model time (0, 1] — guidance is
    # applied only for solver steps starting inside the interval
    # (arXiv:2404.07724); steps outside run one cond-only forward (half the
    # FLOPs).  () = guidance at every step (the exact reference protocol).
    # DPM-Solver algorithms only; the PNDM path ignores it.
    # cfg_interval_mask_hold: panoptic + cfg_interval only — hold the CFG
    # mask-guidance correction across unguided steps instead of dropping it
    # (the plain-interval mode drifts the trained mask-id distribution
    # 4.7-10.3x the seed floor, quality_gate/trained_panoptic).  No effect on
    # image-only models or when cfg_interval is unset.
    return d(
        sample_steps=sample_steps,
        n_samples=n_samples,
        mini_batch_size=mini_batch_size,
        algorithm=algorithm,
        cfg=cfg,
        scale=scale,
        path=path,
        accel=accel,
        cfg_interval=tuple(cfg_interval),
        cfg_interval_mask_hold=cfg_interval_mask_hold,
    )
