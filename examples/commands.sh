#!/usr/bin/env bash
# Canonical launches (the reference's run_commands.sh equivalent).
set -e

# --- training ---------------------------------------------------------------
# CIFAR-10 pixel-space SDE (U-ViT-S/2)
python train.py --config=cifar10_uvit_small

# CelebA-64 (U-ViT-S/4)
python train.py --config=celeba64_uvit_small

# ImageNet-256 latent diffusion (U-ViT-L/2), ZeRO-3 + TP example mesh
python train.py --config=imagenet256_uvit_large \
    --config.mesh.fsdp=4 --config.mesh.tp=2

# 512-res panoptic (L~2126 tokens): sequence parallelism shards the token dim
# of activations across chips (params stay replicated over sp; attention runs
# through RING attention — shard_map + ppermute K/V rotation with Pallas hop
# kernels, never gathering full K/V; opt out with --config.nnet.attn_impl=xla)
python train.py --config=mscoco_uvit_small_512 \
    --config.mesh.dp=2 --config.mesh.sp=4

# Pipeline parallelism: boomerang schedule over the U-ViT depth (long skips
# stay stage-local); stacked block params shard across stages.  8 microbatches
# keeps the bubble fraction at 2(P-1)/(M+2P-2) = 20% for P=2
python train.py --config=imagenet256_uvit_large \
    --config.nnet.scan_blocks=True --config.mesh.pp=2 --config.mesh.fsdp=2 \
    --config.train.pp_microbatches=8

# Headline: MS-COCO panoptic co-generation (dual-stream U-ViT-S/2),
# fine-tuning from the published t2i weights with the image stream frozen
python train.py --config=mscoco_uvit_small \
    --config.pretrained=assets/pretrained/mscoco_uvit_small.pth

# multi-host: export JAX_COORDINATOR_ADDRESS=<host:port> on every worker first

# --- evaluation -------------------------------------------------------------
# FID + mask metrics from reference-format weights
python eval.py --config=mscoco_uvit_small \
    --config.nnet_path=assets/pretrained/nnet_ema.pth

# standalone FID between a stats file and a sample dir
python -m panopticdiffusionmodels_tpu.evaluation.fid \
    assets/fid_stats/fid_stats_mscoco256_val.npz results/.../samples

# CLIP score with the 5-caption pairing protocol
python -m panopticdiffusionmodels_tpu.evaluation.clip_score \
    --sample-dir results/.../samples --caption-dir assets/datasets/coco256_features/val

# --- sampling ---------------------------------------------------------------
python sample.py --config=mscoco_uvit_small

# opt-in speed modes (exact protocol when unset; BENCH.md has the measured
# speed/deviation trade and the distribution-level quality-gate verdicts):
#   forecast-skip (~2.4x)                 --config.sample.accel=0.2
#   guidance interval (1.3x, 2404.07724)  --config.sample.cfg_interval="(0.0,0.5)"
#   tanh GELU (~1.2-1.3x)                 --config.nnet.gelu_approx=True
# PANOPTIC recommended combo (gate-validated; cfg_interval is DEMOTED on
# panoptic geometries — it shifts the trained mask-id distribution, and the
# speed-budget guardrail warns): gelu + accel only, 2.96x
python sample.py --config=mscoco_uvit_small \
    --config.nnet.gelu_approx=True --config.sample.accel=0.2
# image-only flagship: all three compose (gate-PASS), 3.48x
python sample.py --config=imagenet256_uvit_large \
    --config.nnet.gelu_approx=True \
    --config.sample.accel=0.2 --config.sample.cfg_interval="(0.0,0.5)"

# --- feature extraction -----------------------------------------------------
python scripts/extract_mscoco_feature.py --split val2017 \
    --datadir assets/datasets/coco --outdir assets/datasets/coco256_features
python scripts/extract_empty_feature.py --outdir assets/datasets/coco256_features
python scripts/extract_test_prompt_feature.py --outdir assets/datasets/coco256_features

# --- benchmarks -------------------------------------------------------------
python bench.py                      # headline sampling throughput (one JSON line)
python scripts/bench_speed_modes.py  # speed modes: throughput + deviation evidence
python scripts/bench_breakdown.py    # wall-time shares: solver / decode / forward
python scripts/bench_train.py        # training throughput A/B (remat policies)
python scripts/bench_protocols.py 512L  # ImageNet-512/huge sampling protocols
python scripts/bench_eval_io.py      # eval-loop host/device overlap A/B
python scripts/verify_kernel_tpu.py  # on-chip Pallas kernel numerics evidence
python -m pytest tests/ -q           # full test suite (8-device CPU mesh)
