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

# --- feature extraction -----------------------------------------------------
python scripts/extract_mscoco_feature.py --split val2017 \
    --datadir assets/datasets/coco --outdir assets/datasets/coco256_features
python scripts/extract_empty_feature.py --outdir assets/datasets/coco256_features
python scripts/extract_test_prompt_feature.py --outdir assets/datasets/coco256_features

# --- benchmarks -------------------------------------------------------------
python bench.py                      # headline sampling throughput (one JSON line)
python -m pytest tests/ -q           # full test suite (8-device CPU mesh)
