"""panopticdiffusionmodels_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
Panoptic Diffusion Models: co-generation of images and panoptic segmentation maps.

Re-designed from scratch for TPU hardware with the capability set of the reference
PyTorch implementation (yinghanlong/PanopticDiffusionModels):

  * pixel-space diffusion (CIFAR-10 / CelebA-64 / ImageNet-64) with a U-ViT backbone
    and a continuous VP-SDE,
  * latent diffusion (ImageNet 256/512) with a frozen SD KL autoencoder and a
    discrete 1000-step schedule,
  * text-to-image on MS-COCO with frozen CLIP text features,
  * joint image + panoptic-mask co-generation: dual-stream U-ViT with
    zero-initialized coupling layers, analog-bit mask encoding and a mask-aware
    DPM-Solver++,
  * FID / CLIP-score / mask-metric evaluation and offline feature extraction.

Architecture: a pure-functional compute core (schedules, solvers, models) built for
jit/scan/pjit over a `jax.sharding.Mesh`, plus an imperative shell (data, ckpt, logs).
"""

__version__ = "0.1.0"
