#!/usr/bin/env python
"""On-chip smoke + throughput for the UNet/PNDM family (mscoco_unet).

The reference's `use_unet=True` path (reference `train_t2i_discrete.py:
273-292,522-534`) samples an SD-1.x UNet with the PNDM/PLMS scheduler and a
mask stream held fixed across NFEs.  This framework's equivalent is
`models/unet.py` (UNet2DCondition + zero-gated panoptic mask stream) +
`samplers/pndm.py` (host-planned tables, one lax.scan).  Until round 5 that
family was CPU-tested only (round-4 verdict, missing #3); this script proves
it runs on the hardware it targets and records img+mask/s.

Pipeline = fused 2x-batch t2i CFG (scale 1.0, empty-context null) x 50 PNDM
steps x KL-VAE decode, all under ONE jit — the same shape the trainer's
`build_sample_fn` builds for `mscoco_unet` configs (train/trainer.py pndm
branch).

Usage: python scripts/bench_unet.py            # mscoco_unet geometry
Env:   BENCH_BATCH (default 8), BENCH_STEPS (default 50),
       BENCH_PANOPTIC=off to drop the mask stream.
One TPU process at a time (CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def main():
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    panoptic = os.environ.get("BENCH_PANOPTIC", "on") != "off"

    from panopticdiffusionmodels_tpu.diffusion import (
        Schedule,
        stable_diffusion_beta_schedule,
    )
    from panopticdiffusionmodels_tpu.diffusion.cfg import make_cfg_t2i
    from panopticdiffusionmodels_tpu.models.unet import UNet2DCondition
    from panopticdiffusionmodels_tpu.models.vae import get_model as get_vae
    from panopticdiffusionmodels_tpu.samplers.pndm import pndm_sample

    # configs/mscoco_unet.py geometry (the SD-1.x backbone the reference
    # loads, with the zero-gated mask stream)
    model = UNet2DCondition(
        sample_size=32, in_chans=4, out_chans=4, model_channels=320,
        channel_mult=(1, 2, 4, 4), num_res_blocks=2, num_heads=8,
        clip_dim=768, num_clip_token=77, enable_panoptic=panoptic,
        mask_bits=8, mask_size=64, dtype=jnp.bfloat16,
    )
    mask0 = jnp.zeros((1, 64, 64, 8)) if panoptic else None
    params = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 32, 32, 4)), jnp.zeros((1,)),
                             jnp.zeros((1, 77, 768)), mask_token=mask0)
    )(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"UNet2DCondition({'panoptic' if panoptic else 'image-only'}): "
          f"{n_params / 1e6:.1f}M params", flush=True)
    vae = get_vae(dtype=jnp.bfloat16)
    vae_params = jax.jit(
        lambda k: vae.init(k, jnp.zeros((1, 32, 32, 4)), method="decode")
    )(jax.random.PRNGKey(1))

    schedule = Schedule(stable_diffusion_beta_schedule())
    acp = schedule.cum_alphas[1:]  # diffusers-convention 1000-entry table
    empty_context = np.zeros((77, 768), np.float32)

    @jax.jit
    def pipeline(params, vae_params, key, context):
        cfg_fn = make_cfg_t2i(
            lambda xx, tt, cc, mask_token=None: model.apply(
                params, xx, tt, cc, mask_token=mask_token),
            empty_context, scale=1.0, enabled=True,
        )

        def model_fn(xx, tt, mask_token=None):
            return cfg_fn(xx, tt, context, mask_token=mask_token)

        k1, k2 = jax.random.split(key)
        z = jax.random.normal(k1, (batch, 32, 32, 4))
        if panoptic:
            m = jax.random.normal(k2, (batch, 64, 64, 8))
            z0, pred_mask = pndm_sample(model_fn, z, steps, acp,
                                        num_train_timesteps=schedule.N,
                                        mask_token=m)
        else:
            z0 = pndm_sample(model_fn, z, steps, acp,
                             num_train_timesteps=schedule.N)
            pred_mask = None
        img = vae.apply(vae_params, z0, method="decode")
        return img, pred_mask

    key = jax.random.PRNGKey(42)
    ctx = jnp.asarray(
        np.random.RandomState(7).normal(size=(batch, 77, 768)), jnp.float32)

    def run(k):
        img, pm = pipeline(params, vae_params, k, ctx)
        # force device->host (tunnel block_until_ready may not block)
        s = float(jnp.sum(img[:1, ::64, ::64, :]))
        if pm is not None:
            s += float(jnp.sum(pm[:1, ::32, ::32, 0]))
        return img, pm

    t0 = time.perf_counter()
    img, pm = run(key)
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s; "
          f"img {tuple(img.shape)} finite={bool(np.isfinite(np.asarray(img)).all())}"
          + (f"; mask {tuple(pm.shape)} "
             f"finite={bool(np.isfinite(np.asarray(pm)).all())}" if pm is not None
             else ""), flush=True)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(jax.random.fold_in(key, i))
        times.append(time.perf_counter() - t0)
    unit = "img+mask/s" if panoptic else "img/s"
    print(f"mscoco_unet {steps}-NFE PNDM CFG + decode, batch {batch}: "
          f"{batch / min(times):.2f} {unit}")


if __name__ == "__main__":
    main()
