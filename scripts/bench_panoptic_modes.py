#!/usr/bin/env python
"""Panoptic (dual-stream) pipeline speed modes: throughput + joint-output
deviation.

The headline panoptic protocol: U-ViT-S/2 (mscoco_uvit_small geometry),
50-NFE mask-aware DPM-Solver-fast, t2i CFG with mask extrapolation, VAE
decode — image AND mask trajectories in one scan.  For each speed mode this
reports img+mask/s, the relative L2 deviation of the decoded images, the
relative deviation of the analog-bit mask prediction, and the fraction of
flipped mask bits (the quantity that decides whether mask ids survive).

Usage: python scripts/bench_panoptic_modes.py [accel=0.2] [interval=0.0,0.5]
       [combo=0.2:0.0,0.5] ...   (defaults: accel=0.2 combo=0.2:0.0,0.5)
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

import jax.numpy as jnp
import numpy as np


GEOS = {
    # img, patch, embed, depth, heads, mask_size
    # (mscoco_uvit_small / mscoco_uvit_large / mscoco_uvit_small_512)
    "256": dict(img=32, patch=2, embed=512, depth=12, heads=8, mask=64),
    "large": dict(img=32, patch=2, embed=1024, depth=20, heads=16, mask=64),
    "512": dict(img=64, patch=2, embed=512, depth=12, heads=8, mask=128),
}


def build(batch, accel, interval, gelu=False, hold=False):
    geo = GEOS[os.environ.get("BENCH_GEO", "256")]
    from panopticdiffusionmodels_tpu.diffusion import (
        Schedule,
        stable_diffusion_beta_schedule,
    )
    from panopticdiffusionmodels_tpu.diffusion.cfg import make_cfg_t2i
    from panopticdiffusionmodels_tpu.models import UViTT2I
    from panopticdiffusionmodels_tpu.models.vae import get_model as get_vae
    from panopticdiffusionmodels_tpu.samplers import DPMSolver, NoiseScheduleVP

    model = UViTT2I(
        img_size=geo["img"], patch_size=geo["patch"], in_chans=4,
        embed_dim=geo["embed"], depth=geo["depth"], num_heads=geo["heads"],
        clip_dim=768, num_clip_token=77, mask_bits=8, mask_size=geo["mask"],
        enable_panoptic=True, separate=True, dtype=jnp.bfloat16,
        scan_blocks=True, attn_impl="infer", gelu_approx=gelu,
    )
    x0 = jnp.zeros((1, geo["img"], geo["img"], 4))
    ctx0 = jnp.zeros((1, 77, 768))
    m0 = jnp.zeros((1, geo["mask"], geo["mask"], 8))
    params = jax.jit(
        lambda k: model.init(k, x0, jnp.zeros((1,)), ctx0, mask_token=m0)
    )(jax.random.PRNGKey(0))
    vae = get_vae(dtype=jnp.bfloat16)
    vae_params = jax.jit(
        lambda k: vae.init(k, x0, method="decode")
    )(jax.random.PRNGKey(1))

    betas = stable_diffusion_beta_schedule()
    schedule = Schedule(betas)
    ns = NoiseScheduleVP("discrete", betas=betas)
    empty_context = np.zeros((77, 768), np.float32)

    @jax.jit
    def pipeline(params, vae_params, key, context):
        cfg_fn = make_cfg_t2i(
            lambda xx, tt, cc, mask_token=None: model.apply(
                params, xx, tt, cc, mask_token=mask_token),
            empty_context, scale=1.0, enabled=True,
        )
        solver = DPMSolver(
            lambda xx, tt, mask_token=None, cfg_on=True, **mkw: cfg_fn(
                xx, tt * schedule.N, context, mask_token=mask_token,
                cfg_on=cfg_on, **mkw),
            ns, predict_x0=True, accel_tau=accel, cfg_interval=interval,
            mask_guidance_hold=hold,
        )
        k1, k2 = jax.random.split(key)
        z = jax.random.normal(k1, (batch, geo["img"], geo["img"], 4))
        m = jax.random.normal(k2, (batch, geo["mask"], geo["mask"], 8))
        z0, pred_mask = solver.sample(
            z, steps=50, eps=1.0 / 1000, T=1.0, order=3, method="fast",
            mask_token=m,
        )
        img = vae.apply(vae_params, z0, method="decode")
        return img, pred_mask

    return pipeline, params, vae_params


def run_mode(batch, accel, interval, gelu=False, hold=False):
    pipeline, params, vae_params = build(batch, accel, interval, gelu, hold)
    key = jax.random.PRNGKey(7)
    ctx = jnp.zeros((batch, 77, 768))

    def run():
        img, pm = pipeline(params, vae_params, key, ctx)
        float(jnp.sum(img[:1, ::64, ::64, :]))  # force sync
        return img, pm

    run()  # compile
    times, img, pm = [], None, None
    for _ in range(3):
        t0 = time.perf_counter()
        img, pm = run()
        times.append(time.perf_counter() - t0)
    return (batch / min(times), np.asarray(img, np.float32),
            np.asarray(pm, np.float32))


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    modes = sys.argv[1:] or ["accel=0.2", "combo=0.2:0.0,0.5"]

    ips0, img0, pm0 = run_mode(batch, 0.0, None)
    print(f"exact panoptic protocol: {ips0:.2f} img+mask/s")
    bits0 = pm0 > 0.0

    for mode in modes:
        kind, _, val = mode.partition("=")
        if kind == "accel":
            ips, img, pm = run_mode(batch, float(val), None)
        elif kind == "interval":
            ips, img, pm = run_mode(batch, 0.0, tuple(float(v) for v in val.split(",")))
        elif kind == "combo":
            tau, _, iv = val.partition(":")
            ips, img, pm = run_mode(batch, float(tau),
                                    tuple(float(v) for v in iv.split(",")))
        elif kind == "gelu":  # gelu=tanh (nnet.gelu_approx)
            assert val == "tanh", f"gelu mode only supports 'tanh', got {val!r}"
            ips, img, pm = run_mode(batch, 0.0, None, gelu=True)
        elif kind == "gelu_accel":  # interval-free combo: the panoptic
            ips, img, pm = run_mode(batch, float(val), None, gelu=True)
            # recommended configuration (round-3 gate: intervals shift the
            # trained mask-id distribution; gelu+accel pass)
        elif kind == "full":  # full=<tau>:<lo>,<hi> — tanh GELU + accel + interval
            tau, _, iv = val.partition(":")
            ips, img, pm = run_mode(batch, float(tau),
                                    tuple(float(v) for v in iv.split(",")),
                                    gelu=True)
        elif kind == "ihold":  # ihold=<lo>,<hi> — interval + mask-guidance hold
            ips, img, pm = run_mode(batch, 0.0,
                                    tuple(float(v) for v in val.split(",")),
                                    hold=True)
        elif kind == "full_hold":  # full_hold=<tau>:<lo>,<hi> — gelu+accel+
            tau, _, iv = val.partition(":")  # interval with the mask hold
            ips, img, pm = run_mode(batch, float(tau),
                                    tuple(float(v) for v in iv.split(",")),
                                    gelu=True, hold=True)
        else:
            raise SystemExit(f"unknown mode {mode}")
        rel_img = float(np.linalg.norm(img - img0)) / float(np.linalg.norm(img0))
        rel_mask = float(np.linalg.norm(pm - pm0)) / float(np.linalg.norm(pm0))
        flips = float(np.mean((pm > 0.0) != bits0))
        print(
            f"{mode:18s}: {ips:6.2f} img+mask/s ({ips / ips0:.2f}x)  "
            f"img dev {100 * rel_img:.2f}%  mask dev {100 * rel_mask:.2f}%  "
            f"bit flips {100 * flips:.2f}%"
        )


if __name__ == "__main__":
    main()
