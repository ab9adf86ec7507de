#!/usr/bin/env python
"""Headline benchmark: ImageNet-256 U-ViT-L/2 50-step DPM-Solver++ sampling.

Protocol (BASELINE.md): 50-NFE order-3 DPM-Solver-fast with classifier-free
guidance (CFG scale 0.4, null class 1000) and the SD KL-VAE decode — the exact
configuration of the reference's published ImageNet-256 FID protocol
(reference `configs/imagenet256_uvit_large.py`, `train_ldm_discrete.py`).
Weights are randomly initialized (throughput is weight-independent) and passed
as ARGUMENTS to the jitted pipeline (closure-captured weights would be baked
into the program as constants).

The whole pipeline — fused 2x-batch CFG forward, all solver steps, VAE decode —
compiles into ONE XLA program; the reference instead runs a Python loop with two
network calls per NFE (`dpm_solver_pp.py:1031-1043`).

vs_baseline: measured images/sec/chip divided by an estimated A100 reference
throughput for the same protocol.  The reference publishes no speed numbers
(SURVEY.md par.6), so the denominator is a compute-model estimate, documented
here: U-ViT-L/2 is ~287M params, ~159 GFLOPs/forward at 258 tokens; 100 forwards
+ VAE decode is ~17.4 TFLOPs/image; PyTorch eager fp16 sampling on A100 (312
TFLOP/s peak) at a typical 20-30%% MFU gives ~4 img/s.  A100_BASELINE_EST = 4.0.
Error bars (round 4, scripts/bracket_a100_baseline.py + BASELINE.md): the
FLOP numerator is validated by XLA cost analysis (154.6 GF/fwd) and a CPU
measurement of the reference's own network bounds eager efficiency from
above; the bracket is A100 in [3.2, 7.2] img/s, so multiply vs_baseline by
[0.56, 1.24] for the bounds.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

A100_BASELINE_EST = 4.0  # img/s/chip, see module docstring

# The recommended accelerated operating point for the image flagship —
# knobs, display name, and the quality-gate spec key certifying it
# (quality_gate/trained_L/report.json), kept in one place so recommendation
# and certification cannot drift apart (round-4 verdict weak #1).
# Round 5: tanh GELU + forecast-skip tau=0.2, NO guidance interval — the
# flagship-scale gate measures interval=(0.0,0.5) alone at 36.7x the
# 25-NFE control's latent shift (FAIL; the old interval-containing combo
# was 36.3x), while this pair sits at 1.57x (PASS), mirroring the round-3
# panoptic demotion.  See samplers/speed_budget.py and BENCH.md round 5.
RECOMMENDED_MODE_NAME = "gelu_approx+accel0.2"
RECOMMENDED_MODE_SPEC = "gelu_accel=0.2"
# cfg_interval=() = explicitly OFF (None would mean "defer to the
# BENCH_CFG_INTERVAL env var" in build_pipeline)
RECOMMENDED_KNOBS = dict(accel=0.2, cfg_interval=(), gelu=True)

import jax

# Persistent compilation cache: recompiles after the first run are seconds.
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def build_components():
    """The headline protocol's pieces (model, params, vae, schedule, noise
    schedule) — shared with scripts/bench_breakdown.py so component timings
    measure EXACTLY the objects the headline pipeline runs."""
    from panopticdiffusionmodels_tpu.diffusion import (
        Schedule,
        stable_diffusion_beta_schedule,
    )
    from panopticdiffusionmodels_tpu.models import UViT
    from panopticdiffusionmodels_tpu.models.vae import get_model as get_vae
    from panopticdiffusionmodels_tpu.samplers import NoiseScheduleVP

    model = UViT(
        img_size=32, patch_size=2, in_chans=4, embed_dim=1024, depth=20,
        num_heads=16, num_classes=1001, dtype=jnp.bfloat16, scan_blocks=True,
        attn_impl="infer",  # packed-qkv Pallas kernel on the sampling hot path
        # BENCH_GELU=tanh: opt-in tanh GELU (headline default stays the
        # reference's exact erf; see BENCH.md op ablation)
        gelu_approx=os.environ.get("BENCH_GELU", "") == "tanh",
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 4)), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
    )
    vae = get_vae(dtype=jnp.bfloat16)
    vae_params = jax.jit(
        lambda k: vae.init(k, jnp.zeros((1, 32, 32, 4)), method="decode")
    )(jax.random.PRNGKey(1))

    betas = stable_diffusion_beta_schedule()
    schedule = Schedule(betas)
    ns = NoiseScheduleVP("discrete", betas=betas)
    return model, params, vae, vae_params, schedule, ns


def build_pipeline(batch_size: int, components=None, accel=None,
                   cfg_interval=None, gelu=None):
    from panopticdiffusionmodels_tpu.diffusion.cfg import make_cfg_class_cond
    from panopticdiffusionmodels_tpu.samplers import DPMSolver

    model, params, vae, vae_params, schedule, ns = components or build_components()

    # Opt-in speed modes (the headline protocol keeps all three off):
    #   BENCH_ACCEL=<tau>            forecast-skip threshold
    #   BENCH_CFG_INTERVAL=lo,hi     guidance interval in t (arXiv:2404.07724)
    #   BENCH_GELU=tanh              tanh GELU (via build_components)
    # or explicit args (the recommended-mode second run below).
    if cfg_interval is None:
        ci_env = os.environ.get("BENCH_CFG_INTERVAL", "")
        cfg_interval = (
            tuple(float(v) for v in ci_env.split(",")) if ci_env else None
        )
    cfg_interval = tuple(cfg_interval) if cfg_interval else None
    if accel is None:
        accel = float(os.environ.get("BENCH_ACCEL", "0"))
    if gelu is not None and gelu != model.gelu_approx:
        # params are layout-identical across the gelu flag; clone the model
        model = model.clone(gelu_approx=gelu)

    @jax.jit
    def pipeline(params, vae_params, key, y):
        cfg_fn = make_cfg_class_cond(
            lambda xx, tt, yy: model.apply(params, xx, tt, yy),
            null_label=1000, scale=0.4, enabled=True,
        )
        solver = DPMSolver(
            lambda xx, tt, mask_token=None, cfg_on=True: cfg_fn(
                xx, tt * schedule.N, y, cfg_on=cfg_on),
            ns, predict_x0=True,
            accel_tau=accel,
            cfg_interval=cfg_interval,
        )
        z = jax.random.normal(key, (batch_size, 32, 32, 4))
        # BENCH_STEPS: off-protocol NFE counts (the quality gate's positive
        # control uses 25 to prove the FD proxy detects real distribution
        # shifts); the headline protocol is and stays 50.
        z0 = solver.sample(
            z, steps=int(os.environ.get("BENCH_STEPS", "50")),
            eps=1.0 / 1000, T=1.0, order=3, method="fast",
        )
        img = vae.apply(vae_params, z0, method="decode")
        return img

    return pipeline, params, vae_params


def gate_certification(report_path, mode_spec):
    """(verdict, certifiable) for a recommended mode against a quality-gate
    report.  The cases are distinct (ADVICE round 4 + round-5 arming):
      - report file absent/unreadable -> ("UNMEASURED", False): no
        certification claim at all;
      - report present but the mode never gated -> ("UNMEASURED", True):
        the report is citable but carries no verdict for this mode;
      - report present but NO channel armed by that instance's NFE
        dose-response -> ("UNARMED", False): round-4 lesson — an unarmed
        PASS is a blind spot, not a certificate;
      - otherwise the mode's armed verdict (PASS/MARGINAL/FAIL/UNARMED)."""
    try:
        with open(report_path) as f:
            rep = json.load(f)
    except (OSError, ValueError):
        return "UNMEASURED", False
    entry = rep.get("modes", {}).get(mode_spec)
    if entry is None:
        return "UNMEASURED", True
    if not rep.get("report_armed", False):
        return "UNARMED", False
    return entry["verdict"], True


def _time_pipeline(pipeline, params, vae_params, batch_size, reps):
    key = jax.random.PRNGKey(42)
    y = jnp.zeros((batch_size,), jnp.int32)

    # warmup / compile.  On remote-tunnel backends block_until_ready may not
    # actually block, so force a device->host scalar transfer to serialize.
    def run(k):
        img = pipeline(params, vae_params, k, y)
        return float(jnp.sum(img[:, ::64, ::64, :]))

    run(key)
    times = []
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        run(k)
        times.append(time.perf_counter() - t0)
    return batch_size / min(times)


def main():
    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    components = build_components()
    pipeline, params, vae_params = build_pipeline(batch_size, components)
    imgs_per_sec = _time_pipeline(pipeline, params, vae_params, batch_size,
                                  reps)
    record = {
        "metric": "imagenet256_uvitL_50step_dpmpp_cfg_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / A100_BASELINE_EST, 3),
    }

    # The recommended gate-PASSED speed mode for this (image-only flagship)
    # geometry (see RECOMMENDED_* above).  Certification: distribution-level
    # quality gate at the SAME U-ViT-L/2 geometry on weights TRAINED on
    # chip, judged only by channels ARMED by that instance's NFE
    # dose-response (quality_gate/trained_L/report.json; BENCH.md round 5).
    # Exact protocol stays the headline "value"; this records the certified
    # accelerated operating point alongside it.
    if os.environ.get("BENCH_RECOMMENDED", "on") != "off":
        rec_pipeline, _, _ = build_pipeline(
            batch_size, components, **RECOMMENDED_KNOBS,
        )
        rec = _time_pipeline(rec_pipeline, params, vae_params, batch_size,
                             reps)
        record.update(
            recommended_mode=RECOMMENDED_MODE_NAME,
            recommended_value=round(rec, 3),
            recommended_vs_baseline=round(rec / A100_BASELINE_EST, 3),
        )
        report_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "quality_gate", "trained_L", "report.json")
        verdict, certified = gate_certification(report_path,
                                                RECOMMENDED_MODE_SPEC)
        record["recommended_gate_verdict"] = verdict
        if certified:
            record["recommended_certification"] = (
                "quality_gate/trained_L/report.json")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
