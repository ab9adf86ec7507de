#!/usr/bin/env python
"""Bracket the A100 baseline estimate behind bench.py's `vs_baseline`.

The reference publishes no speed numbers (SURVEY.md §6), so bench.py divides
by a compute-model estimate (A100_BASELINE_EST = 4.0 img/s for the ImageNet-256
U-ViT-L/2 50-NFE CFG protocol).  That is a single point; this script puts
MEASURED error bars around it (VERDICT round 3, weak #6 / task 7):

1. FLOP-model validation: the model says one U-ViT-L/2 forward at 258 tokens
   is ~159 GFLOPs (so the protocol is ~17.4 TFLOPs/img: 100 CFG forwards +
   VAE decode).  Validated two independent ways: (a) an analytic GEMM
   enumeration here, (b) XLA's own compiled cost analysis of OUR UViT-L
   forward (a separate implementation of the same architecture).  Agreement
   within a few % certifies the denominator's FLOP numerator.

2. Eager-efficiency UPPER BOUND: what fraction of the machine's practical
   GEMM rate does the REFERENCE'S OWN torch network (`libs/uvit.py`) achieve
   eagerly, measured on CPU against `torch.mm` at the model's dominant GEMM
   shapes?  On CPU, GEMMs are so slow that per-op overhead is maximally
   hidden — on an A100 the GEMMs get ~1000x faster while python dispatch,
   kernel launches and memory-bound elementwise ops shrink far less, so
   eager_rel(CPU) is a strict UPPER bound on eager_rel(A100).  This bounds
   the baseline from above: A100 img/s <= 312 TF/s x cublas_frac_hi x
   eager_rel(CPU) / 17.4 TF.

3. Bracket: the lower edge takes the low end of published/typical eager-mode
   ViT inference MFU (~18%), the upper edge the CPU-derived ceiling capped
   at 40% MFU (eager fp16 diffusion loops with per-step host syncs and
   two separate CFG forwards per NFE — reference `dpm_solver_pp.py:1031` —
   do not exceed this in practice).  The point estimate 4.0 (23% MFU) is
   documented in bench.py.

NOTE: run on an otherwise QUIET machine — concurrent jobs skew both the
eager and the GEMM timings.  Prints one JSON line recorded in BASELINE.md.
"""
import json
import os
import sys
import time
import types

sys.path.insert(0, "/root/reference")

for _name, _attrs in [
    ("torchvision", {}),
    ("torchvision.utils", {"save_image": None, "make_grid": None,
                           "draw_segmentation_masks": None}),
    ("wandb", {"log": lambda *a, **k: None}),
    ("panopticapi", {}),
    ("panopticapi.utils", {"IdGenerator": object}),
]:
    if _name not in sys.modules:
        _mod = types.ModuleType(_name)
        for _k, _v in _attrs.items():
            setattr(_mod, _k, _v)
        sys.modules[_name] = _mod

import numpy as np
import torch

import libs.uvit as ref_uvit  # the reference's own network

torch.manual_seed(0)

PROTO_TFLOPS_PER_IMG = 17.4  # 100 x UViT-L fwd + VAE decode (bench.py)
A100_PEAK_TFLOPS = 312.0     # fp16/bf16 tensor core
CUBLAS_FRAC_HI = 0.75        # cuBLAS fraction of peak at these GEMM shapes
MFU_LO = 0.18                # low end of eager ViT-inference MFU
MFU_CAP = 0.40               # practical ceiling for eager diffusion loops


def uvit_flops(embed, depth, l=258, mlp_ratio=4):
    """Dense-GEMM FLOPs of one forward (batch 1), 2*m*n*k per GEMM."""
    per_block = (
        2 * l * embed * 3 * embed        # qkv
        + 2 * l * l * embed * 2          # QK^T + PV
        + 2 * l * embed * embed          # proj
        + 2 * l * embed * mlp_ratio * embed * 2  # mlp fc1+fc2
    )
    skip = 2 * l * 2 * embed * embed     # skip_linear on depth/2 out blocks
    return depth * per_block + (depth // 2) * skip


def build(embed, depth, heads):
    m = ref_uvit.UViT(
        img_size=32, patch_size=2, in_chans=4, embed_dim=embed, depth=depth,
        num_heads=heads, mlp_ratio=4.0, qkv_bias=False, mlp_time_embed=False,
        num_classes=1001,
    ).eval()
    return m


def time_forward(model, batch, reps=3):
    x = torch.randn(batch, 4, 32, 32)
    t = torch.full((batch,), 500.0)
    y = torch.randint(0, 1000, (batch,))
    with torch.no_grad():
        model(x, t, y)  # warmup
        return min(_timed(model, x, t, y) for _ in range(reps))


def _timed(model, x, t, y):
    t0 = time.perf_counter()
    model(x, t, y)
    return time.perf_counter() - t0


def gemm_rate(shapes, dtype=torch.float32, reps=3):
    """Practical torch.mm FLOP/s at the model's dominant GEMM shapes."""
    rates = []
    for (m, k, n) in shapes:
        a = torch.randn(m, k, dtype=dtype)
        b = torch.randn(k, n, dtype=dtype)
        torch.mm(a, b)
        best = min(_timed_mm(a, b) for _ in range(reps))
        rates.append(2 * m * k * n / best)
    return float(np.mean(rates))


def _timed_mm(a, b):
    t0 = time.perf_counter()
    torch.mm(a, b)
    return time.perf_counter() - t0


def xla_flop_count():
    """XLA's own cost analysis of OUR UViT-L/2 forward (batch 1) — an
    independent check of the analytic GEMM count."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from panopticdiffusionmodels_tpu.models import UViT

    # scan_blocks=False: XLA's cost analysis counts a scan body ONCE, not
    # trip-count times — the unrolled graph gives the true per-forward count.
    model = UViT(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                 depth=20, num_heads=16, num_classes=1001,
                 dtype=jnp.float32, scan_blocks=False, attn_impl="xla")
    x = jnp.zeros((1, 32, 32, 4))
    t = jnp.zeros((1,))
    y = jnp.zeros((1,), jnp.int32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, y)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    compiled = jax.jit(model.apply).lower(params, x, t, y).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def main():
    batch = int(os.environ.get("BRACKET_BATCH", "8"))
    torch.set_num_threads(os.cpu_count())

    # --- 1. FLOP-model validation: analytic GEMM count vs XLA's analysis ---
    fL = uvit_flops(1024, 20)
    xla_flops = xla_flop_count()

    # --- 2. eager efficiency upper bound, reference network on CPU ---
    tL = time_forward(build(1024, 20, 16), batch)
    l, e = 258, 1024
    shapes = [(batch * l, e, 3 * e), (batch * l, e, e),
              (batch * l, e, 4 * e), (batch * l, 4 * e, e)]
    gemm = gemm_rate(shapes)
    achieved = batch * fL / tL
    eager_rel = achieved / gemm
    mfu_ceiling = min(CUBLAS_FRAC_HI * eager_rel, MFU_CAP)

    # --- 3. bracket ---
    img_lo = A100_PEAK_TFLOPS * MFU_LO / PROTO_TFLOPS_PER_IMG
    img_hi = A100_PEAK_TFLOPS * mfu_ceiling / PROTO_TFLOPS_PER_IMG
    print(json.dumps({
        "analytic_gemm_gflops_L2_fwd": round(fL / 1e9, 1),
        "xla_cost_analysis_gflops_L2_fwd": round(xla_flops / 1e9, 1),
        "cpu_eager_fwd_ms_L2": round(tL * 1e3, 1),
        "cpu_gemm_rate_gflops": round(gemm / 1e9, 1),
        "eager_achieved_gflops": round(achieved / 1e9, 1),
        "eager_rel_efficiency_upper_bound": round(eager_rel, 3),
        "a100_mfu_bracket": [MFU_LO, round(mfu_ceiling, 3)],
        "a100_bracket_img_per_s": [round(img_lo, 2), round(img_hi, 2)],
        "point_estimate_in_bench": 4.0,
    }))


if __name__ == "__main__":
    main()
