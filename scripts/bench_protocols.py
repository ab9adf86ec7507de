#!/usr/bin/env python
"""Secondary sampling-protocol benchmarks: ImageNet-512 L/4, 256 H/2, 512 H/4.

The headline (bench.py) is ImageNet-256 U-ViT-L/2.  The reference publishes
FID protocols for three more class-conditional latent pipelines
(reference `configs/imagenet512_uvit_large.py`, `imagenet256_uvit_huge.py`,
`imagenet512_uvit_huge.py`): same 50-NFE order-3 DPM-Solver-fast + CFG +
KL-VAE decode, different transformer geometry / latent size / CFG scale.

    protocol   latents     model                  CFG   decode
    512L       64x64x4     L/4  (1024 x 20, d64)  0.7   512^2
    256H       32x32x4     H/2  (1152 x 28, d72)  0.4   256^2
    512H       64x64x4     H/4  (1152 x 28, d72)  0.7   512^2

All run the packed-qkv Pallas kernel (attn_impl='infer'); the H models have
head_dim 72 (lane-unaligned slices), so the script first prints kernel-vs-XLA
parity at the protocol's exact attention shape before timing.

Usage: python scripts/bench_protocols.py [512L|256H|512H]
Honors BENCH_BATCH / BENCH_ACCEL / BENCH_CFG_INTERVAL like bench.py.
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

PROTOCOLS = {
    # img_size, patch, embed_dim, depth, heads, cfg_scale, default batch
    "512L": dict(img_size=64, patch_size=4, embed_dim=1024, depth=20,
                 num_heads=16, cfg_scale=0.7, batch=16),
    "256H": dict(img_size=32, patch_size=2, embed_dim=1152, depth=28,
                 num_heads=16, cfg_scale=0.4, batch=16),
    "512H": dict(img_size=64, patch_size=4, embed_dim=1152, depth=28,
                 num_heads=16, cfg_scale=0.7, batch=16),
}


def kernel_parity(l, heads, d):
    """Kernel-vs-XLA rel deviation at this protocol's attention shape."""
    from panopticdiffusionmodels_tpu.ops.attention import attention_qkv

    c = heads * d
    qkv = (jax.random.normal(jax.random.PRNGKey(0), (4, l, 3 * c)) * 0.5
           ).astype(jnp.bfloat16)
    x = np.asarray(jax.jit(lambda q: attention_qkv(q, heads, impl="xla"))(qkv),
                   np.float32)
    p = np.asarray(jax.jit(lambda q: attention_qkv(q, heads, impl="pallas"))(qkv),
                   np.float32)
    return float(np.linalg.norm(p - x) / np.linalg.norm(x))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "512L"
    proto = PROTOCOLS[name]
    batch = int(os.environ.get("BENCH_BATCH", str(proto["batch"])))

    from panopticdiffusionmodels_tpu.diffusion import (
        Schedule,
        stable_diffusion_beta_schedule,
    )
    from panopticdiffusionmodels_tpu.diffusion.cfg import make_cfg_class_cond
    from panopticdiffusionmodels_tpu.models import UViT
    from panopticdiffusionmodels_tpu.models.vae import get_model as get_vae
    from panopticdiffusionmodels_tpu.samplers import DPMSolver, NoiseScheduleVP

    g = proto["img_size"] // proto["patch_size"]
    l = g * g + 2  # time + label + patches
    d = proto["embed_dim"] // proto["num_heads"]
    if jax.default_backend() == "tpu":
        print(f"{name}: kernel parity at L={l} H={proto['num_heads']} D={d}: "
              f"rel dev {kernel_parity(l, proto['num_heads'], d):.2e}")

    model = UViT(
        img_size=proto["img_size"], patch_size=proto["patch_size"], in_chans=4,
        embed_dim=proto["embed_dim"], depth=proto["depth"],
        num_heads=proto["num_heads"], num_classes=1001, dtype=jnp.bfloat16,
        scan_blocks=True, attn_impl="infer",
        gelu_approx=os.environ.get("BENCH_GELU", "") == "tanh",
    )
    s = proto["img_size"]
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, s, s, 4)), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
    )
    vae = get_vae(dtype=jnp.bfloat16)
    vae_params = jax.jit(
        lambda k: vae.init(k, jnp.zeros((1, s, s, 4)), method="decode")
    )(jax.random.PRNGKey(1))

    betas = stable_diffusion_beta_schedule()
    schedule = Schedule(betas)
    ns = NoiseScheduleVP("discrete", betas=betas)
    ci_env = os.environ.get("BENCH_CFG_INTERVAL", "")
    cfg_interval = tuple(float(v) for v in ci_env.split(",")) if ci_env else None

    @jax.jit
    def pipeline(params, vae_params, key, y):
        cfg_fn = make_cfg_class_cond(
            lambda xx, tt, yy: model.apply(params, xx, tt, yy),
            null_label=1000, scale=proto["cfg_scale"], enabled=True,
        )
        solver = DPMSolver(
            lambda xx, tt, mask_token=None, cfg_on=True: cfg_fn(
                xx, tt * schedule.N, y, cfg_on=cfg_on),
            ns, predict_x0=True,
            accel_tau=float(os.environ.get("BENCH_ACCEL", "0")),
            cfg_interval=cfg_interval,
        )
        z = jax.random.normal(key, (batch, s, s, 4))
        z0 = solver.sample(z, steps=50, eps=1.0 / 1000, T=1.0, order=3, method="fast")
        return vae.apply(vae_params, z0, method="decode")

    key = jax.random.PRNGKey(42)
    y = jnp.zeros((batch,), jnp.int32)

    def run(k):
        img = pipeline(params, vae_params, k, y)
        return float(jnp.sum(img[:1, ::128, ::128, :]))

    run(key)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(jax.random.fold_in(key, i))
        times.append(time.perf_counter() - t0)
    res = proto["img_size"] * 8
    print(f"imagenet{res} uvit-{name[-1]}/{proto['patch_size']} 50-NFE CFG "
          f"{proto['cfg_scale']} + {res}-decode, batch {batch}: "
          f"{batch / min(times):.2f} img/s")


if __name__ == "__main__":
    main()
