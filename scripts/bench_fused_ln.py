#!/usr/bin/env python
"""In-situ A/B: shipped packed-qkv boundary vs the fused LN+QKV+attention
prototype, on a UViT-L-shaped 20-block chain (round-3 verdict item: fold the
pre-attention LayerNorm / qkv GEMM into the kernel region and measure).

Both variants run the EXACT block structure of the flagship forward
(pre-norm attention with residual, pre-norm erf-GELU MLP with residual,
bf16 compute, L=258, C=1024, 16 heads, 20 blocks under lax.scan) with the
same weights; only the attention-path boundary differs:

  A (shipped): XLA LayerNorm -> XLA qkv GEMM -> pallas attention
  B (fused):   pallas [LayerNorm + qkv GEMM + attention]

Reports ms/forward for each at the requested batches plus the max relative
output deviation (bf16-noise scale expected).  One TPU process at a time.

Usage: python scripts/bench_fused_ln.py [batches...]   (default: 32 64)
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

from panopticdiffusionmodels_tpu.ops.pallas.fused_ln_qkv_attention import (
    fused_ln_qkv_attention,
)
from panopticdiffusionmodels_tpu.ops.pallas.fused_qkv_attention import (
    fused_attention_qkv,
)

L, C, HEADS, DEPTH = 258, 1024, 16, 20
SCALE = (C // HEADS) ** -0.5


def make_weights(key):
    ks = jax.random.split(key, 8)
    s = 0.02
    return dict(
        ln1_s=jnp.ones((DEPTH, C), jnp.float32),
        ln1_b=jnp.zeros((DEPTH, C), jnp.float32),
        w_qkv=(s * jax.random.normal(ks[0], (DEPTH, C, 3 * C))).astype(jnp.bfloat16),
        w_proj=(s * jax.random.normal(ks[1], (DEPTH, C, C))).astype(jnp.bfloat16),
        b_proj=jnp.zeros((DEPTH, C), jnp.bfloat16),
        ln2_s=jnp.ones((DEPTH, C), jnp.float32),
        ln2_b=jnp.zeros((DEPTH, C), jnp.float32),
        w1=(s * jax.random.normal(ks[2], (DEPTH, C, 4 * C))).astype(jnp.bfloat16),
        b1=jnp.zeros((DEPTH, 4 * C), jnp.bfloat16),
        w2=(s * jax.random.normal(ks[3], (DEPTH, 4 * C, C))).astype(jnp.bfloat16),
        b2=jnp.zeros((DEPTH, C), jnp.bfloat16),
    )


def layernorm(x, s, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * s + b).astype(x.dtype)


def mlp(x, w, s2, b2m, w1, b1m, w2, b2):
    h = layernorm(x, s2, b2m)
    h = jax.nn.gelu(h @ w1 + b1m, approximate=False)
    return x + h @ w2 + b2


def chain(variant):
    def block(x, w):
        if variant == "fused":
            a = fused_ln_qkv_attention(
                x, w["ln1_s"], w["ln1_b"], w["w_qkv"], HEADS, SCALE)
        else:
            xn = layernorm(x, w["ln1_s"], w["ln1_b"])
            a = fused_attention_qkv(xn @ w["w_qkv"], HEADS, SCALE)
        x = x + a @ w["w_proj"] + w["b_proj"]
        x = mlp(x, w, w["ln2_s"], w["ln2_b"], w["w1"], w["b1"], w["w2"], w["b2"])
        return x, None

    @jax.jit
    def fwd(weights, x):
        out, _ = jax.lax.scan(block, x, weights)
        return out

    return fwd


def main():
    batches = [int(a) for a in sys.argv[1:]] or [32, 64]
    weights = make_weights(jax.random.PRNGKey(0))
    for b in batches:
        x = (0.5 * jax.random.normal(jax.random.PRNGKey(1), (b, L, C))).astype(
            jnp.bfloat16)
        outs = {}
        for variant in ("shipped", "fused"):
            fwd = chain(variant)
            run = lambda: float(jnp.sum(fwd(weights, x)[:1, ::64, ::64].astype(jnp.float32)))
            run()  # compile
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                run()
                times.append(time.perf_counter() - t0)
            outs[variant] = np.asarray(fwd(weights, x), np.float32)
            print(f"B={b} {variant:8s}: {1e3 * min(times):7.2f} ms/fwd")
        ref, new = outs["shipped"], outs["fused"]
        rel = float(np.linalg.norm(new - ref) / np.linalg.norm(ref))
        print(f"B={b} rel deviation fused vs shipped: {100 * rel:.3f}%")


if __name__ == "__main__":
    main()
