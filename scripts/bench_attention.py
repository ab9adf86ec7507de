#!/usr/bin/env python
"""Microbench: packed-qkv Pallas attention vs XLA, isolated and in situ.

Run on the real TPU chip (one process at a time).  Timing forces a
device->host scalar transfer (tunnel block_until_ready may not block).
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


def timeit(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.sum(jnp.ravel(out)[:8]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jnp.ravel(out)[:8]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_isolated():
    from panopticdiffusionmodels_tpu.ops.attention import attention_qkv

    for (b, l, heads, d) in [(32, 258, 16, 64), (32, 590, 8, 64), (64, 258, 16, 64)]:
        c = heads * d
        qkv = jax.random.normal(jax.random.PRNGKey(0), (b, l, 3 * c), jnp.bfloat16)
        f_x = jax.jit(lambda q: attention_qkv(q, heads, impl="xla"))
        f_p = jax.jit(lambda q: attention_qkv(q, heads, impl="pallas"))
        tx = timeit(f_x, qkv)
        tp = timeit(f_p, qkv)
        print(f"isolated B{b} L{l} H{heads}: xla {tx*1e3:.3f} ms | pallas {tp*1e3:.3f} ms"
              f" | speedup {tx/tp:.2f}x")


def bench_insitu():
    from panopticdiffusionmodels_tpu.models import UViT

    b = 32
    for impl in ("xla", "infer"):
        model = UViT(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                     depth=20, num_heads=16, num_classes=1001,
                     dtype=jnp.bfloat16, scan_blocks=True, attn_impl=impl)
        x = jnp.zeros((b, 32, 32, 4))
        t = jnp.full((b,), 500.0)
        y = jnp.zeros((b,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1], t[:1], y[:1])

        def fwd(p, x, t, y):
            return model.apply(p, x, t, y)

        f = jax.jit(fwd)
        tt = timeit(f, params, x, t, y)
        gf = 21 * (2 * 258 * 1024 * 3072 + 2 * 258 * 1024 * 1024 +
                   4 * 258 * 258 * 1024 + 2 * 2 * 258 * 1024 * 4096) * b / 1e9
        print(f"UViT-L fwd B{b} attn_impl={impl}: {tt*1e3:.2f} ms "
              f"({gf/tt/1e3:.1f} TF/s)")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    bench_isolated()
    bench_insitu()
