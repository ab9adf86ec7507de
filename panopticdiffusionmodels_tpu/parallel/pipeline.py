"""Pipeline parallelism over the U-ViT's long-skip depth: the 'pp' mesh axis.

The reference has no pipeline story at all (its only distributed strategy is
DDP via accelerate, reference `run_commands.sh:14-38`); this is a TPU-native
capability extension for models whose PARAMETERS outgrow one chip even with
fsdp.  The design exploits the U-ViT skip structure instead of fighting it:

**Boomerang stage decomposition.**  A U-ViT of depth 2H+1 is H in-blocks, a
mid block, and H out-blocks, with LIFO long skips: in-block i feeds out-block
H-1-i (reference `libs/uvit.py:221-222`).  With P stages and k = H/P layers
per stage, stage s owns in-blocks [s*k, (s+1)*k) AND out-blocks
[H-(s+1)*k, H-s*k) — exactly the out-blocks that consume stage s's own
skips.  Consequence: **long skips never cross a stage boundary**; the only
inter-stage traffic is the (B_micro, L, C) token activation, travelling
"down" (s -> s+1) through the in-half and "back up" (s -> s-1) through the
out-half.  The mid block rides on the last stage.

**Schedule.**  One `lax.scan` over T = M + 2P - 2 ticks (M microbatches).
Every tick, every stage runs its k-layer in-slice on one microbatch AND its
k-layer out-slice on another (the last stage also runs mid), then ppermutes
the down-activation forward and the up-activation backward.  Microbatch u
enters stage 0 at tick u, turns around at tick u+P-1, and leaves stage 0 at
tick u+2P-2, so stage s's skips for u are produced at tick u+s and consumed
at tick u+2(P-1)-s: a ring buffer of S = 2P-1 slots with per-stage read
delay 2*(P-1-s) holds them.  Steady-state utilization is M/(M+2P-2).

**Out-slice layout.**  The canonical stacked out-params (axis 0 = global out
layer 0..H-1) are REVERSED before entering the pipeline so that the plain
P('pp') shard of stage s contains its own out-layers; the local slice is
then scanned with reverse=True, which makes local row r pair with local skip
row r (derivation: global out layer o = H-1-(s*k+r) consumes in layer
H-1-o = s*k+r).

**SPMD mechanics.**  One `jax.shard_map` over the full mesh; block params
enter P('pp')-sharded on the stacked-layer axis (also the param-memory win:
each device holds 1/P of the block stack), microbatched tokens enter
replicated over pp and sharded over (dp, fsdp) on batch; collectives are two
ppermutes per tick plus one final psum that replicates the collected stage-0
outputs.  Autodiff goes straight through the scan + ppermute (transpose of a
ppermute is the inverse permute), so one `jax.grad` of the usual loss trains
the pipeline with gradient accumulation over microbatches emerging from the
scan's backward pass — no hand-written pipelined backward.

Scope (v1): the training path of the scanned (`scan_blocks=True`) U-ViT
families, composing with dp/fsdp batch sharding.  sp and tp must be 1 with
pp > 1 (the block bodies run under manual SPMD here, outside the automatic
partitioner those axes rely on).  Sampling under a pp mesh keeps the plain
`nnet.apply` path: the partitioner gathers the layer-sharded stacks
just-in-time, which is correct and adequate for eval-time batch sizes.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

DATA_AXES = ("dp", "fsdp")


def _tree_select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def pipeline_blocks(
    tokens: Any,
    in_params: Any,
    out_params: Any,
    mid_params: Any,
    *,
    mesh: Mesh,
    num_micro: int,
    down_fn: Callable[[Any, Any], tuple],
    up_fn: Callable[[Any, Any, Any], Any],
    mid_fn: Callable[[Any, Any], Any],
    remat: bool = False,
):
    """Run the block trunk (in-stack -> mid -> out-stack) as a P-stage pipeline.

    tokens: pytree of (B, ...) token activations (the embed output).
    in_params / out_params: pytrees with leading stacked-layer axis H
      (canonical order — out_params is reversed internally, see module doc).
    down_fn(layer_params, carry) -> (carry, skip)   — one in-layer.
    up_fn(layer_params, carry, skip) -> carry       — one out-layer.
    mid_fn(mid_params, carry) -> carry              — the turnaround.
    Returns the pytree of (B, ...) outputs, microbatch order restored.
    """
    pp = mesh.shape["pp"]
    leaves = jax.tree.leaves(in_params)
    half = leaves[0].shape[0]
    assert half % pp == 0, f"depth/2={half} not divisible by pp={pp}"
    k = half // pp
    S = 2 * pp - 1  # skip ring-buffer slots
    lead = 2 * pp - 2  # fill+drain latency in ticks
    T = num_micro + lead

    B = jax.tree.leaves(tokens)[0].shape[0]
    assert B % num_micro == 0, f"batch {B} not divisible by {num_micro} microbatches"

    # Stage-major reversal so P('pp') hands stage s its own out-layers.
    out_rev = jax.tree.map(lambda a: a[::-1], out_params)
    micro = jax.tree.map(
        lambda a: a.reshape(num_micro, B // num_micro, *a.shape[1:]), tokens
    )

    token_spec = P(None, DATA_AXES)  # (M, B_micro, ...) — replicated over pp

    def body(micro_l, in_l, out_l, mid_l):
        stage = jax.lax.axis_index("pp")
        delay = 2 * (pp - 1 - stage)

        down_step = jax.checkpoint(down_fn) if remat else down_fn
        up_step = jax.checkpoint(up_fn) if remat else up_fn
        mid_step = jax.checkpoint(mid_fn) if remat else mid_fn

        def in_slice(carry):
            return jax.lax.scan(lambda c, p: down_step(p, c), carry, in_l)

        def out_slice(carry, skips):
            def f(c, xs):
                p, s = xs
                return up_step(p, c, s), None

            c, _ = jax.lax.scan(f, carry, (out_l, skips), reverse=True)
            return c

        zero_carry = jax.tree.map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), micro_l
        )
        layer0 = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype), in_l
        )
        _, skip_struct = jax.eval_shape(down_fn, layer0, zero_carry)
        buf0 = jax.tree.map(
            lambda s: jnp.zeros((S, k, *s.shape), s.dtype), skip_struct
        )

        # Pad the feed with `lead` zero microbatches to drain the pipe.
        feed = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((lead, *a.shape[1:]), a.dtype)], axis=0
            ),
            micro_l,
        )

        def tick(state, xs):
            mb, t = xs
            down_in, up_in, buf = state
            # Stage 0 injects the next microbatch (zeros past the end — its
            # wrapped-around ppermute input is overwritten, so ring garbage
            # never propagates).
            down_in = _tree_select(stage == 0, mb, down_in)
            down_out, skips = in_slice(down_in)
            buf = jax.tree.map(
                lambda b, s: jax.lax.dynamic_update_index_in_dim(b, s, t % S, 0),
                buf,
                skips,
            )
            myskips = jax.tree.map(
                lambda b: jax.lax.dynamic_index_in_dim(
                    b, (t - delay) % S, 0, keepdims=False
                ),
                buf,
            )
            # Last stage turns around through mid in the SAME tick (delay 0
            # on its own skips); other stages take the ppermuted up-carry.
            up_start = _tree_select(stage == pp - 1, mid_step(mid_l, down_out), up_in)
            up_out = out_slice(up_start, myskips)
            fwd = [(s, (s + 1) % pp) for s in range(pp)]
            bwd = [(s, (s - 1) % pp) for s in range(pp)]
            down_next = jax.tree.map(
                lambda a: jax.lax.ppermute(a, "pp", fwd), down_out
            )
            up_next = jax.tree.map(lambda a: jax.lax.ppermute(a, "pp", bwd), up_out)
            return (down_next, up_next, buf), up_out

        state0 = (zero_carry, zero_carry, buf0)
        _, ys = jax.lax.scan(tick, state0, (feed, jnp.arange(T)))
        # Microbatch u leaves stage 0 at tick u + lead; other stages' emissions
        # are pipeline intermediates — mask and psum to replicate over pp.
        valid = jax.tree.map(
            lambda a: jax.lax.slice_in_dim(a, lead, lead + num_micro, axis=0), ys
        )
        # Keep the (M, B_micro, ...) layout — merging M here would interleave
        # wrongly with the batch sharding (local rows are strided, not
        # contiguous, in the merged global batch); merge outside instead.
        return jax.tree.map(
            lambda a: jax.lax.psum(
                jnp.where(stage == 0, a, jnp.zeros_like(a)), "pp"
            ),
            valid,
        )

    shmapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(token_spec, P("pp"), P("pp"), P()),
        out_specs=token_spec,
        check_vma=False,
    )
    out = shmapped(micro, in_params, out_rev, mid_params)
    return jax.tree.map(
        lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), out
    )


def make_pipelined_apply(nnet, mesh: Mesh, *, num_micro: int):
    """Build a drop-in replacement for `nnet.apply` whose block trunk runs as
    a 'pp'-staged pipeline (embed and head stay on the automatic-partitioner
    path; they are a few percent of the FLOPs and parallelize over batch).

    Works for the scanned (`scan_blocks=True`) U-ViT families; the per-layer
    bodies are the SAME `_BlockBody`/`_DualBody` modules the scanned stacks
    use, applied with per-layer slices of the stacked params, so pipelined
    math is bit-identical to the single-device scan.
    """
    # Lazy model imports: parallel.* must stay importable without models.*
    from ..models.layers import Block, ZeroConv
    from ..models.scan_stack import _BlockBody, _DualBody
    from ..models.uvit import UViT
    from ..models.uvit_t2i import UViTT2I

    assert nnet.scan_blocks, "pipeline parallelism requires nnet.scan_blocks=True"
    assert mesh.shape["sp"] == 1 and mesh.shape["tp"] == 1, (
        "pp > 1 requires sp == tp == 1 (the pipelined trunk runs under manual "
        "SPMD; sp/tp rely on the automatic partitioner)"
    )
    remat = nnet.use_checkpoint
    cfg = dict(
        num_heads=nnet.num_heads,
        mlp_ratio=nnet.mlp_ratio,
        qkv_bias=nnet.qkv_bias,
        qk_scale=nnet.qk_scale,
        dtype=nnet.dtype,
        attn_impl=nnet.attn_impl,
        gelu_approx=nnet.gelu_approx,
    )
    mid_img = Block(skip=False, **cfg)

    def single_stream_fns():
        body_in = _BlockBody(emit_skip=True, skip=False, **cfg)
        body_out = _BlockBody(emit_skip=False, skip=nnet.skip, **cfg)

        def down_fn(p, c):
            return body_in.apply({"params": p}, c, None)

        def up_fn(p, c, s):
            return body_out.apply({"params": p}, c, s if nnet.skip else None)[0]

        def mid_fn(mp, c):
            return mid_img.apply({"params": mp["mid_block"]}, c)

        return down_fn, up_fn, mid_fn

    def _adapt_micro(b: int) -> int:
        """Largest microbatch count <= the requested one that divides the
        batch — keeps eval-time calls (arbitrary n, CFG-doubled batches)
        working without a divisibility footgun."""
        m = min(num_micro, b)
        while b % m:
            m -= 1
        return m

    def run_trunk(params, carry, down_fn, up_fn, mid_fn, in_name, out_name,
                  mid_names):
        p = params["params"]
        mid_p = {k: p[k] for k in mid_names}
        b = jax.tree.leaves(carry)[0].shape[0]
        return pipeline_blocks(
            carry, p[in_name], p[out_name], mid_p, mesh=mesh,
            num_micro=_adapt_micro(b), down_fn=down_fn, up_fn=up_fn,
            mid_fn=mid_fn, remat=remat,
        )

    if isinstance(nnet, UViT):
        down_fn, up_fn, mid_fn = single_stream_fns()

        def fn(params, x, timesteps, y=None):
            tokens = nnet.apply(params, x, timesteps, y, stage="embed")
            tokens = run_trunk(params, tokens, down_fn, up_fn, mid_fn,
                               "in_blocks", "out_blocks", ("mid_block",))
            return nnet.apply(params, tokens, stage="head")

        return fn

    assert isinstance(nnet, UViTT2I), f"unsupported nnet for pp: {type(nnet)}"
    dual = nnet.enable_panoptic and nnet.separate
    num_patches = (nnet.img_size // nnet.patch_size) ** 2
    img_len = nnet.extras + num_patches

    if dual:
        body_in = _DualBody(img_len=img_len, emit_skip=True, skip=False, **cfg)
        body_out = _DualBody(
            img_len=img_len, emit_skip=False, skip=nnet.skip, **cfg
        )
        mid_mask = Block(skip=False, **cfg)
        zc = ZeroConv(dtype=nnet.dtype)

        def down_fn(p, c):
            return body_in.apply({"params": p}, c, None)

        def up_fn(p, c, s):
            return body_out.apply({"params": p}, c, s if nnet.skip else None)[0]

        def mid_fn(mp, c):
            # Mirrors the model's mid turnaround (uvit_t2i.py: mid_block +
            # mid_block_mask + zero_convs_mid coupling).
            x, m = c
            mx = jnp.concatenate([x, m], axis=1)
            x = mid_img.apply({"params": mp["mid_block"]}, x)
            mx = mid_mask.apply({"params": mp["mid_block_mask"]}, mx)
            x_add = zc.apply({"params": mp["zero_convs_mid"]}, mx[:, :img_len, :])
            return (x + x_add, mx[:, img_len:, :])

        dual_names = (
            "in_blocks_dual",
            "out_blocks_dual",
            ("mid_block", "mid_block_mask", "zero_convs_mid"),
        )
    ss_down, ss_up, ss_mid = single_stream_fns()

    def fn(params, x, timesteps, context, mask_token=None,
           use_ground_truth: bool = False):
        if dual and mask_token is None:
            # Image-only forward of a dual model takes a DIFFERENT trunk
            # (unstacked single-stream names); it only occurs in eval-time CFG
            # paths, which don't route through the pipelined apply anyway.
            return nnet.apply(params, x, timesteps, context)
        carry = nnet.apply(
            params, x, timesteps, context, mask_token=mask_token, stage="embed"
        )
        if dual:
            carry = run_trunk(params, carry, down_fn, up_fn, mid_fn, *dual_names)
        else:
            xtok, _ = carry
            xtok = run_trunk(params, xtok, ss_down, ss_up, ss_mid,
                             "in_blocks", "out_blocks", ("mid_block",))
            carry = (xtok, None)
        return nnet.apply(
            params, carry, mask_token=mask_token,
            use_ground_truth=use_ground_truth, stage="head",
        )

    return fn
