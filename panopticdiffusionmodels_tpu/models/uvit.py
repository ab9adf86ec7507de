"""U-ViT backbone: ViT denoiser with long skip connections (flax.linen, NHWC).

TPU-native re-design of the reference unconditional / class-conditional U-ViT
(reference `libs/uvit.py:138-230`):

  patchify -> [time token | label token | patches] + pos_embed
  -> depth/2 in-blocks (skips pushed) -> mid-block
  -> depth/2 out-blocks (skip_linear(cat(x, skip)))
  -> norm -> linear decode -> unpatchify -> 3x3 conv.

Differences from the reference that are deliberate TPU choices:
  * NHWC layout and reshape+matmul patch embedding (single MXU matmul),
  * optional rematerialization (`use_checkpoint`) via `nn.remat` instead of
    torch.utils.checkpoint,
  * a `dtype` knob for bf16 compute with f32 params.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..parallel.mesh import constrain_tokens
from .layers import (
    Block,
    Conv3x3,
    PatchEmbed,
    TimeEmbed,
    default_init,
    timestep_embedding,
    unpatchify,
)

Dtype = Any


class UViT(nn.Module):
    """Unconditional / class-conditional U-ViT.

    Args mirror the reference constructor (`libs/uvit.py:139-141`); `num_classes`
    <= 0 means unconditional (one extra time token), > 0 adds a label token.
    """

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    mlp_time_embed: bool = False
    num_classes: int = -1
    use_checkpoint: bool = False
    conv: bool = True
    skip: bool = True
    # Compile the block body once and lax.scan it over stacked per-layer params
    # (see scan_stack.py) — same math, O(1)-in-depth compile time.  Recommended
    # for deep models and anything embedded in a multi-NFE sampler program.
    scan_blocks: bool = False
    # Remat policy when use_checkpoint=True: None = recompute everything,
    # 'dots_no_batch' keeps MXU outputs and recomputes only VPU elementwise
    # work in the backward pass (see scan_stack.resolve_remat_policy).
    remat_policy: Optional[str] = None
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # Opt-in tanh GELU (reference uses exact erf): ~13% faster forward,
    # different math — see layers.Mlp docstring and BENCH.md op ablation.
    gelu_approx: bool = False
    # Sequence parallelism: NamedSharding for (B, L, C) token activations,
    # set by the trainer when the mesh has sp > 1 (parallel/mesh.py).
    token_sharding: Optional[Any] = None

    @property
    def extras(self) -> int:
        return 2 if self.num_classes > 0 else 1

    @nn.compact
    def __call__(self, x, timesteps=None, y=None, stage: str = "full"):
        """x: (B, H, W, C) NHWC; timesteps: (B,); y: optional (B,) int labels.

        `stage` partitions the forward for pipeline parallelism
        (parallel/pipeline.py): 'embed' returns the (B, extras+L, D) token
        activations just before the block trunk; 'head' takes those token
        activations (as `x`) and runs norm/decode/unpatchify/conv.  Module
        names are identical across stages, so a 'full'-init param tree serves
        every stage (flax looks params up lazily).
        """
        assert stage in ("full", "embed", "head"), stage
        num_patches = (self.img_size // self.patch_size) ** 2
        if stage == "head":
            l = num_patches
            return self._head(x, l)

        x = PatchEmbed(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        b, l, d = x.shape

        time_token = TimeEmbed(
            embed_dim=self.embed_dim,
            mlp=self.mlp_time_embed,
            dtype=self.dtype,
            name="time_embed",
        )(timestep_embedding(timesteps, self.embed_dim))
        time_token = time_token.astype(x.dtype)[:, None, :]
        x = jnp.concatenate([time_token, x], axis=1)
        if self.num_classes > 0:
            assert y is not None, "class-conditional model requires labels"
            label_emb = nn.Embed(
                self.num_classes,
                self.embed_dim,
                embedding_init=default_init,
                dtype=self.dtype,
                name="label_emb",
            )(y)
            x = jnp.concatenate([label_emb[:, None, :], x], axis=1)

        pos_embed = self.param(
            "pos_embed",
            default_init,
            (1, self.extras + num_patches, self.embed_dim),
        )
        x = x + pos_embed.astype(x.dtype)
        x = constrain_tokens(x, self.token_sharding)
        if stage == "embed":
            return x

        block_cls = Block
        if self.use_checkpoint:
            from .scan_stack import resolve_remat_policy

            block_cls = nn.remat(Block, policy=resolve_remat_policy(self.remat_policy))

        def make_block(name, skip=False):
            return block_cls(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                skip=skip,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                gelu_approx=self.gelu_approx,
                token_sharding=self.token_sharding,
                name=name,
            )

        if self.scan_blocks:
            from .scan_stack import in_stack, out_stack

            stack_cfg = dict(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                gelu_approx=self.gelu_approx,
                token_sharding=self.token_sharding,
            )
            x, skips = in_stack(
                x, length=self.depth // 2, remat=self.use_checkpoint,
                remat_policy=self.remat_policy, name="in_blocks", **stack_cfg,
            )
            x = constrain_tokens(make_block("mid_block")(x), self.token_sharding)
            x = out_stack(
                x, skips, length=self.depth // 2, remat=self.use_checkpoint,
                remat_policy=self.remat_policy, use_skip=self.skip,
                name="out_blocks", **stack_cfg,
            )
        else:
            skips = []
            for i in range(self.depth // 2):
                x = constrain_tokens(
                    make_block(f"in_blocks_{i}")(x), self.token_sharding
                )
                skips.append(x)

            x = constrain_tokens(make_block("mid_block")(x), self.token_sharding)

            for i in range(self.depth // 2):
                x = constrain_tokens(
                    make_block(f"out_blocks_{i}", skip=self.skip)(x, skips.pop()),
                    self.token_sharding,
                )

        return self._head(x, l)

    def _head(self, x, l):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        patch_dim = self.patch_size ** 2 * self.in_chans
        x = nn.Dense(
            patch_dim,
            kernel_init=default_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="decoder_pred",
        )(x)
        assert x.shape[1] == self.extras + l
        x = x[:, self.extras :, :]
        x = unpatchify(x, self.in_chans)
        if self.conv:
            x = Conv3x3(self.in_chans, dtype=self.dtype, name="final_layer")(x)
        return x
