"""Text-to-image U-ViT with joint panoptic-mask co-generation (the headline model).

TPU-native re-design of the reference dual-stream architecture
(reference `libs/uvit_t2i.py:258-525`):

  * image stream: [time | 77 CLIP context tokens | image patches], standard U-ViT
    blocks with long skips,
  * mask stream (`separate=True`, ControlNet style): analog-bit mask patches `m`
    run through their own blocks on the CONCATENATED sequence `[x ; m]`; after
    every block the image half of the mask stream is projected through a
    zero-initialized per-token linear layer ("zeroconv", reference
    `libs/uvit_t2i.py:246-257,366-369`) and added back into the image stream,
  * `separate=False`: single stream, mask tokens appended to the sequence,
  * mask head: linear decode -> unpatchify(mask_bits ch) -> 3x3 conv -> tanh
    (reference `libs/uvit_t2i.py:343-348,510-513`),
  * `use_ground_truth=True`: merge mask features into image features and return
    the ground-truth mask untouched (reference `libs/uvit_t2i.py:486-496`).

Design fixes over the reference snapshot (SURVEY.md §2.3): the mask operates at
its own resolution (`mask_size`, typically 2x the latent size) with
`mask_patch_size = patch_size * mask_size / img_size`, so mask and image token
counts match and the mask head decodes back to (mask_size, mask_size, mask_bits).
The reference's `patch_factor` config knob intended exactly this but was never
wired through.

All mode flags (`enable_panoptic`, `separate`, `use_ground_truth`, presence of
`mask_token`) are static at trace time, so each configuration compiles to its own
specialized XLA program — no dynamic control flow on device.
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
    ZeroConv,
)

Dtype = Any

zero_init = nn.initializers.zeros





class UViTT2I(nn.Module):
    """U-ViT for text-to-image with optional panoptic co-generation."""

    img_size: int = 32
    patch_size: int = 2
    in_chans: int = 4
    embed_dim: int = 512
    depth: int = 12
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    mlp_time_embed: bool = False
    clip_dim: int = 768
    num_clip_token: int = 77
    conv: bool = True
    skip: bool = True
    # Panoptic mask stream.
    enable_panoptic: bool = True
    separate: bool = True
    mask_bits: int = 8  # analog-bit channels (reference num_panoptic_class=8)
    mask_size: int = 64  # mask spatial resolution (2x latent by default)
    use_checkpoint: bool = False
    # Scan stacked per-layer params instead of unrolling (see scan_stack.py).
    scan_blocks: bool = False
    # Remat policy when use_checkpoint=True (see scan_stack.resolve_remat_policy).
    remat_policy: Optional[str] = None
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # Opt-in tanh GELU (reference uses exact erf) — see layers.Mlp docstring.
    gelu_approx: bool = False
    # Sequence parallelism: a NamedSharding for (B, L, C) token activations
    # (batch over (dp, fsdp), tokens over 'sp'), set by the trainer when the
    # mesh has sp > 1.  Re-asserted at the stream entry and every block so the
    # partitioner keeps L sharded through the depth (parallel/mesh.py).
    token_sharding: Optional[Any] = None

    @property
    def extras(self) -> int:
        return 1 + self.num_clip_token

    @property
    def mask_patch_size(self) -> int:
        # Keep mask token count == image token count.
        assert self.mask_size % self.img_size == 0
        return self.patch_size * (self.mask_size // self.img_size)

    @nn.compact
    def __call__(
        self,
        x,
        timesteps=None,
        context=None,
        mask_token=None,
        use_ground_truth: bool = False,
        stage: str = "full",
    ):
        """x: (B, h, w, C) latent NHWC; context: (B, 77, clip_dim);
        mask_token: optional (B, mask_size, mask_size, mask_bits) analog bits.

        Returns noise (B, h, w, C), or (noise, mask_pred) when mask_token given.

        `stage` partitions the forward for pipeline parallelism
        (parallel/pipeline.py): 'embed' returns the (x, m) token carry just
        before the block trunk (m is None unless dual-stream); 'head' takes
        that carry as `x` and runs the decode heads.  Module names are
        identical across stages, so a 'full'-init param tree serves every
        stage.  In 'head' mode the panoptic flag is recovered statically:
        from `m is not None` (separate) or the token count (joint).
        """
        assert stage in ("full", "embed", "head"), stage
        num_patches = (self.img_size // self.patch_size) ** 2
        if stage == "head":
            x, m = x if isinstance(x, tuple) else (x, None)
            if self.separate:
                enable_panoptic = self.enable_panoptic and m is not None
            else:
                enable_panoptic = (
                    self.enable_panoptic
                    and x.shape[1] == self.extras + 2 * num_patches
                )
            return self._head(
                x, m, num_patches, enable_panoptic, mask_token, use_ground_truth
            )
        enable_panoptic = self.enable_panoptic and mask_token is not None

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
        context_token = nn.Dense(
            self.embed_dim,
            kernel_init=default_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="context_embed",
        )(context)

        # Positional embeddings: sized for the configured mode.
        if self.enable_panoptic and not self.separate:
            pos_len = self.extras + 2 * num_patches
        else:
            pos_len = self.extras + num_patches
        pos_embed = self.param(
            "pos_embed", default_init, (1, pos_len, self.embed_dim)
        )

        m = None
        if enable_panoptic:
            mask_embedding = PatchEmbed(
                patch_size=self.mask_patch_size,
                embed_dim=self.embed_dim,
                dtype=self.dtype,
                name="mask_embed",
            )(mask_token)
            assert mask_embedding.shape[1] == l, (
                f"mask tokens ({mask_embedding.shape[1]}) must match image tokens ({l})"
            )
            if not self.separate:
                x = jnp.concatenate(
                    [time_token, context_token, x, mask_embedding], axis=1
                )
                x = x + pos_embed.astype(x.dtype)
            else:
                pos_embed_mask = self.param(
                    "pos_embed_mask", default_init, (1, num_patches, self.embed_dim)
                )
                x = jnp.concatenate([time_token, context_token, x], axis=1)
                x = x + pos_embed.astype(x.dtype)
                m = mask_embedding + pos_embed_mask.astype(x.dtype)
        else:
            x = jnp.concatenate([time_token, context_token, x], axis=1)
            x = x + pos_embed[:, : self.extras + l, :].astype(x.dtype)

        if self.use_checkpoint:
            from .scan_stack import resolve_remat_policy

            block_cls = nn.remat(Block, policy=resolve_remat_policy(self.remat_policy))
        else:
            block_cls = Block

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

        dual = enable_panoptic and self.separate
        img_len = self.extras + l

        x = constrain_tokens(x, self.token_sharding)
        m = constrain_tokens(m, self.token_sharding)
        if stage == "embed":
            return (x, m)

        def couple(mx, x, zc_name):
            """Split the mask-stream output and gate its image half into x."""
            x_add = ZeroConv(dtype=self.dtype, name=zc_name)(mx[:, :img_len, :])
            return (
                constrain_tokens(x + x_add, self.token_sharding),
                constrain_tokens(mx[:, img_len:, :], self.token_sharding),
            )

        if self.scan_blocks:
            from .scan_stack import (
                dual_in_stack,
                dual_out_stack,
                in_stack,
                out_stack,
            )

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
            half = self.depth // 2
            if dual:
                x, m, skips_x, skips_mx = dual_in_stack(
                    x, m, img_len=img_len, length=half,
                    remat=self.use_checkpoint, remat_policy=self.remat_policy,
                    name="in_blocks_dual", **stack_cfg,
                )
                mx = jnp.concatenate([x, m], axis=1)
                x = make_block("mid_block")(x)
                mx = make_block("mid_block_mask")(mx)
                x, m = couple(mx, x, "zero_convs_mid")
                x, m = dual_out_stack(
                    x, m, skips_x, skips_mx, img_len=img_len, length=half,
                    remat=self.use_checkpoint, remat_policy=self.remat_policy,
                    use_skip=self.skip, name="out_blocks_dual", **stack_cfg,
                )
            else:
                x, skips = in_stack(
                    x, length=half, remat=self.use_checkpoint,
                    remat_policy=self.remat_policy, name="in_blocks", **stack_cfg,
                )
                x = constrain_tokens(make_block("mid_block")(x), self.token_sharding)
                x = out_stack(
                    x, skips, length=half, remat=self.use_checkpoint,
                    remat_policy=self.remat_policy, use_skip=self.skip,
                    name="out_blocks", **stack_cfg,
                )
        else:
            skips, skips_mask = [], []
            for i in range(self.depth // 2):
                if dual:
                    mx = jnp.concatenate([x, m], axis=1)
                x = constrain_tokens(
                    make_block(f"in_blocks_{i}")(x), self.token_sharding
                )
                if dual:
                    mx = make_block(f"in_blocks_mask_{i}")(mx)
                    x, m = couple(mx, x, f"zero_convs_in_{i}")
                    skips_mask.append(mx)
                skips.append(x)

            if dual:
                mx = jnp.concatenate([x, m], axis=1)
            x = constrain_tokens(make_block("mid_block")(x), self.token_sharding)
            if dual:
                mx = make_block("mid_block_mask")(mx)
                x, m = couple(mx, x, "zero_convs_mid")

            for i in range(self.depth // 2):
                if dual:
                    mx = jnp.concatenate([x, m], axis=1)
                x = constrain_tokens(
                    make_block(f"out_blocks_{i}", skip=self.skip)(x, skips.pop()),
                    self.token_sharding,
                )
                if dual:
                    mx = make_block(f"out_blocks_mask_{i}", skip=self.skip)(
                        mx, skips_mask.pop()
                    )
                    x, m = couple(mx, x, f"zero_convs_out_{i}")

        return self._head(x, m, l, enable_panoptic, mask_token, use_ground_truth)

    def _head(self, x, m, l, enable_panoptic, mask_token, use_ground_truth):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)

        decoder_pred = nn.Dense(
            self.patch_size ** 2 * self.in_chans,
            kernel_init=default_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="decoder_pred",
        )

        mask_pred = None
        if enable_panoptic:
            if use_ground_truth:
                # Merge mask features into image features; echo the GT mask
                # (reference `libs/uvit_t2i.py:486-496`).
                image_feature = x[:, self.extras : self.extras + l, :]
                if not self.separate:
                    mask_feature = x[:, self.extras + l :, :]
                else:
                    mask_feature = m
                noise = decoder_pred(image_feature + mask_feature)
                mask_pred = mask_token
            else:
                if not self.separate:
                    noise = decoder_pred(x[:, self.extras : self.extras + l, :])
                    mask_feature = x[:, self.extras + l :, :]
                else:
                    noise = decoder_pred(x[:, self.extras :, :])
                    mask_feature = m
                y = nn.Dense(
                    self.mask_patch_size ** 2 * self.mask_bits,
                    kernel_init=default_init,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype,
                    name="decoder_pred_mask",
                )(mask_feature)
                y = unpatchify(y, self.mask_bits)
                if self.conv:
                    y = Conv3x3(self.mask_bits, dtype=self.dtype, name="final_layer_mask")(y)
                mask_pred = jnp.tanh(y)
        else:
            noise = decoder_pred(x[:, self.extras : self.extras + l, :])

        noise = unpatchify(noise, self.in_chans)
        if self.conv:
            noise = Conv3x3(self.in_chans, dtype=self.dtype, name="final_layer")(noise)

        # `enable_panoptic` also covers pipelined 'head' calls, where the mask
        # state arrives in the carry and mask_token itself may be None.
        if mask_token is not None or enable_panoptic:
            return noise, mask_pred
        return noise
