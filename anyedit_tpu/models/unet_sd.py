"""SD-family conditional UNet, rebuilt TPU-first.

Capability-parity with the reference's `UNetModel`
(ldm/modules/diffusionmodules/openaimodel.py:412) / diffusers
UNet2DConditionModel, re-designed rather than ported:
  * NHWC + bf16 compute, fp32 GroupNorm stats,
  * the attention-processor slot threads through every SpatialTransformer,
    replacing attention monkey-patching (MasaCtrl/P2P/IP-Adapter hooks),
  * optional per-call `controlnet_residuals` input (AnyDoor/ControlNet adds
    residuals to skip connections — cldm/cldm.py:21-46 semantics),
  * `in_channels` is a config knob: 4 (text2img), 8 (InstructPix2Pix),
    9 (inpaint) — the reference maintains separate checkpoints per wiring.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.layers import (
    AttnProcessor, Conv3x3, FeedForward, GroupNorm, LayerNorm,
    MultiHeadAttention, timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attn_levels: tuple[bool, ...] = (True, True, True, False)
    transformer_depth: int | tuple[int, ...] = 1   # per-level for SDXL
    # Head partitioning. SD1.x (ldm openaimodel num_heads: 8) uses a FIXED
    # head count with head_dim = C // 8 (40/80/160 per level); SDXL/SD2.x
    # use fixed head channels (64) with heads = C // 64. `num_heads`, when
    # set, takes precedence over `num_head_channels`. Getting this wrong
    # silently converts checkpoints (weight shapes match) but diverges
    # numerically via head grouping + the 1/sqrt(head_dim) softmax scale.
    num_heads: int = 0                   # 0 = derive from num_head_channels
    num_head_channels: int = 40
    context_dim: int = 768
    time_embed_mult: int = 4
    num_groups: int = 32
    # SDXL micro-conditioning: pooled text emb (addition_embed_dim) + 6 time
    # ids, fourier-embedded and added to the time embedding.
    addition_embed_dim: int = 0
    addition_time_dim: int = 0
    dtype: Any = jnp.bfloat16
    # W8A8 int8 fast mode (ops/quant.py): quantizes the body convs and
    # transformer projections; conv_in/conv_out/time embeds stay bf16.
    # Param tree changes (kernel → kernel_q + kernel_scale); convert a
    # float checkpoint with ops.quant.quantize_params.
    quant: bool = False

    def heads(self, channels: int) -> int:
        if self.num_heads:
            return self.num_heads
        return max(1, channels // self.num_head_channels)

    def head_dim(self, channels: int) -> int:
        return channels // self.heads(channels)

    def depth_at(self, level: int) -> int:
        if isinstance(self.transformer_depth, tuple):
            return self.transformer_depth[level]
        return self.transformer_depth


SD15_UNET = UNetConfig(num_heads=8)   # head_dim 40/80/160/160 per level
SD15_IP2P_UNET = dataclasses.replace(SD15_UNET, in_channels=8)
SD15_INPAINT_UNET = dataclasses.replace(SD15_UNET, in_channels=9)
# SDXL-base: 3 levels, depths (0,2,10), 2048-dim context, 64-ch heads,
# micro-conditioning on pooled OpenCLIP-bigG (1280) + 6 size/crop time ids.
SDXL_UNET = UNetConfig(block_channels=(320, 640, 1280),
                       attn_levels=(False, True, True),
                       transformer_depth=(0, 2, 10),
                       num_head_channels=64, context_dim=2048,
                       addition_embed_dim=1280, addition_time_dim=6)
SDXL_INPAINT_UNET = dataclasses.replace(SDXL_UNET, in_channels=9)
# AnyDoor is SD2.1-class (reference anydoor.yaml: context_dim 1024,
# num_head_channels 64, use_linear_in_transformer, hint_channels 4) —
# NOT SD1.5. head_dim is fixed 64 → heads 5/10/20/20 per level.
SD21_ANYDOOR_UNET = UNetConfig(num_head_channels=64, context_dim=1024)
TINY_UNET = UNetConfig(block_channels=(32, 64), attn_levels=(True, False),
                       num_head_channels=8, context_dim=32, num_groups=8,
                       layers_per_block=1)
TINY_XL_UNET = UNetConfig(block_channels=(32, 64), attn_levels=(False, True),
                          transformer_depth=(0, 2), num_head_channels=8,
                          context_dim=32, num_groups=8, layers_per_block=1,
                          addition_embed_dim=16, addition_time_dim=6)


class ResBlock(nn.Module):
    out_channels: int
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, temb):
        c = self.cfg
        h = GroupNorm(c.num_groups, silu=True, dtype=c.dtype, name="norm1")(x)
        h = Conv3x3(self.out_channels, dtype=c.dtype, quant=c.quant,
                    name="conv1")(h)
        t = nn.silu(temb)
        t = nn.Dense(self.out_channels, dtype=c.dtype, name="time_emb_proj")(t)
        h = h + t[:, None, None, :]
        h = GroupNorm(c.num_groups, silu=True, dtype=c.dtype, name="norm2")(h)
        h = Conv3x3(self.out_channels, dtype=c.dtype, quant=c.quant,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            from anyedit_tpu.ops.quant import make_conv1x1
            x = make_conv1x1(self.out_channels, quant=c.quant, dtype=c.dtype,
                             name="skip")(x)
        return x + h


class TransformerBlock(nn.Module):
    cfg: UNetConfig
    heads: int
    name_tag: str

    @nn.compact
    def __call__(self, x, context, processor=None, extra=None):
        c = self.cfg
        inner = x.shape[-1]
        hd = inner // self.heads
        h = LayerNorm(dtype=c.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(self.heads, hd, inner, f"{self.name_tag}.self",
                                   True, dtype=c.dtype, quant=c.quant,
                                   name="attn1")(
            h, None, processor, extra)
        h = LayerNorm(dtype=c.dtype, name="norm2")(x)
        x = x + MultiHeadAttention(self.heads, hd, inner, f"{self.name_tag}.cross",
                                   False, dtype=c.dtype, quant=c.quant,
                                   name="attn2")(
            h, context, processor, extra)
        h = LayerNorm(dtype=c.dtype, name="norm3")(x)
        x = x + FeedForward(dtype=c.dtype, quant=c.quant, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    cfg: UNetConfig
    name_tag: str
    depth: int = 1

    @nn.compact
    def __call__(self, x, context, processor=None, extra=None):
        c = self.cfg
        b, hh, ww, ch = x.shape
        heads = c.heads(ch)
        res = x
        x = GroupNorm(c.num_groups, dtype=c.dtype, name="norm")(x)
        from anyedit_tpu.ops.quant import make_conv1x1
        proj = lambda n: make_conv1x1(ch, quant=c.quant, dtype=c.dtype,
                                      name=n)
        x = proj("proj_in")(x)
        x = x.reshape(b, hh * ww, ch)
        for d in range(self.depth):
            x = TransformerBlock(c, heads, f"{self.name_tag}.tb{d}",
                                 name=f"block_{d}")(x, context, processor, extra)
        x = x.reshape(b, hh, ww, ch)
        x = proj("proj_out")(x)
        return x + res


class UNet2DCondition(nn.Module):
    """Forward: (latents NHWC, t, context) -> eps/v prediction NHWC."""

    cfg: UNetConfig = SD15_UNET

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, context: jnp.ndarray,
                 processor: Optional[AttnProcessor] = None,
                 extra: Optional[dict] = None,
                 controlnet_residuals: Optional[Sequence[jnp.ndarray]] = None,
                 controlnet_mid: Optional[jnp.ndarray] = None,
                 pooled_text: Optional[jnp.ndarray] = None,
                 time_ids: Optional[jnp.ndarray] = None):
        c = self.cfg
        ch0 = c.block_channels[0]
        temb_dim = ch0 * c.time_embed_mult
        x = x.astype(c.dtype)
        context = context.astype(c.dtype)

        temb = timestep_embedding(t, ch0)
        temb = nn.Dense(temb_dim, dtype=c.dtype, name="time_fc1")(temb)
        temb = nn.Dense(temb_dim, dtype=c.dtype, name="time_fc2")(nn.silu(temb))
        if c.addition_embed_dim:
            # SDXL micro-conditioning: fourier-embed each time id, concat
            # with the pooled text embedding, project into the time channel.
            assert pooled_text is not None and time_ids is not None
            b = x.shape[0]
            tid = timestep_embedding(time_ids.reshape(-1), 256)
            tid = tid.reshape(b, c.addition_time_dim * 256)
            add = jnp.concatenate([pooled_text.astype(c.dtype),
                                   tid.astype(c.dtype)], axis=-1)
            add = nn.Dense(temb_dim, dtype=c.dtype, name="add_fc1")(add)
            add = nn.Dense(temb_dim, dtype=c.dtype, name="add_fc2")(nn.silu(add))
            temb = temb + add

        h = Conv3x3(ch0, dtype=c.dtype, name="conv_in")(x)
        skips = [h]

        # down path
        for lvl, ch in enumerate(c.block_channels):
            for i in range(c.layers_per_block):
                h = ResBlock(ch, c, name=f"down_{lvl}_res_{i}")(h, temb)
                if c.attn_levels[lvl]:
                    h = SpatialTransformer(c, f"down_{lvl}.tf_{i}",
                                           depth=c.depth_at(lvl),
                                           name=f"down_{lvl}_tf_{i}")(
                        h, context, processor, extra)
                skips.append(h)
            if lvl != len(c.block_channels) - 1:
                h = Conv3x3(ch, stride=2, dtype=c.dtype, quant=c.quant,
                            name=f"down_{lvl}_ds")(h)
                skips.append(h)

        # mid
        mid_ch = c.block_channels[-1]
        h = ResBlock(mid_ch, c, name="mid_res_0")(h, temb)
        h = SpatialTransformer(c, "mid.tf",
                               depth=c.depth_at(len(c.block_channels) - 1),
                               name="mid_tf")(h, context, processor, extra)
        h = ResBlock(mid_ch, c, name="mid_res_1")(h, temb)
        if controlnet_mid is not None:
            h = h + controlnet_mid.astype(c.dtype)

        cn = list(controlnet_residuals) if controlnet_residuals is not None else None

        def pop_skip():
            s = skips.pop()
            if cn is not None:
                s = s + cn.pop().astype(c.dtype)
            return s

        # up path
        for lvl in reversed(range(len(c.block_channels))):
            ch = c.block_channels[lvl]
            for i in range(c.layers_per_block + 1):
                h = jnp.concatenate([h, pop_skip()], axis=-1)
                h = ResBlock(ch, c, name=f"up_{lvl}_res_{i}")(h, temb)
                if c.attn_levels[lvl]:
                    h = SpatialTransformer(c, f"up_{lvl}.tf_{i}",
                                           depth=c.depth_at(lvl),
                                           name=f"up_{lvl}_tf_{i}")(
                        h, context, processor, extra)
            if lvl != 0:
                # nearest-neighbor 2x upsample + conv (SD convention)
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = Conv3x3(h.shape[-1], dtype=c.dtype, quant=c.quant,
                            name=f"up_{lvl}_us")(h)

        h = GroupNorm(c.num_groups, silu=True, dtype=c.dtype, name="norm_out")(h)
        h = Conv3x3(c.out_channels, dtype=c.dtype, name="conv_out")(h)
        return h.astype(jnp.float32)
