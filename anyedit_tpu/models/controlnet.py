"""ControlNet — conditional control branch for the SD UNet family.

Capability parity with the reference's AnyDoor control stack
(`ControlNet` cldm/cldm.py:47, `ControlledUnetModel` :21, `ControlLDM`
:307) and the diffusers SDXL-ControlNet used by material transfer
(material_transfer_tool.py:192-198):

  * a trainable copy of the UNet's down+mid path consumes (latents + hint)
    and emits one zero-conv residual per skip connection + one mid residual,
  * the host UNet adds them via its `controlnet_residuals`/`controlnet_mid`
    inputs (already first-class in UNet2DCondition),
  * the hint image enters through a small conv pyramid (cldm convention).

Zero-init convs make an untrained ControlNet an exact no-op — tested.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.layers import Conv3x3, GroupNorm, timestep_embedding
from anyedit_tpu.models.unet_sd import ResBlock, SpatialTransformer, UNetConfig


class HintEncoder(nn.Module):
    """Hint image (B, H·8, W·8, C_hint) → latent-resolution features.

    Exact structural parity with the reference's `input_hint_block`
    (cldm/cldm.py:146-163): seven SiLU convs 16,16,32s2,32,96s2,96,256s2
    followed by a zero-init 3×3 projection to `out_channels`, so real
    AnyDoor/ControlNet checkpoints map one-to-one.
    """

    out_channels: int
    cfg: UNetConfig

    # (channels, stride) per conv — torch indices 0,2,4,6,8,10,12
    PYRAMID = ((16, 1), (16, 1), (32, 2), (32, 1), (96, 2), (96, 1), (256, 2))

    @nn.compact
    def __call__(self, hint):
        c = self.cfg
        h = hint.astype(c.dtype)
        for i, (ch, stride) in enumerate(self.PYRAMID):
            h = Conv3x3(ch, stride=stride, dtype=c.dtype, name=f"conv_{i}")(h)
            h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       kernel_init=nn.initializers.zeros, dtype=c.dtype,
                       name="proj")(h)


class ControlNet(nn.Module):
    """(x, t, context, hint) → (skip residuals [...], mid residual)."""

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, t, context, hint,
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
            b = x.shape[0]
            tid = timestep_embedding(time_ids.reshape(-1), 256)
            tid = tid.reshape(b, c.addition_time_dim * 256)
            add = jnp.concatenate([pooled_text.astype(c.dtype),
                                   tid.astype(c.dtype)], axis=-1)
            add = nn.Dense(temb_dim, dtype=c.dtype, name="add_fc1")(add)
            add = nn.Dense(temb_dim, dtype=c.dtype, name="add_fc2")(nn.silu(add))
            temb = temb + add

        h = Conv3x3(ch0, dtype=c.dtype, name="conv_in")(x)
        h = h + HintEncoder(ch0, c, name="hint_encoder")(hint)

        def zero_conv(feat, i):
            return nn.Conv(feat.shape[-1], (1, 1),
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           dtype=c.dtype, name=f"zero_{i}")(feat)

        residuals = [zero_conv(h, 0)]
        zi = 1
        for lvl, ch in enumerate(c.block_channels):
            for i in range(c.layers_per_block):
                h = ResBlock(ch, c, name=f"down_{lvl}_res_{i}")(h, temb)
                if c.attn_levels[lvl]:
                    h = SpatialTransformer(c, f"cn.down_{lvl}.tf_{i}",
                                           depth=c.depth_at(lvl),
                                           name=f"down_{lvl}_tf_{i}")(h, context)
                residuals.append(zero_conv(h, zi))
                zi += 1
            if lvl != len(c.block_channels) - 1:
                h = Conv3x3(ch, stride=2, dtype=c.dtype, name=f"down_{lvl}_ds")(h)
                residuals.append(zero_conv(h, zi))
                zi += 1

        mid_ch = c.block_channels[-1]
        h = ResBlock(mid_ch, c, name="mid_res_0")(h, temb)
        h = SpatialTransformer(c, "cn.mid.tf",
                               depth=c.depth_at(len(c.block_channels) - 1),
                               name="mid_tf")(h, context)
        h = ResBlock(mid_ch, c, name="mid_res_1")(h, temb)
        mid = zero_conv(h, zi)
        return residuals, mid
