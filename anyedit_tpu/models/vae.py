"""AutoencoderKL — the latent codec of every SD-family editor.

Capability parity with reference `ldm/models/autoencoder.py:13`
(AutoencoderKL: encoder → moments → DiagonalGaussian, decoder), NHWC/bf16.
Encode returns (mean, logvar); `scaling_factor` (0.18215 for SD1.x) is
applied by the pipelines, mirroring `get_first_stage_encoding`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.layers import Conv3x3, GroupNorm
from anyedit_tpu.ops.attention import attention as attention_op


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: Any = jnp.bfloat16


SD_VAE = VAEConfig()
TINY_VAE = VAEConfig(block_channels=(16, 32), layers_per_block=1, num_groups=8,
                     scaling_factor=0.5)


class VAEResBlock(nn.Module):
    out_channels: int
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = GroupNorm(c.num_groups, silu=True, dtype=c.dtype, name="norm1")(x)
        h = Conv3x3(self.out_channels, dtype=c.dtype, name="conv1")(h)
        h = GroupNorm(c.num_groups, silu=True, dtype=c.dtype, name="norm2")(h)
        h = Conv3x3(self.out_channels, dtype=c.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=c.dtype, name="skip")(x)
        return x + h


class MidAttention(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, h, w, ch = x.shape
        res = x
        x = GroupNorm(c.num_groups, dtype=c.dtype, name="norm")(x)
        x = x.reshape(b, h * w, ch)
        q = nn.Dense(ch, dtype=c.dtype, name="q")(x)[:, None]
        k = nn.Dense(ch, dtype=c.dtype, name="k")(x)[:, None]
        v = nn.Dense(ch, dtype=c.dtype, name="v")(x)[:, None]
        out = attention_op(q, k, v)[:, 0]
        out = nn.Dense(ch, dtype=c.dtype, name="proj_out")(out)
        return res + out.reshape(b, h, w, ch)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = Conv3x3(c.block_channels[0], dtype=c.dtype, name="conv_in")(x.astype(c.dtype))
        for lvl, ch in enumerate(c.block_channels):
            for i in range(c.layers_per_block):
                h = VAEResBlock(ch, c, name=f"down_{lvl}_res_{i}")(h)
            if lvl != len(c.block_channels) - 1:
                # SD uses asymmetric pad (0,1) then stride-2 valid conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=c.dtype, name=f"down_{lvl}_ds")(h)
        ch = c.block_channels[-1]
        h = VAEResBlock(ch, c, name="mid_res_0")(h)
        h = MidAttention(c, name="mid_attn")(h)
        h = VAEResBlock(ch, c, name="mid_res_1")(h)
        h = GroupNorm(c.num_groups, silu=True, dtype=c.dtype, name="norm_out")(h)
        h = Conv3x3(2 * c.latent_channels, dtype=c.dtype, name="conv_out")(h)
        moments = nn.Conv(2 * c.latent_channels, (1, 1), dtype=c.dtype,
                          name="quant_conv")(h)
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        z = nn.Conv(c.latent_channels, (1, 1), dtype=c.dtype,
                    name="post_quant_conv")(z.astype(c.dtype))
        ch = c.block_channels[-1]
        h = Conv3x3(ch, dtype=c.dtype, name="conv_in")(z)
        h = VAEResBlock(ch, c, name="mid_res_0")(h)
        h = MidAttention(c, name="mid_attn")(h)
        h = VAEResBlock(ch, c, name="mid_res_1")(h)
        for lvl in reversed(range(len(c.block_channels))):
            ch = c.block_channels[lvl]
            for i in range(c.layers_per_block + 1):
                h = VAEResBlock(ch, c, name=f"up_{lvl}_res_{i}")(h)
            if lvl != 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = Conv3x3(ch, dtype=c.dtype, name=f"up_{lvl}_us")(h)
        h = GroupNorm(c.num_groups, silu=True, dtype=c.dtype, name="norm_out")(h)
        h = Conv3x3(c.in_channels, dtype=c.dtype, name="conv_out")(h)
        return h.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = SD_VAE

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, key=None, sample: bool = False):
        mean, logvar = self.encode(x)
        z = mean
        if sample:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        return self.decode(z), mean, logvar
