"""Swin Transformer backbone (GroundingDINO's vision tower).

Capability parity with reference
`GroundingDINO/groundingdino/models/GroundingDINO/backbone/swin_transformer.py:501`
(SwinTransformer, 802 LoC), redesigned NHWC/bf16:
  * windows are batched into one attention call per block (MXU-friendly),
  * shifted windows use jnp.roll + a precomputed static window mask,
  * multi-scale outputs at strides 8/16/32 (out_indices (1,2,3), the
    GroundingDINO SwinB configuration).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from anyedit_tpu.models.layers import LayerNorm
from anyedit_tpu.ops.attention import sdpa_xla


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 128                     # Swin-B
    depths: tuple[int, ...] = (2, 2, 18, 2)
    heads: tuple[int, ...] = (4, 8, 16, 32)
    window: int = 12                         # swin_B_384_22k
    patch: int = 4
    out_indices: tuple[int, ...] = (1, 2, 3)
    dtype: Any = jnp.bfloat16


SWIN_B = SwinConfig()
SWIN_T = SwinConfig(embed_dim=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24),
                    window=7)
TINY_SWIN = SwinConfig(embed_dim=16, depths=(1, 1), heads=(2, 2), window=4,
                       out_indices=(0, 1))


def _rel_pos_index(w: int) -> np.ndarray:
    """Static (w², w²) index into the (2w-1)² relative-position-bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(hp: int, wp: int, w: int, shift: int) -> np.ndarray:
    """Static additive mask (nW, w², w²) for shifted-window attention."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // w, w, wp // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = win[:, :, None] - win[:, None, :]
    return np.where(diff != 0, -1e9, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        c = self.dtype
        b, h, w, ch = x.shape
        ws = self.window
        ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
        hp, wp = h + ph, w + pw

        shortcut = x
        y = LayerNorm(dtype=c, name="ln1")(x)
        y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
        if self.shift:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        nwh, nww = hp // ws, wp // ws
        y = y.reshape(b, nwh, ws, nww, ws, ch).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b * nwh * nww, ws * ws, ch)

        qkv = nn.Dense(3 * ch, dtype=c, name="qkv")(y)
        hd = ch // self.heads
        qkv = qkv.reshape(-1, ws * ws, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]

        table = self.param("rel_bias", nn.initializers.normal(0.02),
                           ((2 * ws - 1) ** 2, self.heads), jnp.float32)
        idx = jnp.asarray(_rel_pos_index(ws))
        bias = table[idx.reshape(-1)].reshape(ws * ws, ws * ws, self.heads)
        bias = bias.transpose(2, 0, 1)[None]            # (1, H, w², w²)
        if self.shift:
            smask = jnp.asarray(_shift_mask(hp, wp, ws, self.shift))
            bias = bias + jnp.tile(smask[:, None], (b, 1, 1, 1)).reshape(
                b * nwh * nww, 1, ws * ws, ws * ws)
        out = sdpa_xla(q, k, v, scale=1.0, bias=bias)
        out = out.transpose(0, 2, 1, 3).reshape(-1, ws * ws, ch)
        out = nn.Dense(ch, dtype=c, name="proj")(out)

        out = out.reshape(b, nwh, nww, ws, ws, ch).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hp, wp, ch)
        if self.shift:
            out = jnp.roll(out, (self.shift, self.shift), axis=(1, 2))
        out = out[:, :h, :w]
        x = shortcut + out

        y = LayerNorm(dtype=c, name="ln2")(x)
        y = nn.Dense(4 * ch, dtype=c, name="mlp1")(y)
        # torch nn.GELU default = exact erf (GDINO Mlp, HF SwinIntermediate)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(ch, dtype=c, name="mlp2")(y)
        return x + y


class SwinTransformer(nn.Module):
    """(B, H, W, 3) → dict {stride: (B, H/s, W/s, C_s)} multi-scale features."""

    cfg: SwinConfig = SWIN_B

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Conv(c.embed_dim, (c.patch, c.patch), strides=(c.patch, c.patch),
                    dtype=c.dtype, name="patch_embed")(x.astype(c.dtype))
        x = LayerNorm(dtype=c.dtype, name="patch_ln")(x)
        outs = {}
        for si, depth in enumerate(c.depths):
            dim = c.embed_dim * (2 ** si)
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else c.window // 2
                x = SwinBlock(dim, c.heads[si], c.window, shift, c.dtype,
                              name=f"stage{si}_block{bi}")(x)
            if si in c.out_indices:
                outs[c.patch * (2 ** si)] = LayerNorm(
                    dtype=c.dtype, name=f"out_ln{si}")(x)
            if si != len(c.depths) - 1:
                # patch merging: 2x2 concat → LN → linear to 2·dim
                b, h, w, ch = x.shape
                ph, pw = h % 2, w % 2
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                                     x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
                x = LayerNorm(dtype=c.dtype, name=f"merge_ln{si}")(x)
                x = nn.Dense(2 * ch, use_bias=False, dtype=c.dtype,
                             name=f"merge_fc{si}")(x)
        return outs
