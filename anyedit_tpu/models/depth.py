"""Depth estimators: DepthAnythingV2 (DINOv2 + DPT head) and the DPT head
itself (also covers the reference's standalone MiDaS-style DPT,
other_modules/DPT/dpt/models.py).

Parity target: `DepthAnythingV2` (other_modules/depth_anything_v2/dpt.py)
as used by visual_condition_tool.py:47-135 (img2depth). Four intermediate
DINOv2 layers → per-tap projection + LEARNED resize (ConvTranspose 4x/2x,
identity, stride-2 conv) → scratch 3x3 rn convs → RefineNet fusion with
per-block out_convs → two-stage output head. Param names mirror the
official checkpoint layout 1:1 (see weights/convert.py::_depth_anything_key).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.dinov2 import DinoV2, DinoV2Config, DINOV2_L, TINY_DINO


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    backbone: DinoV2Config = DINOV2_L
    take_layers: tuple[int, ...] = (4, 11, 17, 23)   # ViT-L convention
    feat_dim: int = 256
    # per-tap projection channels (DA-V2 vitl: 256/512/1024/1024)
    out_channels: tuple[int, ...] = (256, 512, 1024, 1024)
    dtype: Any = jnp.bfloat16


DEPTH_ANYTHING_L = DPTConfig()
TINY_DEPTH = DPTConfig(backbone=TINY_DINO, take_layers=(0, 0, 1, 1),
                       feat_dim=16, out_channels=(8, 16, 32, 32))


class ResidualConvUnit(nn.Module):
    dim: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        return x + h


def _resize2d(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            "bilinear")


class DPTHead(nn.Module):
    """4 token maps (B, N, D) at one ViT scale → depth (B, H, W)."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, layer_feats, grid_hw, out_hw):
        c = self.cfg
        gh, gw = grid_hw
        feats = []
        for i, f in enumerate(layer_feats):
            b, n, d = f.shape
            fm = f.reshape(b, gh, gw, d).astype(c.dtype)
            oc = c.out_channels[i]
            fm = nn.Conv(oc, (1, 1), dtype=c.dtype, name=f"proj_{i}")(fm)
            # learned rescale to (4x, 2x, 1x, 0.5x) — DA-V2 resize_layers
            if i == 0:
                fm = nn.ConvTranspose(oc, (4, 4), strides=(4, 4),
                                      padding="VALID", transpose_kernel=True,
                                      dtype=c.dtype, name="resize_0")(fm)
            elif i == 1:
                fm = nn.ConvTranspose(oc, (2, 2), strides=(2, 2),
                                      padding="VALID", transpose_kernel=True,
                                      dtype=c.dtype, name="resize_1")(fm)
            elif i == 3:
                fm = nn.Conv(oc, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                             dtype=c.dtype, name="resize_3")(fm)
            fm = nn.Conv(c.feat_dim, (3, 3), padding="SAME", use_bias=False,
                         dtype=c.dtype, name=f"layer{i + 1}_rn")(fm)
            feats.append(fm)

        # RefineNet fusion, coarse→fine (scratch.refinenet4..1)
        x = ResidualConvUnit(c.feat_dim, c.dtype, name="refinenet4_rcu2")(feats[3])
        x = _resize2d(x, feats[2].shape[1:3])
        x = nn.Conv(c.feat_dim, (1, 1), dtype=c.dtype, name="refinenet4_out")(x)
        for i in reversed(range(3)):
            x = x + ResidualConvUnit(c.feat_dim, c.dtype,
                                     name=f"refinenet{i + 1}_rcu1")(feats[i])
            x = ResidualConvUnit(c.feat_dim, c.dtype,
                                 name=f"refinenet{i + 1}_rcu2")(x)
            nxt = feats[i - 1].shape[1:3] if i > 0 else \
                (feats[0].shape[1] * 2, feats[0].shape[2] * 2)
            x = _resize2d(x, nxt)
            x = nn.Conv(c.feat_dim, (1, 1), dtype=c.dtype,
                        name=f"refinenet{i + 1}_out")(x)

        x = nn.Conv(c.feat_dim // 2, (3, 3), padding="SAME", dtype=c.dtype,
                    name="out1")(x)
        x = _resize2d(x, out_hw)
        x = nn.Conv(32, (3, 3), padding="SAME", dtype=c.dtype, name="out2")(x)
        x = nn.relu(x)
        depth = nn.Conv(1, (1, 1), dtype=c.dtype, name="out3")(x)
        return nn.relu(depth.astype(jnp.float32))[..., 0]


class DepthAnythingV2(nn.Module):
    cfg: DPTConfig = DEPTH_ANYTHING_L

    @nn.compact
    def __call__(self, pixels):
        c = self.cfg
        bb = DinoV2(c.backbone, return_layers=tuple(sorted(set(c.take_layers))),
                    name="backbone")(pixels)
        feats = [bb["layers"][i] for i in c.take_layers]
        g = c.backbone.img_size // c.backbone.patch
        return DPTHead(c, name="head")(feats, (g, g), pixels.shape[1:3])


def depth_to_u8(depth: jnp.ndarray) -> jnp.ndarray:
    """Normalize a relative-depth map to a uint8 visualization channel
    (the reference saves depth as 0-255 grayscale for visual_depth)."""
    d = depth - jnp.min(depth, axis=(-2, -1), keepdims=True)
    d = d / jnp.maximum(jnp.max(d, axis=(-2, -1), keepdims=True), 1e-8)
    return jnp.round(d * 255).astype(jnp.uint8)
