"""Depth estimators: DepthAnythingV2 (DINOv2 + DPT head) and the DPT head
itself (also covers the reference's standalone MiDaS-style DPT,
other_modules/DPT/dpt/models.py).

Parity target: `DepthAnythingV2` (other_modules/depth_anything_v2/dpt.py)
as used by visual_condition_tool.py:47-135 (img2depth). Four intermediate
DINOv2 layers → reassemble to 4 scales → residual fusion → depth.
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
    dtype: Any = jnp.bfloat16


DEPTH_ANYTHING_L = DPTConfig()
TINY_DEPTH = DPTConfig(backbone=TINY_DINO, take_layers=(0, 0, 1, 1),
                       feat_dim=16)


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
        # reassemble: project each tap and move to scales (4x, 2x, 1x, 0.5x)
        scales = (4, 2, 1, 0.5)
        for i, f in enumerate(layer_feats):
            b, n, d = f.shape
            fm = f.reshape(b, gh, gw, d).astype(c.dtype)
            fm = nn.Conv(c.feat_dim, (1, 1), dtype=c.dtype, name=f"proj_{i}")(fm)
            s = scales[i]
            fm = _resize2d(fm, (max(1, int(gh * s)), max(1, int(gw * s))))
            fm = nn.Conv(c.feat_dim, (3, 3), padding="SAME", dtype=c.dtype,
                         name=f"smooth_{i}")(fm)
            feats.append(fm)
        # fuse coarse→fine
        x = feats[-1]
        for i in reversed(range(3)):
            x = ResidualConvUnit(c.feat_dim, c.dtype, name=f"rcu_{i}a")(x)
            x = _resize2d(x, feats[i].shape[1:3])
            x = x + feats[i]
            x = ResidualConvUnit(c.feat_dim, c.dtype, name=f"rcu_{i}b")(x)
        x = _resize2d(x, out_hw)
        x = nn.Conv(c.feat_dim // 2, (3, 3), padding="SAME", dtype=c.dtype,
                    name="out1")(x)
        x = nn.relu(x)
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
