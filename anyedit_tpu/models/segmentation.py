"""Semantic segmentation for `img2seg` (visual_segment).

The reference vendors 43k LoC of mmcv+mmseg to run ONE UperNet
checkpoint (visual_condition_tool.py:137-143, uniformer/exp/
upernet_global_small). Here: an UperNet head on our own Swin backbone —
same output contract (ADE20K-style class map rendered to a color image),
two orders of magnitude less code.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from anyedit_tpu.models.swin import SwinTransformer, SwinConfig, SWIN_T, TINY_SWIN


@dataclasses.dataclass(frozen=True)
class SegConfig:
    backbone: SwinConfig = dataclasses.replace(SWIN_T, out_indices=(0, 1, 2, 3))
    num_classes: int = 150          # ADE20K
    feat_dim: int = 512             # openmmlab upernet-swin decode channels
    pool_scales: tuple[int, ...] = (1, 2, 3, 6)
    dtype: Any = jnp.bfloat16


UPERNET_SWIN_T = SegConfig()
TINY_SEG = SegConfig(backbone=dataclasses.replace(TINY_SWIN,
                                                  out_indices=(0, 1)),
                     num_classes=8, feat_dim=16, pool_scales=(1, 2))


def _resize(x, hw):
    """mmseg `resize(..., mode='bilinear', align_corners=False)`."""
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            "bilinear")


def adaptive_avg_pool(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d(s) on NHWC: output cell (i,j) averages input
    rows [floor(i·h/s), ceil((i+1)·h/s)) — exact for any h, not just h % s
    == 0 (pool_scales (1,2,3,6) over 16×16 ADE features hit the ragged
    case). Boundaries are static under jit."""
    b, h, w, ch = x.shape
    rows = [x[:, (i * h) // s:-((-(i + 1) * h) // s)].mean(axis=1)
            for i in range(s)]
    x = jnp.stack(rows, axis=1)                        # (B, s, W, C)
    cols = [x[:, :, (j * w) // s:-((-(j + 1) * w) // s)].mean(axis=2)
            for j in range(s)]
    return jnp.stack(cols, axis=2)                     # (B, s, s, C)


class UperNetHead(nn.Module):
    """Exact mmseg/HF UPerHead structure (BatchNorms folded into the convs
    at conversion time — inference-only): PSP over the coarsest map with
    adaptive average pooling and the raw map in the concat, 1×1+ReLU
    laterals, top-down sum, 3×3+ReLU FPN convs on all but the PSP level,
    fuse bottleneck, 1×1 classifier. Matches
    transformers UperNetHead / mmseg decode_heads/uper_head.py."""

    cfg: SegConfig

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray], out_hw):
        c = self.cfg
        d = c.feat_dim
        # PSP on the coarsest map: [raw] + pooled ConvModule branches
        top = feats[-1]
        b, h, w, _ = top.shape
        psp = [top]
        for i, s in enumerate(c.pool_scales):
            pooled = adaptive_avg_pool(top, s)
            pooled = nn.relu(nn.Conv(d, (1, 1), dtype=c.dtype,
                                     name=f"ppm_{i}")(pooled))
            psp.append(_resize(pooled, (h, w)))
        x = nn.relu(nn.Conv(d, (3, 3), padding="SAME", dtype=c.dtype,
                            name="ppm_out")(jnp.concatenate(psp, axis=-1)))
        # FPN: 1x1 laterals on the finer maps, PSP output as the top level
        laterals = [nn.relu(nn.Conv(d, (1, 1), dtype=c.dtype,
                                    name=f"lat_{i}")(f))
                    for i, f in enumerate(feats[:-1])] + [x]
        for i in reversed(range(len(laterals) - 1)):
            laterals[i] = laterals[i] + _resize(laterals[i + 1],
                                                laterals[i].shape[1:3])
        # 3x3 fpn convs on all but the PSP level (uper_head.py fpn_outs)
        outs = [nn.relu(nn.Conv(d, (3, 3), padding="SAME", dtype=c.dtype,
                                name=f"fpn_{i}")(l))
                for i, l in enumerate(laterals[:-1])] + [laterals[-1]]
        size0 = outs[0].shape[1:3]
        fused = jnp.concatenate([_resize(o, size0) for o in outs], axis=-1)
        fused = nn.relu(nn.Conv(d, (3, 3), padding="SAME", dtype=c.dtype,
                                name="fuse")(fused))
        logits = nn.Conv(c.num_classes, (1, 1), dtype=jnp.float32,
                         name="cls")(fused.astype(jnp.float32))
        return _resize(logits, out_hw)


class UperNetSegmenter(nn.Module):
    """pixels (B,S,S,3) ImageNet-normalized → class logits (B,S,S,K)."""

    cfg: SegConfig = UPERNET_SWIN_T

    @nn.compact
    def __call__(self, pixels):
        feats_map = SwinTransformer(self.cfg.backbone, name="backbone")(pixels)
        feats = [feats_map[k] for k in sorted(feats_map)]
        return UperNetHead(self.cfg, name="head")(feats, pixels.shape[1:3])


# ADE20K-ish palette for rendering class maps to color images (the
# reference saves show_result() renderings as the visual_input channel)
def ade_palette(num_classes: int = 150) -> np.ndarray:
    rng = np.random.default_rng(42)
    pal = rng.integers(0, 255, (num_classes, 3), np.uint8)
    pal[0] = (120, 120, 120)
    return pal


def render_segmentation(logits: jnp.ndarray, palette: np.ndarray | None = None
                        ) -> np.ndarray:
    cls = np.asarray(jnp.argmax(logits, axis=-1))
    pal = palette if palette is not None else ade_palette(logits.shape[-1])
    return pal[cls]
