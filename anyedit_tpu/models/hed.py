"""HED soft-edge (scribble) detector.

Checkpoint-exact rebuild of the reference `ControlNetHED_Apache2`
(other_modules/HED/__init__.py:15-52): a learned per-channel input shift,
five DoubleConvBlocks (64/128/256/512/512 with 2/2/3/3/3 convs, max-pool
before blocks 2-5), a 1x1 projection per stage; the edge map is
sigmoid(mean of the five projections upsampled to input size). The
reference INVERTS the saved map (bitwise_not) for scribble rendering —
`scribble_postprocess` keeps that convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

HED_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class HED(nn.Module):
    """(B, H, W, 3) RGB in [0,255] → (B, H, W) soft edges in [0,1]."""

    @nn.compact
    def __call__(self, pixels):
        x = pixels.astype(jnp.float32)
        shift = self.param("norm", nn.initializers.zeros, (3,), jnp.float32)
        x = x - shift
        h, w = pixels.shape[1:3]
        projections = []
        for si, (ch, n) in enumerate(HED_STAGES):
            if si > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci in range(n):
                x = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"b{si}_conv{ci}")(x)
                x = nn.relu(x)
            proj = nn.Conv(1, (1, 1), name=f"b{si}_proj")(x)
            projections.append(jax.image.resize(
                proj, (proj.shape[0], h, w, 1), "bilinear"))
        mean = jnp.mean(jnp.concatenate(projections, axis=-1), axis=-1)
        return nn.sigmoid(mean)


def scribble_postprocess(edges: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Binarize; the reference saves the INVERTED map (HEDdetector writes
    bitwise_not) so scribbles are dark-on-light."""
    return (1 - (edges > threshold).astype(jnp.uint8)) * 255
