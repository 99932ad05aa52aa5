"""DINOv2 ViT — shared backbone for AnyDoor conditioning and DepthAnythingV2.

Parity targets: reference `ldm/modules/encoders/modules.py:279`
(FrozenDinoV2Encoder feeding AnyDoor) and
`other_modules/depth_anything_v2/dinov2.py` (backbone of DepthAnythingV2).
Standard ViT with cls token, LayerScale, and selectable intermediate-layer
outputs; fixed input bucket (518 → 37×37 patches for ViT-L/14).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.layers import LayerNorm
from anyedit_tpu.ops.attention import sdpa_xla


@dataclasses.dataclass(frozen=True)
class DinoV2Config:
    img_size: int = 518
    patch: int = 14
    dim: int = 1024           # ViT-L
    depth: int = 24
    heads: int = 16
    layerscale_init: float = 1e-5
    # ViT-S/B/L use a plain GELU MLP; ViT-g ("giant2") uses SwiGLU-fused
    # (dinov2 hub swiglufused: hidden = round(dim*4 * 2/3 / 8) * 8).
    ffn: str = "mlp"
    dtype: Any = jnp.bfloat16

    @property
    def swiglu_hidden(self) -> int:
        return int(self.dim * 4 * 2 / 3 + 7) // 8 * 8


DINOV2_L = DinoV2Config()
DINOV2_G = DinoV2Config(dim=1536, depth=40, heads=24, ffn="swiglu")
TINY_DINO = DinoV2Config(img_size=28, patch=7, dim=32, depth=2, heads=2)


class DinoBlock(nn.Module):
    cfg: DinoV2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hd = c.dim // c.heads
        b, l, _ = x.shape
        h = LayerNorm(dtype=c.dtype, eps=1e-6, name="ln1")(x)
        qkv = nn.Dense(3 * c.dim, dtype=c.dtype, name="qkv")(h)
        qkv = qkv.reshape(b, l, 3, c.heads, hd).transpose(2, 0, 3, 1, 4)
        o = sdpa_xla(qkv[0], qkv[1], qkv[2])
        o = o.transpose(0, 2, 1, 3).reshape(b, l, c.dim)
        o = nn.Dense(c.dim, dtype=c.dtype, name="proj")(o)
        g1 = self.param("ls1", nn.initializers.constant(c.layerscale_init),
                        (c.dim,), jnp.float32)
        x = x + g1 * o
        h = LayerNorm(dtype=c.dtype, eps=1e-6, name="ln2")(x)
        if c.ffn == "swiglu":
            # hub SwiGLUFFNFused: w12 → (w1 | w2), out = w3(silu(w1·x) ⊙ w2·x)
            hid = c.swiglu_hidden
            h12 = nn.Dense(2 * hid, dtype=c.dtype, name="w12")(h)
            h = nn.Dense(c.dim, dtype=c.dtype, name="w3")(
                nn.silu(h12[..., :hid]) * h12[..., hid:])
        else:
            h = nn.Dense(4 * c.dim, dtype=c.dtype, name="fc1")(h)
            # official DINOv2 uses torch nn.GELU (exact erf)
            h = nn.Dense(c.dim, dtype=c.dtype, name="fc2")(
                nn.gelu(h, approximate=False))
        g2 = self.param("ls2", nn.initializers.constant(c.layerscale_init),
                        (c.dim,), jnp.float32)
        return x + g2 * h


class DinoV2(nn.Module):
    """pixels (B,S,S,3) ImageNet-normalized → dict with 'cls' (B,D),
    'patch' (B,N,D), and 'layers' {idx: (B,N,D)} for requested indices."""

    cfg: DinoV2Config = DINOV2_L
    return_layers: tuple[int, ...] = ()

    @nn.compact
    def __call__(self, pixels):
        c = self.cfg
        b = pixels.shape[0]
        x = nn.Conv(c.dim, (c.patch, c.patch), strides=(c.patch, c.patch),
                    dtype=c.dtype, name="patch_embed")(pixels.astype(c.dtype))
        n = (c.img_size // c.patch) ** 2
        x = x.reshape(b, n, c.dim)
        cls = self.param("cls", nn.initializers.normal(0.02), (c.dim,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(c.dtype), (b, 1, c.dim)), x], axis=1)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (n + 1, c.dim), jnp.float32)
        x = x + pos[None].astype(c.dtype)
        layers = {}
        ln_f = LayerNorm(dtype=c.dtype, eps=1e-6, name="ln_final")
        for i in range(c.depth):
            x = DinoBlock(c, name=f"block_{i}")(x)
            if i in self.return_layers:
                # intermediate features carry the FINAL norm (official
                # get_intermediate_layers(norm=True) / HF apply_layernorm —
                # what DepthAnything's DPT head consumes)
                layers[i] = ln_f(x[:, 1:]).astype(jnp.float32)
        x = ln_f(x)
        return {"cls": x[:, 0].astype(jnp.float32),
                "patch": x[:, 1:].astype(jnp.float32),
                "layers": layers}
