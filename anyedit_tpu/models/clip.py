"""CLIP text + vision towers.

One implementation covers the zoo's many CLIP uses (reference:
FrozenCLIPEmbedder ldm/modules/encoders/modules.py:107 for SD conditioning;
CLIP-ViT-H-14 / ViT-B-32 / ViT-L-14 scorers in filter_tool/utils.py:21,280
and pre_filter.py; SAM/GroundingDINO image normalization conventions differ
and live in their own modules).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.layers import LayerNorm, MultiHeadAttention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    max_len: int = 77
    dtype: Any = jnp.bfloat16
    # "quick_gelu" for OpenAI CLIP (SD1.x text encoder), "gelu" for OpenCLIP
    activation: str = "quick_gelu"
    # >0 → the checkpoint is a CLIPTextModelWithProjection: `pooled` gets a
    # bias-free Dense to this dim (SDXL text_encoder_2, both SD3 CLIP towers).
    text_proj: int = 0


CLIP_L_TEXT = CLIPTextConfig()                                     # SD1.5 / ViT-L
CLIP_H_TEXT = CLIPTextConfig(hidden=1024, layers=24, heads=16, activation="gelu")
CLIP_B32_TEXT = CLIPTextConfig(hidden=512, layers=12, heads=8)
# OpenCLIP bigG — SDXL's second tower (ctx 2048 = 768 + 1280 concat).
# SDXL/SD3 ship it as CLIPTextModelWithProjection → projected pooled.
CLIP_BIGG_TEXT = CLIPTextConfig(hidden=1280, layers=32, heads=20,
                                activation="gelu", text_proj=1280)
TINY_TEXT = CLIPTextConfig(vocab_size=256, hidden=32, layers=2, heads=2, max_len=16)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch: int = 14
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    proj_dim: int = 768
    mlp_dim: int = 0          # 0 → 4·hidden; EVA-g uses 6144 (ratio 4.3637)
    # CLIP towers have a pre-LN after the embeddings and a projection head;
    # the BLIP-2 EVA tower (Blip2VisionModel) has neither — instead its
    # post_layernorm applies to the WHOLE token sequence, and the patch
    # conv carries a bias.
    pre_ln: bool = True
    use_proj: bool = True
    patch_bias: bool = False
    dtype: Any = jnp.bfloat16
    activation: str = "quick_gelu"


CLIP_L_VISION = CLIPVisionConfig()
CLIP_H_VISION = CLIPVisionConfig(hidden=1280, layers=32, heads=16,
                                 proj_dim=1024, activation="gelu")
CLIP_B32_VISION = CLIPVisionConfig(patch=32, hidden=768, layers=12, heads=12,
                                   proj_dim=512)
# EVA ViT-g/14 — BLIP-2's frozen image encoder (feature width 1408,
# reference Blip2ForConditionalGeneration vision tower): exact 6144-wide
# MLP (EVA's 4.3637 ratio), 39 post-embed layers.
EVA_VIT_G = CLIPVisionConfig(image_size=224, patch=14, hidden=1408,
                             layers=39, heads=16, proj_dim=1024,
                             mlp_dim=6144, activation="gelu",
                             pre_ln=False, use_proj=False, patch_bias=True)
TINY_VISION = CLIPVisionConfig(image_size=32, patch=8, hidden=32, layers=2,
                               heads=2, proj_dim=16)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    # HF "gelu" / OpenCLIP nn.GELU are the EXACT erf form; flax defaults to
    # the tanh approximation (≈3e-4 drift per MLP — visible in golden tests).
    return lambda x: nn.gelu(x, approximate=False)


class CLIPBlock(nn.Module):
    hidden: int
    heads: int
    dtype: Any
    activation: str
    tag: str
    mlp_dim: int = 0          # 0 → 4·hidden

    @nn.compact
    def __call__(self, x, mask_bias=None):
        hd = self.hidden // self.heads
        h = LayerNorm(dtype=self.dtype, name="ln1")(x)
        extra = {"bias": mask_bias} if mask_bias is not None else None
        # causal masking is applied via a processor closure in the encoder
        attn = MultiHeadAttention(self.heads, hd, self.hidden, self.tag, True,
                                  dtype=self.dtype, qkv_bias=True, name="attn")
        x = x + attn(h, None, self._processor(mask_bias), None)
        h = LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.mlp_dim or self.hidden * 4, dtype=self.dtype,
                     name="fc1")(h)
        h = _act(self.activation)(h)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        return x + h

    @staticmethod
    def _processor(mask_bias):
        if mask_bias is None:
            return None
        from anyedit_tpu.ops.attention import sdpa_xla

        def proc(q, k, v, meta, extra):
            return sdpa_xla(q, k, v, bias=mask_bias)
        return proc


class CLIPTextEncoder(nn.Module):
    """Returns (last_hidden (B,L,H), pooled (B,H or text_proj), penult
    (B,L,H)). `pooled` = EOS-token embedding (argmax of ids, CLIP
    convention), projected when cfg.text_proj > 0 (the HF
    CLIPTextModelWithProjection `text_embeds`). `penult` = the layer -2
    hidden states WITHOUT the final LayerNorm — the diffusers clip_skip
    convention SDXL/SD3 condition on (pipeline_stable_diffusion_xl
    `hidden_states[-2]`; reference attribute_tool.py:210-258 inherits it)."""

    cfg: CLIPTextConfig = CLIP_L_TEXT

    @nn.compact
    def __call__(self, ids: jnp.ndarray):
        c = self.cfg
        b, l = ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden, dtype=c.dtype, name="token_emb")(ids)
        pos = self.param("pos_emb", nn.initializers.normal(0.01),
                         (c.max_len, c.hidden), jnp.float32)
        x = tok + pos[None, :l].astype(c.dtype)
        causal = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)[None, None]
        penult = x
        for i in range(c.layers):
            if i == c.layers - 1:
                penult = x
            x = CLIPBlock(c.hidden, c.heads, c.dtype, c.activation,
                          f"text.{i}", name=f"block_{i}")(x, causal)
        x = LayerNorm(dtype=c.dtype, name="ln_final")(x)
        eos = jnp.argmax(ids, axis=-1)
        pooled = x[jnp.arange(b), eos].astype(jnp.float32)
        if c.text_proj:
            pooled = nn.Dense(c.text_proj, use_bias=False, dtype=jnp.float32,
                              name="text_proj")(pooled)
        return (x.astype(jnp.float32), pooled,
                penult.astype(jnp.float32))


class CLIPTextModel(nn.Module):
    """Text tower + projection (for similarity scoring)."""

    cfg: CLIPTextConfig = CLIP_L_TEXT
    proj_dim: int = 768

    @nn.compact
    def __call__(self, ids):
        _, pooled, _ = CLIPTextEncoder(self.cfg, name="encoder")(ids)
        z = nn.Dense(self.proj_dim, use_bias=False, dtype=jnp.float32,
                     name="text_proj")(pooled)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)


class CLIPVisionEncoder(nn.Module):
    """Returns (patch_tokens (B,N+1,H), pooled-projected (B,P) L2-normed)."""

    cfg: CLIPVisionConfig = CLIP_L_VISION

    @nn.compact
    def __call__(self, pixels: jnp.ndarray):
        c = self.cfg
        b = pixels.shape[0]
        x = nn.Conv(c.hidden, (c.patch, c.patch), strides=(c.patch, c.patch),
                    use_bias=c.patch_bias, dtype=c.dtype, name="patch_emb")(
            pixels.astype(c.dtype))
        n = (c.image_size // c.patch) ** 2
        x = x.reshape(b, n, c.hidden)
        cls = self.param("cls", nn.initializers.normal(0.02), (c.hidden,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(c.dtype), (b, 1, c.hidden)), x], 1)
        pos = self.param("pos_emb", nn.initializers.normal(0.01),
                         (n + 1, c.hidden), jnp.float32)
        x = x + pos[None].astype(c.dtype)
        if c.pre_ln:
            x = LayerNorm(dtype=c.dtype, name="pre_ln")(x)
        for i in range(c.layers):
            x = CLIPBlock(c.hidden, c.heads, c.dtype, c.activation,
                          f"vis.{i}", mlp_dim=c.mlp_dim, name=f"block_{i}")(x)
        if not c.pre_ln:
            # BLIP-2/EVA: post_layernorm over the whole sequence — these
            # tokens (not the raw encoder output) feed the Q-Former
            x = LayerNorm(dtype=c.dtype, name="post_ln")(x)
            pooled = x[:, 0]
        else:
            pooled = LayerNorm(dtype=c.dtype, name="post_ln")(x[:, 0])
        if not c.use_proj:
            return x.astype(jnp.float32), pooled.astype(jnp.float32)
        z = nn.Dense(c.proj_dim, use_bias=False, dtype=jnp.float32,
                     name="visual_proj")(pooled.astype(jnp.float32))
        z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        return x.astype(jnp.float32), z
