"""VILA-class VLM — the reference pre-filter's VQA judge
(other_modules/vila, 10.5k LoC llava stack; used ONLY through
`load_pretrained_model` + `model.generate` in pre_filter.py:98-106,308-345).

Rebuilt as the llava composition it is: vision tower (SigLIP/CLIP ViT —
our CLIPVisionEncoder skeleton) → 2-layer GELU mm projector → image tokens
spliced before the prompt embeddings of a Llama decoder. One generate call
answers the background/VQA questions; yes/no scoring compares the first
generated token.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from anyedit_tpu.models.clip import CLIPVisionConfig, CLIPVisionEncoder, TINY_VISION
from anyedit_tpu.models.llama import Llama, LlamaConfig, LLAMA3_8B, TINY_LLAMA


@dataclasses.dataclass(frozen=True)
class VilaConfig:
    # llava-1.5 semantics: CLIP ViT-L/14-336 features from hidden layer -2
    # (the tower is built with the LAST block dropped — exactly HF's
    # vision_feature_layer=-2 — so the checkpoint's final block is simply
    # never instantiated) and the CLS token excluded ("default" strategy).
    vision: CLIPVisionConfig = CLIPVisionConfig(image_size=336, patch=14,
                                                hidden=1024, layers=23,
                                                heads=16, use_proj=False)
    lm: LlamaConfig = dataclasses.replace(
        LLAMA3_8B, vocab_size=32064, kv_heads=32, ffn_dim=11008,
        rope_theta=10000.0)                      # vicuna-7b (llava-1.5)
    dtype: Any = jnp.bfloat16


VILA_1_5 = VilaConfig()
TINY_VILA = VilaConfig(vision=dataclasses.replace(TINY_VISION,
                                                  use_proj=False),
                       lm=TINY_LLAMA)


class MMProjector(nn.Module):
    """llava mm projector: vision hidden → 2-layer exact-GELU MLP → lm
    dim (HF LlavaMultiModalProjector linear_1/linear_2)."""

    lm_dim: int

    @nn.compact
    def __call__(self, tokens):
        h = nn.Dense(self.lm_dim, dtype=jnp.float32, name="fc1")(
            tokens.astype(jnp.float32))
        return nn.Dense(self.lm_dim, dtype=jnp.float32, name="fc2")(
            nn.gelu(h, approximate=False))


class VilaVQA(nn.Module):
    """(pixels (B,S,S,3) CLIP-normalized, prompt ids (B,L)) →
    first-answer-token logits (B, V)."""

    cfg: VilaConfig = VILA_1_5

    def setup(self):
        self.vision = CLIPVisionEncoder(self.cfg.vision)
        self.projector = MMProjector(self.cfg.lm.dim)
        self.lm = Llama(self.cfg.lm)

    def __call__(self, pixels, prompt_ids):
        tokens, _ = self.vision(pixels)
        # llava "default" feature select: drop the CLS token
        img_emb = self.projector(tokens[:, 1:]).astype(self.cfg.lm.dtype)
        txt_emb = self.lm.embed(prompt_ids)
        embeds = jnp.concatenate([img_emb, txt_emb], axis=1)
        logits, _ = self.lm.prefill(embeds, embeds.shape[1])
        return logits     # next-token logits after the prompt
