"""BLIP-2 — Q-Former VQA scorer for the filter layer.

Parity target: `Blip2ForConditionalGeneration` (blip2-flan-t5-xl) used as a
yes/no VQA gate in reference filter_tool/utils.py:55-94 (`fliter_condition`
'is the background of the picture a {X}? yes or no') and
pre_filter.py:347-370. Architecture: frozen ViT image tokens → Q-Former
(BERT-style blocks whose 32 learned queries cross-attend to the image every
other layer) → linear to the LM dim → flan-T5 decoder scores answers.

`yes_no` avoids generation entirely: one decoder step scores the 'yes' vs
'no' token logits — deterministic and batchable (TPU-friendly).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.layers import LayerNorm
from anyedit_tpu.models.t5 import T5Config, T5Decoder, T5Encoder, FLAN_T5_XL, TINY_T5
from anyedit_tpu.ops.attention import sdpa_xla


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    num_queries: int = 32
    dim: int = 768
    layers: int = 12
    heads: int = 12
    cross_every: int = 2        # cross-attend to the image every N layers
    image_dim: int = 1408       # EVA ViT-g feature width
    lm: T5Config = FLAN_T5_XL
    dtype: Any = jnp.bfloat16


BLIP2_QFORMER = QFormerConfig()
TINY_QFORMER = QFormerConfig(num_queries=4, dim=32, layers=2, heads=2,
                             cross_every=1, image_dim=16, lm=TINY_T5)


class QFormerBlock(nn.Module):
    """POST-norm BERT layer, exactly the HF Blip2QFormerLayer shape:
    residual → output dense → LayerNorm; cross-attention K/V project the
    RAW image width (1408); query-path FFN (intermediate_query /
    output_query). This 1:1 structure is what lets real blip2 checkpoints
    convert (weights/convert.py::convert_blip2)."""

    cfg: QFormerConfig
    with_cross: bool

    @nn.compact
    def __call__(self, q_tokens, image_tokens):
        c = self.cfg
        hd = c.dim // c.heads
        b, l = q_tokens.shape[0], q_tokens.shape[1]
        sp = lambda t, ln: t.reshape(b, ln, c.heads, hd).transpose(0, 2, 1, 3)

        sa = sdpa_xla(
            sp(nn.Dense(c.dim, dtype=c.dtype, name="sq")(q_tokens), l),
            sp(nn.Dense(c.dim, dtype=c.dtype, name="sk")(q_tokens), l),
            sp(nn.Dense(c.dim, dtype=c.dtype, name="sv")(q_tokens), l))
        sa = nn.Dense(c.dim, dtype=c.dtype, name="so")(
            sa.transpose(0, 2, 1, 3).reshape(b, l, c.dim))
        q_tokens = LayerNorm(dtype=c.dtype, name="ln_sa")(q_tokens + sa)

        if self.with_cross:
            li = image_tokens.shape[1]
            img = image_tokens.astype(c.dtype)
            ca = sdpa_xla(
                sp(nn.Dense(c.dim, dtype=c.dtype, name="cq")(q_tokens), l),
                sp(nn.Dense(c.dim, dtype=c.dtype, name="ck")(img), li),
                sp(nn.Dense(c.dim, dtype=c.dtype, name="cv")(img), li))
            ca = nn.Dense(c.dim, dtype=c.dtype, name="co")(
                ca.transpose(0, 2, 1, 3).reshape(b, l, c.dim))
            q_tokens = LayerNorm(dtype=c.dtype, name="ln_ca")(q_tokens + ca)

        h = nn.Dense(4 * c.dim, dtype=c.dtype, name="fc1")(q_tokens)
        h = nn.Dense(c.dim, dtype=c.dtype, name="fc2")(
            nn.gelu(h, approximate=False))
        return LayerNorm(dtype=c.dtype, name="ln_ff")(q_tokens + h)


class QFormer(nn.Module):
    """image patch features (B, N, Di) → query embeddings (B, Q, lm_dim).

    Mirrors HF Blip2QFormerModel + query_tokens + language_projection:
    learned queries pass an input LayerNorm (qformer.layernorm), then
    post-norm blocks cross-attending the raw 1408-wide image tokens every
    `cross_every` layers."""

    cfg: QFormerConfig = BLIP2_QFORMER

    @nn.compact
    def __call__(self, image_tokens):
        c = self.cfg
        b = image_tokens.shape[0]
        queries = self.param("queries", nn.initializers.normal(0.02),
                             (c.num_queries, c.dim), jnp.float32)
        x = jnp.broadcast_to(queries[None].astype(c.dtype),
                             (b, c.num_queries, c.dim))
        x = LayerNorm(dtype=c.dtype, name="ln_in")(x)
        for i in range(c.layers):
            x = QFormerBlock(c, with_cross=(i % c.cross_every == 0),
                             name=f"block_{i}")(x, image_tokens)
        return nn.Dense(c.lm.dim, dtype=jnp.float32, name="lm_proj")(
            x.astype(jnp.float32))


class Blip2VQA(nn.Module):
    """(image_tokens, question_ids, question_mask) → logits of decoder step 1.

    `yes_no(logits, yes_id, no_id)` compares the first generated token.
    """

    cfg: QFormerConfig = BLIP2_QFORMER

    def setup(self):
        self.qformer = QFormer(self.cfg)
        self.encoder = T5Encoder(self.cfg.lm)
        self.decoder = T5Decoder(self.cfg.lm)

    def __call__(self, image_tokens, question_ids, question_mask):
        q_emb = self.qformer(image_tokens)                      # (B, Q, D)
        text = self.encoder(question_ids, question_mask)        # (B, L, D)
        enc = jnp.concatenate([q_emb, text], axis=1)
        enc_mask = jnp.concatenate(
            [jnp.ones((question_ids.shape[0], q_emb.shape[1]), bool),
             question_mask], axis=1)
        start = jnp.zeros((question_ids.shape[0], 1), jnp.int32)  # <pad> BOS
        logits = self.decoder(start, enc, enc_mask)
        return logits[:, 0]                                     # (B, vocab)


def yes_no(first_token_logits: jnp.ndarray, yes_id: int, no_id: int) -> jnp.ndarray:
    """(B,) bool: True where 'yes' outranks 'no'."""
    return first_token_logits[:, yes_id] > first_token_logits[:, no_id]
