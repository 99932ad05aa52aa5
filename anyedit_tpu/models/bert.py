"""BERT text encoder (GroundingDINO's language tower).

Parity with the reference's HF `bert-base-uncased` wrapped by
`BertModelWarper` (GroundingDINO/groundingdino/util/bertwarper.py:17):
standard bidirectional transformer encoder; GroundingDINO additionally
restricts attention to within-phrase spans via an attention-mask matrix
built from special tokens (`generate_masks_with_special_tokens...`) — that
mask is computed host-side in grounding/text.py and passed in here.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.layers import LayerNorm
from anyedit_tpu.ops.attention import sdpa_xla


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    max_len: int = 512
    type_vocab: int = 2
    dtype: Any = jnp.bfloat16


BERT_BASE = BertConfig()
TINY_BERT = BertConfig(vocab_size=128, hidden=32, layers=2, heads=2, max_len=32)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        hd = c.hidden // c.heads
        q = nn.Dense(c.hidden, dtype=c.dtype, name="q")(x)
        k = nn.Dense(c.hidden, dtype=c.dtype, name="k")(x)
        v = nn.Dense(c.hidden, dtype=c.dtype, name="v")(x)
        b, l = x.shape[0], x.shape[1]
        sp = lambda t: t.reshape(b, l, c.heads, hd).transpose(0, 2, 1, 3)
        out = sdpa_xla(sp(q), sp(k), sp(v), bias=bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, c.hidden)
        out = nn.Dense(c.hidden, dtype=c.dtype, name="attn_out")(out)
        x = LayerNorm(dtype=c.dtype, name="ln1")(x + out)
        h = nn.Dense(c.hidden * 4, dtype=c.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)   # HF BERT uses exact-erf gelu
        h = nn.Dense(c.hidden, dtype=c.dtype, name="fc2")(h)
        return LayerNorm(dtype=c.dtype, name="ln2")(x + h)


class BertEncoder(nn.Module):
    """(ids, attn_bias) → hidden states (B, L, H).

    attn_bias: (B|1, 1|H, L, L) additive fp32 mask (0 = attend, -inf = not),
    or None for full bidirectional attention.
    """

    cfg: BertConfig = BERT_BASE

    @nn.compact
    def __call__(self, ids, attn_bias=None, token_type=None,
                 position_ids=None):
        c = self.cfg
        b, l = ids.shape
        x = nn.Embed(c.vocab_size, c.hidden, dtype=c.dtype, name="tok")(ids)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (c.max_len, c.hidden), jnp.float32)
        if position_ids is None:
            x = x + pos[None, :l].astype(c.dtype)
        else:
            # GroundingDINO restarts position ids per phrase segment
            # (bertwarper.py generate_masks_with_special_tokens...)
            x = x + pos[position_ids].astype(c.dtype)
        if token_type is None:
            token_type = jnp.zeros_like(ids)
        x = x + nn.Embed(c.type_vocab, c.hidden, dtype=c.dtype,
                         name="type")(token_type)
        x = LayerNorm(dtype=c.dtype, name="emb_ln")(x)
        for i in range(c.layers):
            x = BertLayer(c, name=f"layer_{i}")(x, attn_bias)
        return x.astype(jnp.float32)
