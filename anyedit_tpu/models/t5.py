"""T5 encoder/decoder — text conditioning for SD3/Flux and BLIP-2's LM.

Parity targets: the reference's `_get_t5_prompt_embeds`
(attribute_tool.py:159, SD3's T5-XXL tower), Flux's T5 conditioning, and
`Blip2ForConditionalGeneration`'s flan-t5 decoder (filter_tool/utils.py:52).
Standard T5 v1.1 semantics: RMSNorm, relative-position-bucket attention
bias (encoder bidirectional, decoder causal), gated-GeLU MLP, tied-free
lm head.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from anyedit_tpu.ops.attention import sdpa_xla


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    dim: int = 4096            # T5-XXL
    kv_dim: int = 64
    heads: int = 64
    ffn_dim: int = 10240
    enc_layers: int = 24
    dec_layers: int = 24
    rel_buckets: int = 32
    rel_max_dist: int = 128
    dtype: Any = jnp.bfloat16


T5_XXL = T5Config()
FLAN_T5_XL = T5Config(dim=2048, heads=32, kv_dim=64, ffn_dim=5120,
                      enc_layers=24, dec_layers=24)
TINY_T5 = T5Config(vocab_size=64, dim=32, kv_dim=8, heads=4, ffn_dim=64,
                   enc_layers=2, dec_layers=2)


class RMSNorm(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        g = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
        return (n * g).astype(self.dtype)


def rel_pos_bucket(rel: jnp.ndarray, bidirectional: bool, num_buckets: int,
                   max_dist: int) -> jnp.ndarray:
    """T5 relative-position bucketing (log-spaced beyond max_exact)."""
    ret = jnp.zeros_like(rel)
    n = -rel
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_dist / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, n, large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_rel_bias: bool = False
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, kv=None, bias=None, pos_bias=None):
        """Returns (out, pos_bias): layer 0 computes the relative-position
        bias from its table and RETURNS it; later layers receive and reuse
        it (HF T5 shares block-0's position bias across every block)."""
        c = self.cfg
        inner = c.heads * c.kv_dim
        kv = x if kv is None else kv
        b, lq = x.shape[0], x.shape[1]
        lk = kv.shape[1]
        q = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="k")(kv)
        v = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="v")(kv)
        sp = lambda t, l: t.reshape(b, l, c.heads, c.kv_dim).transpose(0, 2, 1, 3)
        q, k, v = sp(q, lq), sp(k, lk), sp(v, lk)
        if self.has_rel_bias:
            table = self.param("rel_bias", nn.initializers.normal(0.02),
                               (c.rel_buckets, c.heads), jnp.float32)
            rel = (jnp.arange(lk)[None, :] - jnp.arange(lq)[:, None])
            bucket = rel_pos_bucket(rel, self.bidirectional, c.rel_buckets,
                                    c.rel_max_dist)
            pos_bias = table[bucket].transpose(2, 0, 1)[None]
        total_bias = jnp.zeros((1, c.heads, lq, lk), jnp.float32)
        if pos_bias is not None:
            total_bias = total_bias + pos_bias
        if bias is not None:
            total_bias = total_bias + bias
        # T5 uses unscaled dot-product (scale folded into init)
        o = sdpa_xla(q, k, v, scale=1.0, bias=total_bias)
        o = o.transpose(0, 2, 1, 3).reshape(b, lq, inner)
        return nn.Dense(c.dim, use_bias=False, dtype=c.dtype, name="o")(o), \
            pos_bias


class T5FFN(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        g = nn.Dense(c.ffn_dim, use_bias=False, dtype=c.dtype, name="wi0")(x)
        u = nn.Dense(c.ffn_dim, use_bias=False, dtype=c.dtype, name="wi1")(x)
        return nn.Dense(c.dim, use_bias=False, dtype=c.dtype, name="wo")(
            nn.gelu(g) * u)


class T5Encoder(nn.Module):
    cfg: T5Config = T5_XXL

    @nn.compact
    def __call__(self, ids, mask=None):
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.dim, dtype=c.dtype, name="emb")(ids)
        kpm = None
        if mask is not None:
            kpm = jnp.where(mask, 0.0, -1e9)[:, None, None, :]
        pos_bias = None
        for i in range(c.enc_layers):
            h = RMSNorm(c.dtype, name=f"ln_a_{i}")(x)
            a, pos_bias = T5Attention(c, has_rel_bias=(i == 0),
                                      bidirectional=True,
                                      name=f"attn_{i}")(h, bias=kpm,
                                                        pos_bias=pos_bias)
            x = x + a
            h = RMSNorm(c.dtype, name=f"ln_f_{i}")(x)
            x = x + T5FFN(c, name=f"ffn_{i}")(h)
        return RMSNorm(c.dtype, name="ln_final")(x).astype(jnp.float32)


class T5Decoder(nn.Module):
    """Single-pass decoder (enough for yes/no scoring and short captions)."""

    cfg: T5Config = FLAN_T5_XL

    @nn.compact
    def __call__(self, ids, enc_out, enc_mask=None):
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.dim, dtype=c.dtype, name="emb")(ids)
        l = ids.shape[1]
        causal = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)[None, None]
        kpm = None
        if enc_mask is not None:
            kpm = jnp.where(enc_mask, 0.0, -1e9)[:, None, None, :]
        enc = enc_out.astype(c.dtype)
        pos_bias = None
        for i in range(c.dec_layers):
            h = RMSNorm(c.dtype, name=f"ln_a_{i}")(x)
            a, pos_bias = T5Attention(c, has_rel_bias=(i == 0),
                                      bidirectional=False,
                                      name=f"self_{i}")(h, bias=causal,
                                                        pos_bias=pos_bias)
            x = x + a
            h = RMSNorm(c.dtype, name=f"ln_x_{i}")(x)
            ca, _ = T5Attention(c, name=f"cross_{i}")(h, kv=enc, bias=kpm)
            x = x + ca
            h = RMSNorm(c.dtype, name=f"ln_f_{i}")(x)
            x = x + T5FFN(c, name=f"ffn_{i}")(h)
        x = RMSNorm(c.dtype, name="ln_final")(x)
        logits = nn.Dense(c.vocab_size, use_bias=False, dtype=jnp.float32,
                          name="lm_head")(x.astype(jnp.float32))
        return logits
