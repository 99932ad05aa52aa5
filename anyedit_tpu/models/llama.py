"""Llama-class decoder — the instruction-generation LLM + VILA's language
tower.

The reference loads Llama-3-8B-Instruct via HF for instruction generation
(concept/utils.py:176-184) and VILA-1.5 (llava arch: vision tower + mm
projector + llama, vila/model/llava_arch.py) for the pre-filter VQA
(pre_filter.py:98-106). Rebuilt TPU-first:
  * GQA attention (kv_heads < heads) with RoPE, RMSNorm, SwiGLU — the
    Llama-3 block, all static shapes,
  * decode = prefill + per-token step over an explicit KV cache carried as
    arrays (no mutable state), so the whole generation loop jits,
  * VILA = CLIP/SigLIP vision tokens → 2-layer mm projector → prepended to
    the prompt embedding sequence (llava convention).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    dim: int = 4096
    layers: int = 32
    heads: int = 32
    kv_heads: int = 8            # GQA (Llama-3-8B)
    ffn_dim: int = 14336
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    qkv_bias: bool = False       # Qwen2-family (GOT-OCR2's LM) uses biases
    dtype: Any = jnp.bfloat16
    # W8A8 int8 block projections (ops/quant.py): halves decode-time HBM
    # weight traffic (the decode bound) and doubles prefill MXU rate.
    # Embedding, lm_head and norms stay float. Opt-in — LLM activation
    # outliers make int8 riskier here than on the diffusion UNets.
    quant: bool = False


LLAMA3_8B = LlamaConfig()
TINY_LLAMA = LlamaConfig(vocab_size=256, dim=32, layers=2, heads=4,
                         kv_heads=2, ffn_dim=64, rope_theta=10000.0)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       jnp.float32)
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + self.eps)
        return (y * w).astype(x.dtype)


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """x (B,H,L,D); positions (L,). Rotate half-dim pairs (Llama layout:
    first/second half split, not interleaved — matches HF rotate_half)."""
    d = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions.astype(jnp.float32)[:, None] * inv[None]        # (L,D/2)
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], -1)[None, None]
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], -1)[None, None]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rot * sin).astype(x.dtype)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, mask_bias, kv_cache=None):
        """x (B,L,D); kv_cache None or (k,v) (B,KVH,S,hd) prefilled; returns
        (x, (k_new, v_new)) with the cache extended/updated."""
        c = self.cfg
        hd = c.dim // c.heads
        b, l, _ = x.shape
        from anyedit_tpu.ops.quant import make_dense
        dense = lambda n, f, bias: make_dense(f, quant=c.quant, use_bias=bias,
                                              dtype=c.dtype, name=n)
        h = RMSNorm(c.norm_eps, name="attn_norm")(x)
        q = dense("wq", c.heads * hd, c.qkv_bias)(h)
        k = dense("wk", c.kv_heads * hd, c.qkv_bias)(h)
        v = dense("wv", c.kv_heads * hd, c.qkv_bias)(h)
        q = q.reshape(b, l, c.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, c.kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, c.kv_heads, hd).transpose(0, 2, 1, 3)
        q = rope(q, positions, c.rope_theta)
        k = rope(k, positions, c.rope_theta)
        if kv_cache is not None:
            ck, cv = kv_cache
            # write new k/v at `positions` (decode: l==1)
            ck = jax.lax.dynamic_update_slice(
                ck, k.astype(ck.dtype), (0, 0, positions[0], 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v.astype(cv.dtype), (0, 0, positions[0], 0))
            k, v = ck, cv
        new_cache = (k, v)
        # GQA: repeat kv heads
        rep = c.heads // c.kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        logits = logits + mask_bias
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, c.heads * hd)
        x = x + dense("wo", c.dim, False)(o.astype(c.dtype))
        h = RMSNorm(c.norm_eps, name="mlp_norm")(x)
        gate = dense("w_gate", c.ffn_dim, False)(h)
        up = dense("w_up", c.ffn_dim, False)(h)
        x = x + dense("w_down", c.dim, False)(nn.silu(gate) * up)
        return x, new_cache


class Llama(nn.Module):
    """Three entry points (methods under one param tree):
      * __call__(ids): full causal forward → logits (training/eval)
      * prefill(embeds, cache_len): fill KV caches from a prompt
      * decode_step(tok_emb, caches, pos): one-token step against caches
    Token embeddings are exposed via `embed` so VILA can splice image
    tokens into the prompt sequence.
    """

    cfg: LlamaConfig = LLAMA3_8B

    def setup(self):
        c = self.cfg
        self.tok = nn.Embed(c.vocab_size, c.dim, dtype=c.dtype, name="tok")
        self.blocks = [LlamaBlock(c, name=f"layer_{i}") for i in range(c.layers)]
        self.norm_f = RMSNorm(c.norm_eps, name="norm_f")
        self.lm_head = nn.Dense(c.vocab_size, use_bias=False,
                                dtype=jnp.float32, name="lm_head")

    def embed(self, ids):
        return self.tok(ids)

    def __call__(self, ids):
        return self.forward_embeds(self.tok(ids))

    def forward_embeds(self, embeds):
        """Full causal forward over pre-computed embeddings (B,L,D) —
        the multimodal entry (GOT-OCR/VILA splice image tokens in)."""
        return self.lm_head(
            self.norm_f(self.forward_hidden(embeds)).astype(jnp.float32))

    def forward_hidden(self, embeds):
        """forward_embeds minus norm_f/lm_head: final-block hidden states
        (B,L,D). Training losses slice the positions they score and apply
        norm_f + lm_head there only — at a 150k vocab the head over every
        position dominates the step otherwise."""
        x = embeds
        l = embeds.shape[1]
        pos = jnp.arange(l)
        bias = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)[None, None]
        for blk in self.blocks:
            x, _ = blk(x, pos, bias)
        return x

    def prefill(self, embeds, cache_len: int):
        """embeds (B,L,D) → (logits_last (B,V), caches list[(k,v)]) with
        k/v padded to (B,KVH,cache_len,hd)."""
        c = self.cfg
        b, l, _ = embeds.shape
        hd = c.dim // c.heads
        pos = jnp.arange(l)
        bias = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)[None, None]
        x = embeds
        caches = []
        for blk in self.blocks:
            x, (k, v) = blk(x, pos, bias)
            pad = cache_len - l
            k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            caches.append((k, v))
        logits = self.lm_head(self.norm_f(x[:, -1]).astype(jnp.float32))
        return logits, caches

    def prefill_padded(self, embeds, lengths, cache_len: int):
        """Batched ragged prefill: embeds (B,L,D) LEFT-padded so row b's
        real prompt occupies the last lengths[b] slots. All rows share
        positions arange(L); RoPE scores depend only on relative offsets,
        so the constant per-row shift vs an unpadded run is exact. Pad
        slots are masked out of attention here and in decode_step via
        `start = L - lengths`. Returns (logits_last (B,V), caches)."""
        c = self.cfg
        b, l, _ = embeds.shape
        pos = jnp.arange(l)
        start = (l - lengths).astype(jnp.int32)                  # (B,)
        causal = pos[None, :] <= pos[:, None]                    # (L,L)
        key_ok = pos[None, None, :] >= start[:, None, None]      # (B,1,L)
        allow = causal[None] & key_ok                            # (B,L,L)
        bias = jnp.where(allow[:, None], 0.0, -1e9).astype(jnp.float32)
        x = embeds
        caches = []
        for blk in self.blocks:
            x, (k, v) = blk(x, pos, bias)
            pad = cache_len - l
            k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            caches.append((k, v))
        logits = self.lm_head(self.norm_f(x[:, -1]).astype(jnp.float32))
        return logits, caches

    def decode_step(self, tok_emb, caches, pos, start=None):
        """tok_emb (B,1,D); pos scalar; attends all cache positions ≤ pos.
        `start` (B,) optionally masks left-pad slots < start[b] (the
        prefill_padded convention)."""
        c = self.cfg
        cache_len = caches[0][0].shape[2]
        positions = jnp.full((1,), pos)
        # mask: allow cache slots <= pos
        allow = jnp.arange(cache_len)[None, None, None, :] <= pos
        if start is not None:
            allow = allow & (jnp.arange(cache_len)[None, None, None, :]
                             >= start[:, None, None, None])
        bias = jnp.where(allow, 0.0, -1e9).astype(jnp.float32)
        x = tok_emb
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, kv = blk(x, positions, bias, kv_cache=cache)
            new_caches.append(kv)
        logits = self.lm_head(self.norm_f(x[:, 0]).astype(jnp.float32))
        return logits, new_caches


def greedy_generate(model: Llama, params, prompt_embeds: jnp.ndarray,
                    max_new: int, cache_len: int | None = None,
                    eos_id: int | None = None) -> np.ndarray:
    """Greedy ids (B, max_new) from prompt embeddings: jitted prefill +
    jitted scan over decode steps (one compile each)."""
    b, l0, _ = prompt_embeds.shape
    cache_len = cache_len or (l0 + max_new)

    # params stay TRACED jit arguments — closure capture would bake the
    # full weight set into the HLO as constants (core/jit.py rationale)
    prefill = jax.jit(lambda p, e: model.apply(p, e, cache_len,
                                               method=Llama.prefill))
    logits, caches = prefill(params, prompt_embeds)

    def step(p, carry, pos):
        logits, caches = carry
        tok = jnp.argmax(logits, axis=-1)                       # (B,)
        emb = model.apply(p, tok[:, None], method=Llama.embed)
        logits, caches = model.apply(p, emb, caches, pos,
                                     method=Llama.decode_step)
        return (logits, caches), tok

    scan = jax.jit(lambda p, carry: jax.lax.scan(
        lambda c, pos: step(p, c, pos), carry,
        jnp.arange(l0, l0 + max_new)))
    (_, _), toks = scan(params, (logits, caches))
    # np.array (copy): asarray of a jax Array is a read-only view and the
    # EOS masking below writes in place
    out = np.array(toks).T                                       # (B, max_new)
    if eos_id is not None:
        for r in range(out.shape[0]):
            hits = np.nonzero(out[r] == eos_id)[0]
            if hits.size:
                out[r, hits[0]:] = eos_id
    return out


def greedy_generate_padded(model: Llama, params, prompt_embeds: jnp.ndarray,
                           lengths: jnp.ndarray, max_new: int,
                           eos_id: int | None = None) -> np.ndarray:
    """Greedy ids (B, max_new) over a LEFT-padded ragged batch (see
    Llama.prefill_padded). One prefill + one decode-scan compile per
    (bucket_len, batch) shape; per-row outputs are bit-identical to the
    unpadded single-row path (tests/test_llama.py)."""
    b, l0, _ = prompt_embeds.shape
    cache_len = l0 + max_new
    lengths = jnp.asarray(lengths, jnp.int32)

    prefill = jax.jit(lambda p, e, ln: model.apply(
        p, e, ln, cache_len, method=Llama.prefill_padded))
    logits, caches = prefill(params, prompt_embeds, lengths)

    def step(p, start, carry, pos):
        logits, caches = carry
        tok = jnp.argmax(logits, axis=-1)                       # (B,)
        emb = model.apply(p, tok[:, None], method=Llama.embed)
        logits, caches = model.apply(p, emb, caches, pos, start,
                                     method=Llama.decode_step)
        return (logits, caches), tok

    # `start` rides as a traced argument (not a closure constant) so one
    # compile serves every batch's distinct length vector
    scan = jax.jit(lambda p, s, carry: jax.lax.scan(
        lambda c, pos: step(p, s, c, pos), carry,
        jnp.arange(l0, l0 + max_new)))
    (_, _), toks = scan(params, (l0 - lengths).astype(jnp.int32),
                        (logits, caches))
    # np.array (copy): asarray of a jax Array is a read-only view and the
    # EOS masking below writes in place
    out = np.array(toks).T                                       # (B, max_new)
    if eos_id is not None:
        for r in range(out.shape[0]):
            hits = np.nonzero(out[r] == eos_id)[0]
            if hits.size:
                out[r, hits[0]:] = eos_id
    return out
