"""GOT-OCR2 scene-text recognizer — the textual_change gate's reader
(reference filter_tool/utils.py:43-49 loads stepfun-ai/GOT-OCR2_0 and calls
`model.chat(tokenizer, path, ocr_type='ocr')`).

Real GOT architecture, TPU-first: SAM-ViT-B vision tower (windowed
attention + decomposed rel-pos, 256-channel neck — reusing our SAM encoder
module) → two stride-2 conv upsamplers → linear projector → Qwen2-class
decoder (Llama blocks with q/k/v biases, tied lm_head). Numerics match HF
`GotOcr2ForConditionalGeneration` (tests/test_golden_hf.py), so the public
GOT checkpoint converts directly (`weights/convert.py::convert_got_ocr`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from anyedit_tpu.models.llama import Llama, LlamaConfig
from anyedit_tpu.models.sam import SAMConfig, SAMImageEncoder, SAM_VIT_B, TINY_SAM

# Qwen2-0.5B-class LM as shipped inside GOT-OCR2 (HF text_config):
# hidden 1024, 24 layers, 16 heads (no GQA), ffn 2816, rope 1e6, qkv bias,
# tied word embeddings (converter copies embed into lm_head).
QWEN2_GOT = LlamaConfig(vocab_size=151860, dim=1024, layers=24, heads=16,
                        kv_heads=16, ffn_dim=2816, rope_theta=1e6,
                        norm_eps=1e-6, qkv_bias=True)

TINY_QWEN = LlamaConfig(vocab_size=256, dim=32, layers=2, heads=4,
                        kv_heads=2, ffn_dim=64, rope_theta=10000.0,
                        norm_eps=1e-6, qkv_bias=True)


@dataclasses.dataclass(frozen=True)
class OCRConfig:
    vision: SAMConfig = SAM_VIT_B          # 1024px, 64×64×256 neck output
    lm: LlamaConfig = QWEN2_GOT
    max_tokens: int = 32
    dtype: Any = jnp.bfloat16


GOT_OCR = OCRConfig()
TINY_OCR = OCRConfig(vision=TINY_SAM, lm=TINY_QWEN, max_tokens=8)


class GotOCR(nn.Module):
    """pixels → image tokens → causal LM over [image ⊕ text] (GOT layout:
    image tokens first, prompt/answer after)."""

    cfg: OCRConfig = GOT_OCR

    def setup(self):
        c = self.cfg
        out = c.vision.out_dim
        self.vision = SAMImageEncoder(c.vision)
        # GotOcr2MultiModalProjector: two stride-2 convs (bias-free, no
        # activation — torch pad=1 ≡ explicit ((1,1),(1,1))) + linear
        self.up1 = nn.Conv(2 * out, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), use_bias=False,
                           dtype=c.dtype, name="up1")
        self.up2 = nn.Conv(c.lm.dim, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), use_bias=False,
                           dtype=c.dtype, name="up2")
        self.mm_proj = nn.Dense(c.lm.dim, dtype=jnp.float32, name="mm_proj")
        self.lm = Llama(c.lm)

    def encode_image(self, pixels):
        """(B,S,S,3) normalized → (B, (S/64)², lm.dim) image tokens."""
        f = self.vision(pixels)
        h = self.up2(self.up1(f))
        b, hh, ww, d = h.shape
        return self.mm_proj(h.reshape(b, hh * ww, d).astype(jnp.float32))

    def lm_logits(self, image_tokens, ids):
        """ids-aligned next-token logits (B, L, V): slot i predicts
        ids[i+1] (the greedy_decode contract)."""
        emb = jnp.concatenate(
            [image_tokens.astype(self.cfg.lm.dtype), self.lm.embed(ids)], 1)
        n_img = image_tokens.shape[1]
        return self.lm.forward_embeds(emb)[:, n_img:]

    def lm_logits_chat(self, image_tokens, prefix_ids, ids):
        """GOT chat layout: [prefix ⊕ image tokens ⊕ ids] — image features
        sit where HF places the <imgpad> run, between <img>…</img> inside
        the user turn (GotOcr2Processor prompt). Returns logits aligned to
        `ids` (slot i predicts ids[i+1]); `ids` = suffix prompt + answer."""
        emb = jnp.concatenate(
            [self.lm.embed(prefix_ids),
             image_tokens.astype(self.cfg.lm.dtype),
             self.lm.embed(ids)], 1)
        n_skip = prefix_ids.shape[1] + image_tokens.shape[1]
        return self.lm.forward_embeds(emb)[:, n_skip:]

    def __call__(self, pixels, ids):
        """Full forward (golden-parity entry): logits over the combined
        [image ⊕ ids] sequence, (B, N_img+L, V)."""
        img = self.encode_image(pixels)
        emb = jnp.concatenate(
            [img.astype(self.cfg.lm.dtype), self.lm.embed(ids)], 1)
        return self.lm.forward_embeds(emb)


def greedy_decode(apply_fn: Callable, image_tokens, max_tokens: int,
                  eos_id: int = 1,
                  prompt_ids: "list[int] | None" = None,
                  stop_ids: "frozenset[int] | None" = None) -> np.ndarray:
    """Greedy autoregressive ids (fixed-length loop: static shapes, one
    compile). apply_fn(image_tokens, ids) → logits (B,L,V), slot i
    predicting ids[i+1].

    `prompt_ids` seeds the id buffer (generation starts after it);
    `stop_ids` short-circuits the host loop once every row has stopped
    (output past a stop id is garbage — detokenizers cut at eos)."""
    b = image_tokens.shape[0]
    p = list(prompt_ids) if prompt_ids else [0]    # <pad>-BOS convention
    total = len(p) + max_tokens
    ids = np.zeros((b, total), np.int32)
    ids[:, :len(p)] = np.asarray(p, np.int32)
    stops = stop_ids or frozenset({eos_id})
    done = np.zeros((b,), bool)
    for i in range(len(p) - 1, total - 1):
        logits = apply_fn(image_tokens, jnp.asarray(ids))
        nxt = np.asarray(jnp.argmax(logits[:, i], axis=-1))
        ids[:, i + 1] = nxt
        done |= np.isin(nxt, list(stops))
        if done.all():
            break
    return ids


def detokenize_ids(ids: np.ndarray, id_to_piece: Callable[[int], str],
                   eos_id: int = 1) -> str:
    out = []
    for tid in ids[1:]:
        if tid == eos_id:
            break
        out.append(id_to_piece(int(tid)))
    return "".join(out).replace("▁", " ").strip()
