"""OCR recognizer — the GOT-OCR2 slot (reference filter_tool/utils.py:43-49
loads stepfun-ai/GOT-OCR2_0 and calls `model.chat(tokenizer, path,
ocr_type='ocr')` to read scene text for the textual_change gate).

TPU-first stand-in with the same contract (image → text): a ViT encoder
(GOT's vision tower is SAM-ViT-class; we reuse the CLIP ViT skeleton) whose
patch tokens condition a T5 decoder run greedily. Real GOT weights need a
converter (round-3); the structure lets the textual gate run end-to-end and
gives the executor a jit-stable decode loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from anyedit_tpu.models.clip import CLIPVisionConfig, CLIPVisionEncoder, TINY_VISION
from anyedit_tpu.models.t5 import T5Config, T5Decoder, TINY_T5


@dataclasses.dataclass(frozen=True)
class OCRConfig:
    vision: CLIPVisionConfig = CLIPVisionConfig(image_size=1024, patch=16,
                                                hidden=768, layers=12,
                                                heads=12, proj_dim=256)
    lm: T5Config = T5Config(dim=1024, heads=16, kv_dim=64, ffn_dim=2816,
                            enc_layers=0, dec_layers=24)
    max_tokens: int = 32
    dtype: Any = jnp.bfloat16


GOT_OCR = OCRConfig()
TINY_OCR = OCRConfig(vision=TINY_VISION, lm=TINY_T5, max_tokens=8)


class OCRReader(nn.Module):
    """(image tokens (B,N,Dv), prev ids (B,L)) → next-token logits (B,L,V)."""

    cfg: OCRConfig = GOT_OCR

    def setup(self):
        self.proj = nn.Dense(self.cfg.lm.dim, dtype=jnp.float32, name="vis_proj")
        self.decoder = T5Decoder(self.cfg.lm)

    def __call__(self, image_tokens, ids):
        enc = self.proj(image_tokens.astype(jnp.float32))
        mask = jnp.ones(enc.shape[:2], bool)
        return self.decoder(ids, enc, mask)


def greedy_decode(apply_fn: Callable, image_tokens, max_tokens: int,
                  eos_id: int = 1) -> np.ndarray:
    """Greedy autoregressive ids (fixed-length loop: static shapes, one
    compile). apply_fn(image_tokens, ids) → logits (B,L,V)."""
    b = image_tokens.shape[0]
    ids = np.zeros((b, max_tokens), np.int32)      # <pad> BOS convention
    for i in range(max_tokens - 1):
        logits = apply_fn(image_tokens, jnp.asarray(ids))
        nxt = np.asarray(jnp.argmax(logits[:, i], axis=-1))
        ids[:, i + 1] = nxt
    return ids


def detokenize_ids(ids: np.ndarray, id_to_piece: Callable[[int], str],
                   eos_id: int = 1) -> str:
    out = []
    for tid in ids[1:]:
        if tid == eos_id:
            break
        out.append(id_to_piece(int(tid)))
    return "".join(out).replace("▁", " ").strip()
