"""Qwen2 byte-level BPE (GOT-OCR2 text side) — parity vs HF Qwen2Tokenizer.

Builds a small but real vocab.json/merges.txt pair, then checks our
implementation (anyedit_tpu/models/bpe.py) produces identical ids to the
transformers slow tokenizer over texts exercising the pretokenizer regex
(contractions, digits, punctuation runs, newlines, unicode).
"""

import json

import pytest

from anyedit_tpu.models.bpe import (
    ENDOFTEXT, IM_END, IM_START, IMG_END, IMG_PAD, IMG_START,
    Qwen2Tokenizer, got_prompt_ids)
from anyedit_tpu.models.clip_tokenizer import _bytes_to_unicode


def _mini_assets(tmp_path):
    """Byte-alphabet base vocab + a few merges (valid BPE: every merge's
    parts exist as earlier vocab entries)."""
    base = list(_bytes_to_unicode().values())
    merges = [("t", "h"), ("th", "e"), ("Ġ", "the"), ("e", "s"),
              ("1", "2"), ("Ġ", "a"), ("c", "a"), ("ca", "t"),
              ("Ġ", "cat")]
    vocab = {t: i for i, t in enumerate(base)}
    for a, b in merges:
        vocab[a + b] = len(vocab)
    (tmp_path / "qwen_vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "qwen_merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
    return vocab, merges


TEXTS = [
    "the cat sat",
    "The cat's 12 hats!!",
    "a\nb\tc  d",
    "naïve — café 12x",
    "don't stop",
    "  leading spaces",
]


def test_matches_hf_qwen2_tokenizer(tmp_path):
    _mini_assets(tmp_path)
    tok = Qwen2Tokenizer.from_dir(tmp_path)
    from transformers.models.qwen2.tokenization_qwen2 import Qwen2Tokenizer as HFTok
    hf = HFTok(vocab_file=str(tmp_path / "qwen_vocab.json"),
               merges_file=str(tmp_path / "qwen_merges.txt"),
               unk_token=None, bos_token=None, eos_token=None,
               pad_token=None)
    for text in TEXTS:
        ours = tok.encode(text)
        theirs = hf(text, add_special_tokens=False)["input_ids"]
        assert ours == theirs, (text, ours, theirs)
        assert tok.decode(ours) == hf.decode(theirs)


def test_got_prompt_layout(tmp_path):
    _mini_assets(tmp_path)
    tok = Qwen2Tokenizer.from_dir(tmp_path)
    prefix, suffix = got_prompt_ids(tok)
    # specials appear as single ids, in the HF GotOcr2Processor order
    assert prefix[0] == IM_START
    assert prefix.count(IM_END) == 1 and prefix.count(IM_START) == 2
    assert prefix[-1] == IMG_START
    assert suffix[0] == IMG_END
    assert suffix[-1] != IM_END          # ends with "assistant\n" text ids
    assert IM_START in suffix and IM_END in suffix
    # text between specials round-trips through the byte-level BPE
    assert tok.decode(prefix).startswith("system\n")


def test_from_dir_absent_returns_none(tmp_path):
    assert Qwen2Tokenizer.from_dir(tmp_path) is None


def test_tokenizer_json_bundle(tmp_path):
    vocab, merges = _mini_assets(tmp_path)
    bundle = {
        "model": {"vocab": vocab, "merges": [f"{a} {b}" for a, b in merges]},
        "added_tokens": [
            {"content": "<|endoftext|>", "id": ENDOFTEXT},
            {"content": "<imgpad>", "id": IMG_PAD},
        ],
    }
    (tmp_path / "got_tokenizer.json").write_text(json.dumps(bundle))
    tok = Qwen2Tokenizer.from_dir(tmp_path)
    assert tok.added["<imgpad>"] == IMG_PAD
    assert tok.encode("the cat") == Qwen2Tokenizer(
        vocab, merges).encode("the cat")


def test_ocr_fn_chat_path_with_assets(tmp_path):
    """With Qwen2 tokenizer assets in weights_dir, ocr_fn builds the GOT
    chat prompt (prefix ⊕ image tokens ⊕ suffix) and decodes with the real
    vocabulary — exercising lm_logits_chat + prompt-seeded greedy decode
    end-to-end on a tiny random model."""
    import dataclasses
    import jax.numpy as jnp
    from anyedit_tpu.models.llama import LlamaConfig
    from anyedit_tpu.models.ocr import OCRConfig
    from anyedit_tpu.models.sam import TINY_SAM
    from anyedit_tpu.runtime.zoo import ModelZoo, ZooConfig

    _mini_assets(tmp_path)
    # vocab must cover the GOT special ids (<imgpad> 151859)
    lm = LlamaConfig(vocab_size=151860, dim=16, layers=1, heads=2,
                     kv_heads=1, ffn_dim=32, rope_theta=1e4,
                     norm_eps=1e-6, qkv_bias=True)
    cfg = ZooConfig(ocr=OCRConfig(vision=TINY_SAM, lm=lm, max_tokens=4,
                                  dtype=jnp.float32))
    zoo = ModelZoo(cfg, weights_dir=tmp_path, allow_fallback_tokenizers=True)
    read = zoo.ocr_fn()
    img = (abs(__import__("numpy").random.default_rng(0)
               .normal(size=(24, 24, 3))) * 80).astype("uint8")
    out = read(img)
    assert isinstance(out, str)
