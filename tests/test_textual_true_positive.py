"""textual_change acceptance — a TRUE POSITIVE through the real stack.

VERDICT r3 weak item: "the textual_change acceptance path has never
produced a true positive end-to-end" (it fails closed at random weights).
Real GOT checkpoints don't ship in this offline image, so this test makes
its own: it trains the real tiny GotOCR (SAM-ViT tower → conv projector →
Qwen2-class LM, models/ocr.py) to READ two images with words rendered into
their pixels, saves the trained params as a real `ocr.msgpack` plus Qwen2
BPE tokenizer assets in a weights dir, rebuilds the reader through the
PUBLIC zoo slot (`ModelZoo.ocr_fn`: asset discovery → byte-exact GOT chat
prompt → greedy decode stopping on the real <|im_end|> id → BPE
detokenize), and drives the executor's post-scorer on a textual_change
record (reference semantics: filter_tool/utils.py:43-49 GOT both-sides
check, post_filter.py:70-79 gate):

  * matching quoted captions  → ocr_match=True  → record ACCEPTED
  * swapped captions          → ocr_match=False → record rejected

i.e. the gate is shown to open on genuinely-read text, not only to fail
closed.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from anyedit_tpu.models.bpe import (
    ENDOFTEXT, IM_END, IM_START, IMG_END, IMG_PAD, IMG_START,
    Qwen2Tokenizer, got_prompt_ids)
from anyedit_tpu.models.clip_tokenizer import _bytes_to_unicode
from anyedit_tpu.models.llama import LlamaConfig
from anyedit_tpu.models.ocr import GotOCR, OCRConfig
from anyedit_tpu.models.sam import TINY_SAM
from anyedit_tpu.ops.resize import imagenet_normalize, resize_image

# Qwen2-shaped tiny LM whose id space covers the REAL GOT special tokens
# (<|im_end|> 151645 etc. — the zoo's stop ids are the production ids, so
# the vocab must reach them; dim stays tiny).
TINY_QWEN_FULLVOCAB = LlamaConfig(
    vocab_size=151860, dim=32, layers=2, heads=4, kv_heads=2, ffn_dim=64,
    rope_theta=1e6, norm_eps=1e-6, qkv_bias=True)
OCR_CFG = OCRConfig(vision=TINY_SAM, lm=TINY_QWEN_FULLVOCAB, max_tokens=8)

# 3x5 bitmap glyphs — the words really are in the pixels
_GLYPHS = {
    "h": ["#..", "#..", "###", "#.#", "#.#"],
    "e": ["###", "#..", "##.", "#..", "###"],
    "l": ["#..", "#..", "#..", "#..", "###"],
    "o": ["###", "#.#", "#.#", "#.#", "###"],
    "w": ["#.#", "#.#", "#.#", "###", "#.#"],
    "r": ["##.", "#.#", "##.", "#.#", "#.#"],
    "d": ["##.", "#.#", "#.#", "#.#", "##."],
}


def render_word(word: str, size: int = 64) -> np.ndarray:
    """White canvas, word drawn as black 3x5 blocks, scaled 3x (HWC u8)."""
    img = np.full((size, size, 3), 255, np.uint8)
    x0, y0, sc = 2, 24, 3
    for ci, ch in enumerate(word):
        g = _GLYPHS[ch]
        for r, row in enumerate(g):
            for c, bit in enumerate(row):
                if bit == "#":
                    y, x = y0 + r * sc, x0 + ci * 4 * sc + c * sc
                    img[y:y + sc, x:x + sc] = 0
    return img


def _write_tokenizer_assets(d):
    """Minimal but VALID Qwen2 byte-level BPE pair (same scheme as the HF
    assets: byte-alphabet base vocab + merges whose parts pre-exist)."""
    base = list(_bytes_to_unicode().values())
    merges = [("O", "C"), ("OC", "R"), ("a", "s"), ("as", "s"),
              ("i", "s"), ("t", "a"), ("n", "t")]
    vocab = {t: i for i, t in enumerate(base)}
    for a, b in merges:
        vocab[a + b] = len(vocab)
    (d / "qwen_vocab.json").write_text(json.dumps(vocab))
    (d / "qwen_merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))


def _preprocess(img_u8):
    """Exactly the zoo reader's preprocessing (runtime/zoo.py ocr_fn)."""
    s = OCR_CFG.vision.img_size
    px = resize_image(jnp.asarray(img_u8, jnp.float32) / 255.0, s, s,
                      "bilinear")
    return imagenet_normalize(px)[None]


def test_textual_gate_true_positive(tmp_path):
    _write_tokenizer_assets(tmp_path)
    tok = Qwen2Tokenizer.from_dir(tmp_path)
    prefix, suffix = got_prompt_ids(tok)

    words = ["hello", "world"]
    images = [render_word(w) for w in words]
    pixels = jnp.concatenate([_preprocess(im) for im in images], axis=0)

    # teacher-forced buffers at the decode-time shapes: suffix + answer +
    # <|im_end|> + zero pad to len(suffix) + max_tokens
    total = len(suffix) + OCR_CFG.max_tokens
    ids = np.zeros((2, total), np.int32)
    mask = np.zeros((2, total), np.float32)
    for b, w in enumerate(words):
        ans = tok.encode(w) + [IM_END]
        assert len(ans) <= OCR_CFG.max_tokens
        ids[b, :len(suffix)] = suffix
        ids[b, len(suffix):len(suffix) + len(ans)] = ans
        # slot i predicts ids[i+1]: answer tokens live at predictions
        # len(suffix)-1 … len(suffix)+len(ans)-2
        mask[b, len(suffix) - 1:len(suffix) + len(ans) - 1] = 1.0
    labels = np.zeros_like(ids)
    labels[:, :-1] = ids[:, 1:]
    ids_j, labels_j, mask_j = map(jnp.asarray, (ids, labels, mask))
    pre = jnp.asarray([prefix], jnp.int32)
    pre2 = jnp.concatenate([pre, pre], axis=0)

    model = GotOCR(OCR_CFG)
    params = jax.jit(model.init)(jax.random.key(0), pixels[:1],
                                 ids_j[:1])

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    # both answers are 5 BPE pieces + <|im_end|>, so the scored prediction
    # slots are the same static slice for every row: len(suffix)-1 …
    # len(suffix)+4 (slot i predicts ids[i+1]). Scoring ONLY those slots
    # through the head keeps the 151,860-way softmax off the other ~130
    # positions (forward_hidden + sliced norm_f/lm_head).
    lo, hi = len(suffix) - 1, len(suffix) - 1 + 6
    assert float(mask_j[:, lo:hi].min()) == 1.0
    assert float(mask_j.sum()) == 2 * (hi - lo)
    ans_labels = labels_j[:, lo:hi]

    def answer_logits(m, pixels, pre, ids):
        it = m.encode_image(pixels)
        emb = jnp.concatenate(
            [m.lm.embed(pre), it.astype(m.cfg.lm.dtype), m.lm.embed(ids)], 1)
        h = m.lm.forward_hidden(emb)
        n_skip = pre.shape[1] + it.shape[1]
        sl = h[:, n_skip + lo:n_skip + hi]
        return m.lm.lm_head(m.lm.norm_f(sl).astype(jnp.float32))

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, pixels, pre2, ids_j,
                                 method=answer_logits)
            lp = jax.nn.log_softmax(logits, axis=-1)
            ll = jnp.take_along_axis(lp, ans_labels[..., None], -1)[..., 0]
            return -ll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    loss = None
    for step in range(800):
        params, opt_state, loss = train_step(params, opt_state)
        if step % 25 == 24 and float(loss) < 1e-3:
            break
    assert float(loss) < 0.05, f"tiny GOT failed to overfit: loss={loss}"

    # ship it exactly like a converted checkpoint
    from flax.serialization import msgpack_serialize
    (tmp_path / "ocr.msgpack").write_bytes(
        msgpack_serialize(jax.device_get(params)))

    # rebuild the reader through the PUBLIC zoo slot
    from anyedit_tpu.runtime.zoo import ModelZoo, ZooConfig
    zoo = ModelZoo(cfg=dataclasses.replace(ZooConfig(), ocr=OCR_CFG),
                   weights_dir=tmp_path, allow_fallback_tokenizers=True)
    read = zoo.ocr_fn()
    got = [read(im) for im in images]
    assert got[0].strip().lower() == "hello", got
    assert got[1].strip().lower() == "world", got

    # executor post-scorer + gate (the acceptance path)
    from anyedit_tpu.core.schema import InstructionRecord
    from anyedit_tpu.edits.types import EditOutcome, Toolbox
    from anyedit_tpu.filters.post_filter import post_filter_decision
    from anyedit_tpu.runtime.executor import FactoryExecutor

    ex = FactoryExecutor(Toolbox(ocr=read))
    rec = InstructionRecord(
        edit="replace the text \"hello\" with \"world\"",
        input="a sign that says \"hello\"",
        output="a sign that says \"world\"",
        edit_type="textual_change")
    outcome = EditOutcome(success=True, edited=images[1],
                          input_image=images[0])
    s = ex._default_post_scorer(rec, images[0], outcome)
    assert s.ocr_match is True
    assert post_filter_decision("textual_change", s)   # TRUE POSITIVE

    # and the gate still rejects a mismatched claim (captions swapped)
    rec_bad = dataclasses.replace(
        rec, input="a sign that says \"world\"",
        output="a sign that says \"hello\"")
    s_bad = ex._default_post_scorer(rec_bad, images[0], outcome)
    assert s_bad.ocr_match is False
    assert not post_filter_decision("textual_change", s_bad)
