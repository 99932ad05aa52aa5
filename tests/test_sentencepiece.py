"""Pure-Python SentencePiece unigram tokenizer tests.

Builds a synthetic ModelProto via `serialize_model`, parses it back, and
checks Viterbi segmentation against hand-computable optima — including
byte-fallback for out-of-vocab characters and the T5 eos/pad conventions
(reference use: T5 tokenization for Flux/SD3, attribute_tool.py:159).
"""

import numpy as np

from anyedit_tpu.models.sentencepiece import (
    SentencePieceModel, serialize_model)


def _toy_model(tmp_path, pieces_scores, types=None):
    data = serialize_model([p for p, _ in pieces_scores],
                           [s for _, s in pieces_scores], types)
    f = tmp_path / "spiece.model"
    f.write_bytes(data)
    return SentencePieceModel.from_file(f)


BASE = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0)]
BASE_T = [3, 3, 2]   # control, control, unknown


def test_viterbi_prefers_long_pieces(tmp_path):
    sp = _toy_model(tmp_path, BASE + [
        ("▁hello", -1.0), ("▁hel", -2.0), ("lo", -2.0),
        ("▁world", -1.5), ("▁", -3.0)], BASE_T + [1] * 5)
    ids = sp.encode("hello world")
    # "▁hello"(-1) beats "▁hel"+"lo"(-4); eos appended
    assert ids == [sp.piece_to_id("▁hello"),
                   sp.piece_to_id("▁world"), 1]


def test_viterbi_picks_best_split(tmp_path):
    sp = _toy_model(tmp_path, BASE + [
        ("▁ab", -5.0), ("c", -1.0), ("▁a", -1.0), ("bc", -1.0)],
        BASE_T + [1] * 4)
    ids = sp.encode("abc", add_eos=False)
    # ▁a+bc = -2 beats ▁ab+c = -6
    assert ids == [sp.piece_to_id("▁a"), sp.piece_to_id("bc")]


def test_unknown_char_fallback(tmp_path):
    sp = _toy_model(tmp_path, BASE + [("▁x", -1.0)], BASE_T + [1])
    ids = sp.encode("xq", add_eos=False)
    assert ids == [sp.piece_to_id("▁x"), sp.unk_id]


def test_byte_fallback(tmp_path):
    byte_pieces = [(f"<0x{b:02X}>", -10.0) for b in range(256)]
    sp = _toy_model(tmp_path, BASE + byte_pieces + [("▁a", -1.0)],
                    BASE_T + [6] * 256 + [1])
    ids = sp.encode("aé", add_eos=False)     # é → 2 UTF-8 bytes
    assert ids[0] == sp.piece_to_id("▁a")
    assert ids[1:] == [sp.piece_to_id("<0xC3>"), sp.piece_to_id("<0xA9>")]


def test_unk_id_detected_from_type(tmp_path):
    sp = _toy_model(tmp_path, BASE + [("▁a", -1.0)], BASE_T + [1])
    assert sp.unk_id == 2


def test_encode_padded(tmp_path):
    sp = _toy_model(tmp_path, BASE + [("▁hi", -1.0)], BASE_T + [1])
    out = sp.encode_padded("hi", 6)
    assert out == [sp.piece_to_id("▁hi"), 1, 0, 0, 0, 0]
    assert len(sp.encode_padded("hi", 1)) == 1


def test_zoo_t5_ids_fallback_without_model():
    """No spiece.model → hash fallback path still yields valid ids."""
    from anyedit_tpu.runtime.zoo import ModelZoo
    zoo = ModelZoo(weights_dir=None)
    ids = zoo._t5_ids("a cat", 8)
    assert ids.shape == (1, 8)
    assert ids.dtype == np.int32


def test_nfkc_and_whitespace_normalization(tmp_path):
    """T5's nmt_nfkc + remove_extra_whitespaces: newlines/tabs/double
    spaces collapse to one space, unicode compat chars fold (ﬁ → fi) —
    ids must match the plain-space encoding (round-2 advisory)."""
    sp = _toy_model(tmp_path, BASE + [
        ("▁a", -1.0), ("▁cat", -1.0), ("▁fi", -1.0), ("n", -1.5)],
        BASE_T + [1] * 4)
    want = sp.encode("a cat")
    assert sp.encode("a\ncat") == want
    assert sp.encode("a\t cat") == want
    assert sp.encode("a  cat") == want
    assert sp.encode("ﬁn") == sp.encode("fin")
