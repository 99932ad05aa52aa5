"""CLIP BPE tokenizer: merge application, SOT/EOT layout, fallback ids."""

from anyedit_tpu.models.clip_tokenizer import (
    ClipBPETokenizer, SimpleClipTokenizer, CLIP_VOCAB, SOT, EOT,
)


def _merges_file(tmp_path, merges):
    p = tmp_path / "clip_merges.txt"
    p.write_text("#version: 0.2\n" + "\n".join(" ".join(m) for m in merges))
    return p


def test_bpe_applies_merges_in_rank_order(tmp_path):
    tok = ClipBPETokenizer(_merges_file(tmp_path, [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
    ]))  # merges operate on byte symbols; '</w>' marks word-final pieces
    ids = tok.encode("hello")
    sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
    assert ids[0] == sot and ids[-1] == eot
    assert ids[1:-1] == [tok.encoder["hello</w>"]]   # fully merged
    # unmergeable word falls back to char pieces
    ids2 = tok.encode("hi")
    assert ids2[1:-1] == [tok.encoder["h"], tok.encoder["i</w>"]]


def test_bpe_word_boundary_and_punct(tmp_path):
    tok = ClipBPETokenizer(_merges_file(tmp_path, [("h", "e</w>")]))
    a = tok.encode("he he")
    assert a[1:-1] == [tok.encoder["he</w>"]] * 2
    b = tok.encode("a.b")
    assert tok.encoder["a</w>"] in b and tok.encoder["b</w>"] in b


def test_simple_clip_fallback_layout():
    tok = SimpleClipTokenizer()
    ids = tok.encode("a photo of a cat")
    assert ids[0] == SOT and ids[-1] == EOT
    # EOT stays the max id → CLIP argmax pooling finds it
    assert max(ids) == EOT and all(0 < i < SOT for i in ids[1:-1])
    assert tok.encode("cat")[1] == tok.encode("the cat")[2]  # stable word ids
    assert CLIP_VOCAB == 49408
