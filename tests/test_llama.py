"""Llama decoder: causal forward ≡ prefill+decode (KV-cache correctness),
GQA shapes, greedy generation, and the HF golden parity check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyedit_tpu.models.llama import (
    Llama, LlamaConfig, TINY_LLAMA, greedy_generate,
)

F32 = LlamaConfig(vocab_size=256, dim=32, layers=2, heads=4, kv_heads=2,
                  ffn_dim=64, rope_theta=10000.0, dtype=jnp.float32)


def test_prefill_decode_matches_full_forward():
    m = Llama(F32)
    ids = jnp.asarray([[3, 9, 27, 81, 11]])
    params = m.init(jax.random.key(0), ids)
    full = m.apply(params, ids)                    # (1, 5, V)

    # prefill on the first 3 tokens, then decode tokens 3 and 4
    emb = m.apply(params, ids[:, :3], method=Llama.embed)
    logits, caches = m.apply(params, emb, 5, method=Llama.prefill)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, 2]),
                               atol=1e-4)
    for pos in (3, 4):
        e = m.apply(params, ids[:, pos:pos + 1], method=Llama.embed)
        logits, caches = m.apply(params, e, caches, pos,
                                 method=Llama.decode_step)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, pos]), atol=1e-4)


def test_greedy_generate_deterministic():
    m = Llama(F32)
    ids = jnp.asarray([[5, 6, 7]])
    params = m.init(jax.random.key(1), ids)
    emb = m.apply(params, ids, method=Llama.embed)
    out1 = greedy_generate(m, params, emb, max_new=4)
    out2 = greedy_generate(m, params, emb, max_new=4)
    assert out1.shape == (1, 4)
    np.testing.assert_array_equal(out1, out2)
    # generation continues the argmax chain of the full forward
    full = m.apply(params, ids)
    assert int(out1[0, 0]) == int(jnp.argmax(full[0, -1]))


def test_llama_matches_hf():
    """Golden parity vs HF LlamaForCausalLM (random weights): validates
    RoPE layout, GQA grouping, SwiGLU, and the converter key map."""
    import torch
    from transformers import LlamaConfig as HFCfg, LlamaForCausalLM
    from anyedit_tpu.weights.convert import convert_llama

    hf_cfg = HFCfg(vocab_size=256, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, max_position_embeddings=64,
                   rope_theta=10000.0, rms_norm_eps=1e-5,
                   attention_dropout=0.0, tie_word_embeddings=False)
    torch.manual_seed(3)
    from test_golden_hf import _decorrelate
    hf = _decorrelate(LlamaForCausalLM(hf_cfg).eval())

    m = Llama(F32)
    ids = np.array([[3, 9, 27, 81, 11]], np.int64)
    params = m.init(jax.random.key(0), jnp.asarray(ids, jnp.int32))
    st = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = {"params": convert_llama(params["params"], st)}
    ours = np.asarray(m.apply(params, jnp.asarray(ids, jnp.int32)))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(ours, want, atol=2e-4)


def test_llama_backend_plumbs_into_generator():
    from anyedit_tpu.instructions.generator import LlamaBackend

    m = Llama(F32)
    params = m.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    tok = lambda s: [(1 + ord(c)) % 256 for c in s[:8]]
    detok = lambda ids: " ".join(f"w{i}" for i in ids)
    llm = LlamaBackend(m, params, tok, detok, max_new=3)
    outs = llm(["caption: a cat", "caption: a dog"])
    assert len(outs) == 2 and all(isinstance(o, str) and o for o in outs)


def test_padded_batched_matches_per_prompt():
    """Left-padded ragged batch (prefill_padded + masked decode + shared
    RoPE positions) produces the SAME greedy tokens as the unpadded
    per-prompt path — RoPE scores depend only on relative offsets, so the
    per-row position shift is exact."""
    from anyedit_tpu.models.llama import greedy_generate_padded

    m = Llama(F32)
    prompts = [[5, 6, 7], [9, 3, 27, 81, 11, 2, 13], [1], [40, 41, 42, 43]]
    params = m.init(jax.random.key(2), jnp.asarray([prompts[0]]))

    ref = []
    for ids in prompts:
        emb = m.apply(params, jnp.asarray([ids]), method=Llama.embed)
        ref.append(greedy_generate(m, params, emb, max_new=5)[0])

    blen = 8
    mat = np.zeros((len(prompts), blen), np.int32)
    lens = np.zeros((len(prompts),), np.int32)
    for r, ids in enumerate(prompts):
        mat[r, blen - len(ids):] = ids
        lens[r] = len(ids)
    emb = m.apply(params, jnp.asarray(mat), method=Llama.embed)
    out = greedy_generate_padded(m, params, emb, jnp.asarray(lens), max_new=5)
    for r in range(len(prompts)):
        np.testing.assert_array_equal(out[r], ref[r])


def test_llama_backend_batched_matches_loop():
    """LlamaBackend(batch_size=N) returns the same strings as the
    per-prompt path, in the original order, across bucket boundaries."""
    from anyedit_tpu.instructions.generator import LlamaBackend

    m = Llama(F32)
    params = m.init(jax.random.key(3), jnp.asarray([[1, 2, 3]]))
    tokenize = lambda s: [1 + (ord(c) % 250) for c in s]
    detok = lambda ids: " ".join(str(i) for i in ids)
    prompts = ["short", "a much longer prompt " * 40, "mid size prompt here",
               "x", "another medium-length prompt for the second row"]
    seq = LlamaBackend(m, params, tokenize, detok, max_new=4)
    bat = LlamaBackend(m, params, tokenize, detok, max_new=4, batch_size=2)
    assert bat(prompts) == seq(prompts)
