"""BLIP-2 converter validation: EVA tower (fused qkv split), post-norm
Q-Former, T5 decoder — inverse-walk round-trips against HF
Blip2ForConditionalGeneration naming (reference filter_tool/utils.py:55-94
uses blip2-flan-t5-xl as the VQA gate).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.models.blip2 import Blip2VQA, QFormer, TINY_QFORMER
from anyedit_tpu.models.clip import CLIPVisionEncoder, CLIPVisionConfig
from anyedit_tpu.models.t5 import T5Decoder, TINY_T5
from anyedit_tpu.weights.convert import (
    _eva_key, _qformer_key, _t5_dec_key,
    convert_blip2, convert_eva_vit, convert_t5_decoder,
    t_conv, t_linear, t_id,
)

TINY_EVA = CLIPVisionConfig(image_size=32, patch=8, hidden=32, layers=2,
                            heads=2, proj_dim=16, activation="gelu",
                            pre_ln=False, use_proj=False, patch_bias=True)


def _src_for(tree, key_fn):
    """Synthesize a source dict; handles fused-qkv (closure transforms) and
    reshaping lambdas by key-name convention."""
    rng = np.random.default_rng(0)
    src = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        key, tf = key_fn(path)
        shp = np.shape(node)
        if key in src:
            return                      # fused qkv hits the same key 3x
        if tf is t_conv:
            shp = (shp[3], shp[2], shp[0], shp[1])
        elif tf is t_linear:
            shp = shp[::-1]
        elif tf is t_id:
            pass
        elif ".qkv." in key:            # fused: full tensor is 3x one slice
            shp = ((3 * shp[-1], shp[0]) if len(shp) == 2
                   else (3 * shp[0],))
        elif key.endswith(("class_embedding", "position_embedding",
                           "query_tokens")):
            shp = (1,) + tuple(shp)
        src[key] = rng.standard_normal(shp).astype(np.float32)

    walk(tree, ())
    return src


def test_eva_roundtrip():
    m = CLIPVisionEncoder(TINY_EVA)
    tree = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    # EVA variant: no pre_ln / no visual_proj; patch conv has bias
    assert "pre_ln" not in tree["params"]
    assert "visual_proj" not in tree["params"]
    assert "bias" in tree["params"]["patch_emb"]
    src = _src_for(tree, _eva_key)
    out = convert_eva_vit(tree, src)
    # fused qkv slices land in thirds
    w = src["vision_model.encoder.layers.0.self_attn.qkv.weight"]
    d = 32
    np.testing.assert_allclose(
        out["params"]["block_0"]["attn"]["to_q"]["kernel"], w[:d].T)
    np.testing.assert_allclose(
        out["params"]["block_0"]["attn"]["to_v"]["kernel"], w[2 * d:].T)
    o = m.apply(out, jnp.ones((1, 32, 32, 3), jnp.float32))
    assert o[0].shape == (1, 17, 32)


def test_qformer_roundtrip_and_structure():
    q = QFormer(TINY_QFORMER)
    tree = q.init(jax.random.key(0),
                  jnp.zeros((1, 5, TINY_QFORMER.image_dim), jnp.float32))
    p = tree["params"]
    # post-norm HF structure: input LN + per-block output LNs, no img_proj
    assert "ln_in" in p and "img_proj" not in p and "ln_out" not in p
    # cross K/V consume the RAW image width
    assert p["block_0"]["ck"]["kernel"].shape == (
        TINY_QFORMER.image_dim, TINY_QFORMER.dim)
    src = _src_for(tree, _qformer_key)
    from anyedit_tpu.weights.convert import _convert
    out = _convert(tree, _qformer_key, src)
    np.testing.assert_allclose(
        out["params"]["block_0"]["sq"]["kernel"],
        src["qformer.encoder.layer.0.attention.attention.query.weight"].T)
    np.testing.assert_allclose(out["params"]["queries"],
                               src["query_tokens"][0])
    o = q.apply(out, jnp.ones((1, 5, TINY_QFORMER.image_dim), jnp.float32))
    assert o.shape == (1, TINY_QFORMER.num_queries, TINY_QFORMER.lm.dim)


def test_t5_decoder_roundtrip():
    dec = T5Decoder(TINY_T5)
    ids = jnp.zeros((1, 4), jnp.int32)
    enc = jnp.zeros((1, 6, TINY_T5.dim), jnp.float32)
    mask = jnp.ones((1, 6), bool)
    tree = dec.init(jax.random.key(0), ids, enc, mask)
    src = _src_for(tree, _t5_dec_key)
    out = convert_t5_decoder(tree, src)
    np.testing.assert_allclose(
        out["params"]["cross_0"]["q"]["kernel"],
        src["decoder.block.0.layer.1.EncDecAttention.q.weight"].T)
    np.testing.assert_allclose(
        out["params"]["lm_head"]["kernel"], src["lm_head.weight"].T)


def test_blip2_full_tree():
    m = Blip2VQA(TINY_QFORMER)
    it = jnp.zeros((1, 5, TINY_QFORMER.image_dim), jnp.float32)
    qi = jnp.zeros((1, 4), jnp.int32)
    qm = jnp.ones((1, 4), bool)
    tree = m.init(jax.random.key(0), it, qi, qm)

    def key_fn(path):
        from anyedit_tpu.weights.convert import _t5_key
        p = [x for x in path if x != "params"]
        if p[0] == "qformer":
            return _qformer_key(tuple(p[1:]))
        if p[0] == "encoder":
            k, tf = _t5_key(tuple(p[1:]))
            return f"language_model.{k}", tf
        k, tf = _t5_dec_key(tuple(p[1:]))
        return f"language_model.{k}", tf

    src = _src_for(tree, key_fn)
    out = convert_blip2(tree, src)
    logits = m.apply(out, it, qi, qm)
    assert logits.shape == (1, TINY_QFORMER.lm.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_bootstrap_registry_has_blip2():
    from anyedit_tpu.weights.bootstrap import REGISTRY
    assert "eva_vit" in REGISTRY and "blip2" in REGISTRY
