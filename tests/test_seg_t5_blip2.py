import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.models.segmentation import (
    UperNetSegmenter, TINY_SEG, render_segmentation, ade_palette,
)
from anyedit_tpu.models.t5 import (
    T5Encoder, T5Decoder, TINY_T5, rel_pos_bucket, T5_XXL,
)
from anyedit_tpu.models.blip2 import Blip2VQA, TINY_QFORMER, QFormer, yes_no


F32 = lambda c: dataclasses.replace(c, dtype=jnp.float32)


def test_upernet_shapes_and_render():
    cfg = dataclasses.replace(
        TINY_SEG, backbone=F32(TINY_SEG.backbone), dtype=jnp.float32)
    m = UperNetSegmenter(cfg)
    key = jax.random.key(0)
    px = jax.random.normal(key, (1, 32, 32, 3))
    p = m.init(key, px)
    logits = m.apply(p, px)
    assert logits.shape == (1, 32, 32, cfg.num_classes)
    img = render_segmentation(logits, ade_palette(cfg.num_classes))
    assert img.shape == (1, 32, 32, 3) and img.dtype == np.uint8


def test_rel_pos_buckets():
    rel = jnp.arange(-10, 11)[None, :]
    b_bi = rel_pos_bucket(rel, True, 32, 128)
    b_causal = rel_pos_bucket(rel, False, 32, 128)
    assert int(b_bi.min()) >= 0 and int(b_bi.max()) < 32
    # causal: future positions (rel>0 → n<0) clamp to bucket 0
    assert int(b_causal[0, -1]) == 0
    # symmetric distances map to distinct sides bidirectionally
    assert int(b_bi[0, 0]) != int(b_bi[0, -1])


def test_t5_encoder_decoder():
    cfg = F32(TINY_T5)
    enc = T5Encoder(cfg)
    key = jax.random.key(1)
    ids = jnp.array([[3, 5, 7, 9, 0, 0]])
    mask = jnp.arange(6)[None] < 4
    ep = enc.init(key, ids, mask)
    h = enc.apply(ep, ids, mask)
    assert h.shape == (1, 6, cfg.dim)
    # padded keys masked: changing a padded token doesn't change real outputs
    h2 = enc.apply(ep, ids.at[0, 5].set(60), mask)
    np.testing.assert_allclose(np.asarray(h[:, :4]), np.asarray(h2[:, :4]),
                               atol=1e-5)

    dec = T5Decoder(cfg)
    dids = jnp.array([[0, 4, 8]])
    dp = dec.init(key, dids, h, mask)
    logits = dec.apply(dp, dids, h, mask)
    assert logits.shape == (1, 3, cfg.vocab_size)
    # causality: changing a later decoder token can't affect earlier logits
    logits2 = dec.apply(dp, dids.at[0, 2].set(30), h, mask)
    np.testing.assert_allclose(np.asarray(logits[:, :2]),
                               np.asarray(logits2[:, :2]), atol=1e-5)


def test_t5_xxl_param_count():
    m = T5Encoder(T5_XXL)
    ids = jax.ShapeDtypeStruct((1, 77), jnp.int32)
    shapes = jax.eval_shape(m.init, jax.random.key(0), ids)
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 4.2e9 < n < 5.2e9, n  # T5-XXL encoder ≈ 4.76B


def test_blip2_vqa_pipeline():
    cfg = dataclasses.replace(TINY_QFORMER, lm=F32(TINY_T5), dtype=jnp.float32)
    m = Blip2VQA(cfg)
    key = jax.random.key(2)
    img_tokens = jax.random.normal(key, (2, 9, cfg.image_dim))
    qids = jnp.tile(jnp.array([[5, 9, 11, 2]]), (2, 1))
    qmask = jnp.ones((2, 4), bool)
    p = m.init(key, img_tokens, qids, qmask)
    logits = m.apply(p, img_tokens, qids, qmask)
    assert logits.shape == (2, cfg.lm.vocab_size)
    # image sensitivity: a different image changes the answer distribution
    logits2 = m.apply(p, img_tokens * 3.0, qids, qmask)
    assert float(jnp.max(jnp.abs(logits - logits2))) > 1e-6
    ans = yes_no(logits, yes_id=10, no_id=20)
    assert ans.shape == (2,) and ans.dtype == bool


def test_qformer_query_count():
    cfg = dataclasses.replace(TINY_QFORMER, lm=F32(TINY_T5), dtype=jnp.float32)
    q = QFormer(cfg)
    key = jax.random.key(3)
    img = jax.random.normal(key, (1, 9, cfg.image_dim))
    p = q.init(key, img)
    out = q.apply(p, img)
    assert out.shape == (1, cfg.num_queries, cfg.lm.dim)
