import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.models.swin import SwinTransformer, TINY_SWIN, SWIN_B
from anyedit_tpu.models.bert import BertEncoder, TINY_BERT
from anyedit_tpu.models.gdino import GroundingDINO, TINY_GDINO


def _f32(cfg):
    return dataclasses.replace(cfg, dtype=jnp.float32)


def test_swin_multiscale_shapes():
    cfg = _f32(TINY_SWIN)
    model = SwinTransformer(cfg)
    key = jax.random.key(0)
    x = jax.random.normal(key, (1, 32, 32, 3))
    params = model.init(key, x)
    outs = model.apply(params, x)
    assert set(outs) == {4, 8}
    assert outs[4].shape == (1, 8, 8, 16)
    assert outs[8].shape == (1, 4, 4, 32)
    for v in outs.values():
        assert bool(jnp.all(jnp.isfinite(v)))


def test_swin_b_param_count():
    model = SwinTransformer(SWIN_B)
    x = jax.ShapeDtypeStruct((1, 384, 384, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x)
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 0.8e8 < n < 1.0e8, n  # Swin-B ≈ 88M


def test_bert_mask_blocks_attention():
    cfg = dataclasses.replace(TINY_BERT, dtype=jnp.float32)
    model = BertEncoder(cfg)
    key = jax.random.key(1)
    ids = jnp.array([[1, 5, 9, 2, 0, 0, 0, 0]])
    params = model.init(key, ids)
    # mask padding keys: changing a masked token must not change real tokens
    bias = jnp.where(jnp.arange(8) < 4, 0.0, -1e9)[None, None, None, :]
    h1 = model.apply(params, ids, bias)
    h2 = model.apply(params, ids.at[0, 6].set(99), bias)
    np.testing.assert_allclose(np.asarray(h1[0, :4]), np.asarray(h2[0, :4]),
                               atol=1e-5)


def test_gdino_end_to_end():
    cfg = dataclasses.replace(
        TINY_GDINO,
        swin=_f32(TINY_SWIN),
        bert=dataclasses.replace(TINY_BERT, dtype=jnp.float32),
        dtype=jnp.float32)
    model = GroundingDINO(cfg)
    key = jax.random.key(2)
    px = jax.random.normal(key, (1, 32, 32, 3))
    ids = jnp.array([[1, 5, 9, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    mask = jnp.arange(16)[None] < 4
    params = model.init(key, px, ids, mask)
    logits, boxes = model.apply(params, px, ids, mask)
    assert logits.shape == (1, cfg.num_queries, 16)
    assert boxes.shape == (1, cfg.num_queries, 4)
    assert bool(jnp.all((boxes >= 0) & (boxes <= 1)))
    # masked text positions get -inf-ish logits
    assert float(jnp.max(logits[:, :, 4:])) < -1e8
    assert float(jnp.max(logits[:, :, :4])) > -1e8
    assert bool(jnp.all(jnp.isfinite(boxes)))


def test_gdino_text_sensitivity():
    cfg = dataclasses.replace(
        TINY_GDINO,
        swin=_f32(TINY_SWIN),
        bert=dataclasses.replace(TINY_BERT, dtype=jnp.float32),
        dtype=jnp.float32)
    model = GroundingDINO(cfg)
    key = jax.random.key(3)
    px = jax.random.normal(key, (1, 32, 32, 3))
    ids1 = jnp.array([[1, 5, 9, 2] + [0] * 12])
    ids2 = jnp.array([[1, 77, 42, 2] + [0] * 12])
    mask = jnp.arange(16)[None] < 4
    params = model.init(key, px, ids1, mask)
    l1, b1 = model.apply(params, px, ids1, mask)
    l2, b2 = model.apply(params, px, ids2, mask)
    assert float(jnp.max(jnp.abs(l1[:, :, :4] - l2[:, :, :4]))) > 1e-5


def test_segment_text_masks():
    """bertwarper semantics: '[CLS] a cat . a dog . [SEP]' → two phrase
    blocks inclusive of their closing '.', CLS/SEP isolated, positions
    restarting per segment."""
    import jax.numpy as jnp
    import numpy as np
    from anyedit_tpu.models.gdino import segment_text_masks

    CLS, SEP, DOT = 101, 102, 1012
    ids = jnp.asarray([[CLS, 5, 6, DOT, 7, 8, DOT, SEP, 0, 0]])
    mask = ids != 0
    bias, pos = segment_text_masks(ids, mask, (CLS, SEP, DOT))
    allowed = np.asarray(bias[0, 0] == 0.0)
    # block 1: tokens 1..3 fully connected
    assert allowed[1:4, 1:4].all()
    # block 2: tokens 4..6 fully connected
    assert allowed[4:7, 4:7].all()
    # no cross-block attention
    assert not allowed[1:4, 4:7].any() and not allowed[4:7, 1:4].any()
    # CLS and SEP isolated (self only)
    assert allowed[0, 0] and allowed[0, 1:].sum() == 0
    assert allowed[7, 7] and allowed[7, :7].sum() == 0
    # padded tokens isolated
    assert allowed[8, 8] and allowed[8, :8].sum() == 0
    # per-segment positions: word,word,dot → 0,1,2; restart after dot
    np.testing.assert_array_equal(np.asarray(pos[0, :8]),
                                  [0, 0, 1, 2, 0, 1, 2, 0])


def test_gdino_stepwise_matches_monolithic():
    """Per-stage compile units (make_gdino_stepwise) == the monolithic
    apply — the production 900q/800px path for the tunneled compiler."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from anyedit_tpu.models.gdino import (
        GroundingDINO, TINY_GDINO, make_gdino_stepwise)

    m = GroundingDINO(TINY_GDINO)
    px = jax.random.normal(jax.random.key(0), (1, 64, 64, 3), jnp.float32)
    ids = jnp.asarray([[101, 7592, 1012, 2088, 1012, 102] + [0] * 10])
    mask = jnp.asarray([[True] * 6 + [False] * 10])
    params = m.init(jax.random.key(1), px, ids, mask)
    ref_l, ref_b = m.apply(params, px, ids, mask)
    got_l, got_b = make_gdino_stepwise(TINY_GDINO)(params, px, ids, mask)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_l, np.float32),
                               np.asarray(ref_l, np.float32),
                               atol=2e-1, rtol=2e-2)
