import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.grounding.maskgen import (
    select_boxes, combine_masks, boxes_to_mask, union_area_ratio,
    grounding_result, MAX_BOXES,
)
from anyedit_tpu.grounding.text import SimpleVocabTokenizer, phrase_token_spans
from anyedit_tpu.grounding.tags import generate_tags, noun_phrases


def test_tokenizer_deterministic_and_spans():
    tok = SimpleVocabTokenizer()
    cap = "a small airplane sits on the concrete"
    e1 = tok.encode(cap)
    e2 = tok.encode(cap)
    assert e1.ids == e2.ids
    assert e1.tokens[0] == "[CLS]" and e1.tokens[-1] == "[SEP]"
    spans = phrase_token_spans(e1, cap, ["airplane", "small airplane", "dog"])
    s_air, s_small_air, s_dog = spans
    assert e1.tokens[s_air[0]] == "airplane"
    assert s_small_air[1] - s_small_air[0] == 2
    assert s_dog == (0, 0)


def test_select_boxes_threshold_and_nms():
    q, t = 10, 8
    logits = jnp.full((q, t), -10.0)
    boxes = jnp.tile(jnp.array([0.5, 0.5, 0.2, 0.2]), (q, 1))
    # two strong detections: one at span tokens, one duplicate (suppressed)
    logits = logits.at[0, 2].set(3.0)
    logits = logits.at[1, 2].set(2.0)  # same box → NMS kills it
    logits = logits.at[2, 2].set(2.5)
    boxes = boxes.at[2].set(jnp.array([0.1, 0.1, 0.1, 0.1]))  # distinct box
    bx, sc, keep = select_boxes(logits, boxes, (2, 3), (100, 100),
                                box_threshold=0.5)
    assert bx.shape == (MAX_BOXES, 4)
    kept = np.flatnonzero(np.asarray(keep))
    assert len(kept) == 2
    # strongest kept box is centered at (50, 50) with w=h=20
    np.testing.assert_allclose(np.asarray(bx[kept[0]]), [40, 40, 60, 60],
                               atol=1e-4)


def test_combine_modes():
    masks = jnp.stack([
        jnp.zeros((8, 8)).at[:4].set(1.0),
        jnp.zeros((8, 8)).at[4:].set(1.0),
        jnp.zeros((8, 8)),
    ]) * 2 - 1  # logits: >0 inside
    scores = jnp.array([0.9, 0.5, 0.0])
    valid = jnp.array([True, True, False])
    mx = combine_masks(masks, scores, valid, "max")
    assert bool(mx[0, 0]) and not bool(mx[7, 7])
    mg = combine_masks(masks, scores, valid, "merge")
    assert bool(mg[0, 0]) and bool(mg[7, 7])
    c1 = combine_masks(masks, scores, valid, "count", count_k=1)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(mx))


def test_bbox_mask_and_union_ratio():
    boxes = jnp.array([[0., 0., 50., 50.], [50., 50., 100., 100.],
                       [0., 0., 0., 0.]])
    valid = jnp.array([True, True, False])
    m = boxes_to_mask(boxes, valid, (100, 100))
    assert bool(m[10, 10]) and bool(m[80, 80]) and not bool(m[10, 80])
    r = union_area_ratio(boxes, valid, (100, 100))
    assert abs(float(r) - 1.0) < 1e-5
    r2 = union_area_ratio(boxes[:1], valid[:1], (100, 100))
    assert abs(float(r2) - 0.25) < 1e-5


def test_grounding_result_assembly():
    h = w = 16
    masks = jnp.full((MAX_BOXES, h, w), -1.0).at[0].set(1.0)
    boxes = jnp.zeros((MAX_BOXES, 4)).at[0].set(jnp.array([2., 2., 10., 10.]))
    scores = jnp.zeros((MAX_BOXES,)).at[0].set(0.9)
    valid = jnp.zeros((MAX_BOXES,), bool).at[0].set(True)
    res = grounding_result(masks, boxes, scores, valid, (h, w), "merge")
    assert int(res.count) == 1
    assert bool(res.mask[5, 5])
    assert bool(res.bbox_mask[5, 5]) and not bool(res.bbox_mask[15, 15])


def test_tags_fallback():
    tags = generate_tags("a small red airplane sits on the wet concrete")
    assert "airplane" in tags["nouns"] and "concrete" in tags["nouns"]
    assert "small" in tags["adj"] and "red" in tags["adj"]
    assert "sits" in tags["verb"]
    assert "the" not in sum(tags.values(), [])
    ph = noun_phrases("a small red airplane sits")
    assert "airplane" in ph and "red airplane" in ph
