import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.filters.scorers import (
    clip_score, directional_clip_score, l1_distance, AestheticMLP,
)
from anyedit_tpu.filters.post_filter import Scores, post_filter_decision
from anyedit_tpu.filters.pre_filter import (
    PreScores, pre_filter_decision, main_gate, color_prefilter,
    replace_prefilter,
)


def test_clip_and_directional_scores():
    a = jnp.array([[1.0, 0.0]])
    b = jnp.array([[0.0, 1.0]])
    assert float(clip_score(a, a)[0]) == 1.0
    assert float(clip_score(a, b)[0]) == 0.0
    # image moves exactly as text says → dirCLIP = 1
    d = directional_clip_score(a, b, a, b)
    assert abs(float(d[0]) - 1.0) < 1e-6
    # image moves opposite → -1
    d2 = directional_clip_score(b, a, a, b)
    assert abs(float(d2[0]) + 1.0) < 1e-6


def test_l1():
    x = jnp.zeros((1, 4, 4, 3))
    y = jnp.ones((1, 4, 4, 3)) * 0.5
    assert abs(float(l1_distance(x, y)[0]) - 0.5) < 1e-6


def test_aesthetic_mlp_shape():
    m = AestheticMLP()
    emb = jax.random.normal(jax.random.key(0), (3, 768))
    params = m.init(jax.random.key(1), emb)
    out = m.apply(params, emb)
    assert out.shape == (3,)


def test_post_filter_remove_semantics():
    # remove accepted only if CLIP>0.15 AND object is GONE
    ok = Scores(clip=0.2, object_present=False)
    bad1 = Scores(clip=0.1, object_present=False)
    bad2 = Scores(clip=0.2, object_present=True)
    assert post_filter_decision("remove", ok)
    assert not post_filter_decision("remove", bad1)
    assert not post_filter_decision("remove", bad2)


def test_post_filter_replace_and_tone():
    assert post_filter_decision("replace", Scores(clip=0.25, dir_clip=0.1,
                                                  object_present=True))
    assert not post_filter_decision("replace", Scores(clip=0.25, dir_clip=0.05,
                                                      object_present=True))
    assert post_filter_decision("tone_transfer", Scores(clip=0.3, l1=0.5))
    assert not post_filter_decision("tone_transfer", Scores(clip=0.3, l1=0.95))
    assert not post_filter_decision("tone_transfer", Scores(clip=0.3, l1=0.1))


def test_post_filter_textual_and_default():
    assert post_filter_decision("textual_change", Scores(ocr_match=True))
    assert not post_filter_decision("textual_change", Scores(ocr_match=False))
    assert post_filter_decision("visual_depth", Scores())  # pass-through


def test_pre_filter_gates():
    assert main_gate(PreScores(512, 512, clip=0.3, aesthetic=5.0,
                               object_ratio=0.5))
    assert not main_gate(PreScores(1200, 400, clip=0.3))      # aspect > 2
    assert not main_gate(PreScores(512, 512, clip=0.05))      # low clip
    assert not main_gate(PreScores(512, 512, clip=0.3, aesthetic=1.0))
    assert not main_gate(PreScores(512, 512, clip=0.3, object_ratio=0.99))


def test_pre_filter_type_rules():
    s = PreScores(512, 512, clip=0.3, aesthetic=5.0)
    # basic color kept at u=0.5 (<0.8); rare color dropped at u=0.5 (>0.2)
    assert pre_filter_decision("color_alter", s, new_attr="red", rng_uniform=0.5)
    assert not pre_filter_decision("color_alter", s, new_attr="chartreuse",
                                   rng_uniform=0.5)
    assert color_prefilter("blue", 0.79) and not color_prefilter("blue", 0.81)
    # humans excluded from replace
    assert not pre_filter_decision("replace", s, edited_object="a young man")
    assert pre_filter_decision("replace", s, edited_object="a red car")
    assert replace_prefilter("car") and not replace_prefilter("woman")
    # action needs verbs
    assert not pre_filter_decision("action_change", s, verbs=[])
    assert pre_filter_decision("action_change", s, verbs=["running"])
