import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.models.sam import (
    SAM, TINY_SAM, SAM_VIT_H, SAMImageEncoder, preprocess_sam,
    _window_partition, _window_unpartition,
)


CFG = dataclasses.replace(TINY_SAM, dtype=jnp.float32)


def test_window_roundtrip():
    x = jax.random.normal(jax.random.key(0), (2, 10, 14, 8))
    win, padded = _window_partition(x, 4)
    assert win.shape[1:] == (4, 4, 8)
    back = _window_unpartition(win, 4, padded, (10, 14))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_sam_end_to_end_shapes():
    model = SAM(CFG)
    key = jax.random.key(1)
    px = jax.random.normal(key, (1, CFG.img_size, CFG.img_size, 3))
    boxes = jnp.array([[[8., 8., 40., 40.], [16., 16., 56., 48.]]])  # (1,2,4)
    params = model.init(key, px, boxes)
    masks, iou = model.apply(params, px, boxes)
    s4 = CFG.img_size // CFG.patch * 4
    assert masks.shape == (2, CFG.num_mask_tokens, s4, s4)
    assert iou.shape == (2, CFG.num_mask_tokens)
    assert bool(jnp.all(jnp.isfinite(masks)))


def test_sam_encoder_once_decoder_many():
    model = SAM(CFG)
    key = jax.random.key(2)
    px = jax.random.normal(key, (1, CFG.img_size, CFG.img_size, 3))
    boxes = jnp.array([[[8., 8., 40., 40.]]])
    params = model.init(key, px, boxes)
    emb = model.apply(params, px, method=SAM.encode)
    assert emb.shape == (1, CFG.img_size // CFG.patch, CFG.img_size // CFG.patch,
                         CFG.out_dim)
    m1, _ = model.apply(params, emb, boxes, method=SAM.decode_boxes)
    m2, _ = model.apply(params, px, boxes)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)


def test_sam_box_sensitivity():
    """Different boxes must give different masks (prompt path is live)."""
    model = SAM(CFG)
    key = jax.random.key(3)
    px = jax.random.normal(key, (1, CFG.img_size, CFG.img_size, 3))
    b1 = jnp.array([[[0., 0., 16., 16.]]])
    b2 = jnp.array([[[32., 32., 60., 60.]]])
    params = model.init(key, px, b1)
    m1, _ = model.apply(params, px, b1)
    m2, _ = model.apply(params, px, b2)
    assert float(jnp.max(jnp.abs(m1 - m2))) > 1e-4


def test_preprocess_bucket():
    img = jnp.zeros((37, 53, 3), jnp.uint8)
    out = preprocess_sam(img, CFG)
    assert out.shape == (1, CFG.img_size, CFG.img_size, 3)


def test_vit_h_param_count():
    model = SAMImageEncoder(SAM_VIT_H)
    px = jax.ShapeDtypeStruct((1, 1024, 1024, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.key(0), px)
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 0.55e9 < n < 0.75e9, n  # ViT-H encoder ≈ 0.63B


def test_encode_stepwise_matches_monolithic():
    """Per-block compile units (make_encode_stepwise) == SAM.encode —
    the production ViT-H@1024 path the tunneled compile service needs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from anyedit_tpu.models.sam import SAM, TINY_SAM, make_encode_stepwise

    m = SAM(TINY_SAM)
    px = jax.random.normal(jax.random.key(0),
                           (1, TINY_SAM.img_size, TINY_SAM.img_size, 3),
                           jnp.float32)
    boxes = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = m.init(jax.random.key(1), px, boxes)
    ref = m.apply(params, px, method=SAM.encode)
    got = make_encode_stepwise(TINY_SAM)(params, px)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)
