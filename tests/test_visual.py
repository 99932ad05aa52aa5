import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.edits.registry import get_pipeline
from anyedit_tpu.edits.visual import build_collage, draw_bbox
from anyedit_tpu.models.dinov2 import DinoV2, TINY_DINO
from anyedit_tpu.models.depth import DepthAnythingV2, TINY_DEPTH, depth_to_u8
from anyedit_tpu.models.hed import HED
from anyedit_tpu.ops.canny import canny, rgb_to_gray
from tests.test_edits import make_toolbox, scene_with_red_square, RED, GRASS


def rec(t, **kw):
    return InstructionRecord(edit="edit it", input="a red square on grass",
                             output="out", edit_type=t, image_file="x.jpg", **kw)


def test_canny_finds_square_edges():
    img = np.zeros((64, 64, 3), np.uint8)
    img[20:36, 20:36] = 255  # white square on black: gradient 255·4 ≫ high
    edges = np.asarray(canny(rgb_to_gray(jnp.asarray(img))))
    assert edges.shape == img.shape[:2]
    # edges concentrated near the square boundary, none in flat regions
    band = edges[18:23, 20:36]
    assert band.max() == 255
    assert edges[50:60, 50:60].max() == 0
    # low-contrast image below thresholds → no edges (cv2 parity)
    soft = scene_with_red_square()
    e2 = np.asarray(canny(rgb_to_gray(jnp.asarray(soft))))
    assert e2.max() == 0


def test_dinov2_shapes():
    cfg = dataclasses.replace(TINY_DINO, dtype=jnp.float32)
    m = DinoV2(cfg, return_layers=(0,))
    key = jax.random.key(0)
    px = jax.random.normal(key, (2, cfg.img_size, cfg.img_size, 3))
    p = m.init(key, px)
    out = m.apply(p, px)
    n = (cfg.img_size // cfg.patch) ** 2
    assert out["cls"].shape == (2, cfg.dim)
    assert out["patch"].shape == (2, n, cfg.dim)
    assert out["layers"][0].shape == (2, n, cfg.dim)


def test_depth_anything_shapes():
    cfg = dataclasses.replace(
        TINY_DEPTH, backbone=dataclasses.replace(TINY_DINO, dtype=jnp.float32),
        dtype=jnp.float32)
    m = DepthAnythingV2(cfg)
    key = jax.random.key(1)
    px = jax.random.normal(key, (1, cfg.backbone.img_size,
                                 cfg.backbone.img_size, 3))
    p = m.init(key, px)
    d = m.apply(p, px)
    assert d.shape == px.shape[:3]
    assert float(jnp.min(d)) >= 0.0
    u8 = depth_to_u8(d)
    assert u8.dtype == jnp.uint8 and int(jnp.max(u8)) <= 255


def test_hed_shapes():
    m = HED()
    key = jax.random.key(2)
    px = jnp.asarray(np.random.default_rng(0).integers(0, 255, (1, 32, 32, 3),
                                                       np.uint8))
    p = m.init(key, px)
    e = m.apply(p, px)
    assert e.shape == (1, 32, 32)
    assert 0.0 <= float(jnp.min(e)) and float(jnp.max(e)) <= 1.0


def test_visual_sketch_pipeline():
    tb = make_toolbox()
    img = scene_with_red_square()
    r = rec("visual_sketch", edited_object="red square")
    out = get_pipeline("visual_sketch")(tb, r, img, np.random.default_rng(0))
    assert out.success
    assert out.visual_input.shape == img.shape
    assert "[sketch]" in r.edit


def test_visual_bbox_pipeline():
    tb = make_toolbox()
    img = scene_with_red_square()
    r = rec("visual_bbox", edited_object="red square")
    out = get_pipeline("visual_bbox")(tb, r, img, np.random.default_rng(0))
    assert out.success
    # red rectangle outline drawn at the box border
    assert (out.visual_input[20, 20:36] == [255, 0, 0]).all(axis=-1).any()
    assert "[bbox]" in r.edit


def test_visual_depth_requires_model():
    tb = make_toolbox()
    img = scene_with_red_square()
    out = get_pipeline("visual_depth")(tb, rec("visual_depth"), img,
                                       np.random.default_rng(0))
    assert not out.success  # no depth model in the stub toolbox
    tb.depth = lambda im: np.full(im.shape[:2], 128, np.uint8)
    out2 = get_pipeline("visual_depth")(tb, rec("visual_depth"), img,
                                        np.random.default_rng(0))
    assert out2.success and out2.visual_input.shape == img.shape


def test_build_collage_pastes_reference():
    target = scene_with_red_square()           # red square = landing zone
    tmask = (target[..., 0] > 180) & (target[..., 2] < 100)
    ref = np.tile(GRASS, (32, 32, 1))
    ref[8:24, 8:24] = [200, 200, 30]           # yellow reference object
    rmask = np.zeros((32, 32), bool)
    rmask[8:24, 8:24] = True
    collage, hf = build_collage(target, tmask, ref, rmask)
    assert collage.shape == target.shape and hf.shape == target.shape[:2]
    # the landing zone now holds the yellow object
    assert (collage[26, 26] == [200, 200, 30]).all()
    # HF map non-zero only inside the landing zone
    assert hf[:18, :18].max() == 0.0


def test_visual_reference_pipeline_with_stub_anydoor():
    tb = make_toolbox()
    ref_img = np.tile(GRASS, (32, 32, 1))
    ref_img[8:24, 8:24] = RED                  # reference object is red too
    tb.extra["load_visual"] = lambda r: ref_img
    tb.extra["anydoor"] = lambda img, m, collage, hf, ref: collage
    img = scene_with_red_square()
    r = rec("visual_reference", edited_object="red square", ref_object="red thing")
    out = get_pipeline("visual_reference")(tb, r, img, np.random.default_rng(0))
    assert out.success
    # edge-touching target → completeness gate fires
    img_edge = scene_with_red_square(0, 0, 16, 16)
    out2 = get_pipeline("visual_reference")(tb, r, img_edge,
                                            np.random.default_rng(0))
    assert not out2.success and "edge" in out2.reason


def test_material_transfer_with_stub():
    tb = make_toolbox()
    tb.depth = lambda im: np.full(im.shape[:2], 100, np.uint8)
    tb.extra["load_visual"] = lambda r: np.tile(GRASS, (16, 16, 1))
    captured = {}

    def runner(init, mask, depth_map, exemplar):
        captured["init"] = init
        return init

    tb.extra["sdxl_material"] = runner
    img = scene_with_red_square()
    r = rec("material_transfer", edited_object="red square")
    out = get_pipeline("material_transfer")(tb, r, img, np.random.default_rng(0))
    assert out.success
    # init image grayscaled inside the object mask
    init = captured["init"]
    assert init[28, 28, 0] == init[28, 28, 1] == init[28, 28, 2]
    assert not (init[60, 60, 0] == init[60, 60, 1] == init[60, 60, 2])
