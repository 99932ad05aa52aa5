"""Edit-pipeline semantics with a synthetic toolbox.

The stub toolbox "grounds" by color blob: the test image contains a red
square (the object) on green grass; ground() returns its mask, inpaint()
fills with grass, sd_inpaint paints a blue square. This exercises every
branch of the pipelines (incl. self-verification) hermetically.
"""

import dataclasses

import numpy as np
import pytest

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.edits.registry import get_pipeline, EDIT_PIPELINES
from anyedit_tpu.edits.types import Toolbox
from anyedit_tpu.edits.geometry import paste_object, check_occlusion
from anyedit_tpu.edits.outpainting import select_crop
from anyedit_tpu.edits.rotation import (
    determine_rotation, relative_rotation, read_images_binary,
    write_images_binary, ColmapImage,
)

H = W = 64
GRASS = np.array([40, 160, 40], np.uint8)
RED = np.array([220, 30, 30], np.uint8)
BLUE = np.array([30, 30, 220], np.uint8)


def scene_with_red_square(x1=20, y1=20, x2=36, y2=36):
    img = np.tile(GRASS, (H, W, 1))
    img[y1:y2, x1:x2] = RED
    return img


@dataclasses.dataclass
class FakeGround:
    mask: np.ndarray
    boxes: np.ndarray
    valid: np.ndarray
    masks: np.ndarray
    bbox_mask: np.ndarray
    union_ratio: float


def make_toolbox():
    def ground(image, phrase, mode="merge", count_k=None):
        if "red" in phrase or "square" in phrase:
            mask = (image[..., 0] > 180) & (image[..., 2] < 100)
        elif "blue" in phrase:
            mask = image[..., 2] > 180
        else:
            mask = np.zeros(image.shape[:2], bool)
        if not mask.any():
            return None
        ys, xs = np.nonzero(mask)
        box = np.array([[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]],
                       np.float32)
        bbox_mask = np.zeros_like(mask)
        bbox_mask[ys.min():ys.max() + 1, xs.min():xs.max() + 1] = True
        area = (box[0, 2] - box[0, 0]) * (box[0, 3] - box[0, 1])
        return FakeGround(mask=mask, boxes=box, valid=np.array([True]),
                          masks=mask[None], bbox_mask=bbox_mask,
                          union_ratio=float(area / mask.size))

    def inpaint(img01, mask01):
        out = img01.copy()
        out[mask01 > 0.5] = GRASS / 255.0
        return out

    def sd_inpaint(image, mask01, prompt, negative):
        out = image.copy()
        if "blue" in prompt:
            out[mask01 > 0.5] = BLUE
        else:
            out[mask01 > 0.5] = (GRASS * 0.7).astype(np.uint8)
        return out

    def ip2p(image, instruction, mask01, steps, s_txt, s_img):
        out = image.astype(np.float32)
        shift = np.array([0, 0, 60.0])  # "make it bluer"
        if mask01 is None:
            out = out + shift
        else:
            out = out + shift * mask01[..., None]
        return np.clip(out, 0, 255).astype(np.uint8)

    return Toolbox(ground=ground, inpaint=inpaint, sd_inpaint=sd_inpaint,
                   ip2p=ip2p)


def rec(edit_type, **kw):
    return InstructionRecord(edit=f"{edit_type} it", input="a red square on grass",
                             output="grass", edit_type=edit_type,
                             image_file="x.jpg", **kw)


RNG = np.random.default_rng(0)


def test_remove_succeeds_and_erases():
    tb = make_toolbox()
    img = scene_with_red_square()
    out = get_pipeline("remove")(tb, rec("remove", edited_object="red square"),
                                 img, RNG)
    assert out.success
    # the red square is gone (filled with grass)
    assert not ((out.edited[..., 0] > 180) & (out.edited[..., 2] < 100)).any()


def test_remove_fails_when_absent():
    tb = make_toolbox()
    img = np.tile(GRASS, (H, W, 1))
    out = get_pipeline("remove")(tb, rec("remove", edited_object="red square"),
                                 img, RNG)
    assert not out.success and "not found" in out.reason


def test_remove_verification_catches_bad_inpaint():
    tb = make_toolbox()
    tb.inpaint = lambda img01, m: img01  # broken eraser: object stays
    img = scene_with_red_square()
    out = get_pipeline("remove")(tb, rec("remove", edited_object="red square"),
                                 img, RNG)
    assert not out.success and "still detected" in out.reason


def test_add_synthesizes_input():
    tb = make_toolbox()
    img = scene_with_red_square()
    out = get_pipeline("add")(tb, rec("add", edited_object="red square"), img, RNG)
    assert out.success
    assert (out.edited == img).all()            # edited side = given target
    assert not ((out.input_image[..., 0] > 180)
                & (out.input_image[..., 2] < 100)).any()  # input lacks object


def test_replace_paints_new_object():
    tb = make_toolbox()
    img = scene_with_red_square()
    out = get_pipeline("replace")(tb, rec("replace", edited_object="red square",
                                          new_object="blue box"), img, RNG)
    assert out.success
    assert (out.edited[..., 2] > 180).any()     # blue object present


def test_color_alter_composites_only_masked_region():
    tb = make_toolbox()
    img = scene_with_red_square()
    out = get_pipeline("color_alter")(tb, rec("color_alter",
                                              edited_object="red square"),
                                      img, RNG)
    assert out.success
    # far corner untouched (outside mask+feather)
    np.testing.assert_array_equal(out.edited[60, 60], img[60, 60])
    # object region got the blue shift
    assert int(out.edited[28, 28, 2]) > int(img[28, 28, 2])


def test_tone_transfer_is_global():
    tb = make_toolbox()
    img = scene_with_red_square()
    out = get_pipeline("tone_transfer")(tb, rec("tone_transfer"), img, RNG)
    assert out.success
    assert int(out.edited[60, 60, 2]) > int(img[60, 60, 2])


def test_movement_moves_object():
    tb = make_toolbox()
    img = scene_with_red_square()
    r = rec("movement", edited_object="red square")
    out = get_pipeline("movement")(tb, r, img, np.random.default_rng(3))
    assert out.success
    red = (out.edited[..., 0] > 180) & (out.edited[..., 2] < 100)
    assert red.any()
    ys, xs = np.nonzero(red)
    # min delta is 50 px but clipped to keep the object on a 64-px canvas
    assert abs(int(xs.mean()) - 28) >= 15
    assert any(w in r.edit for w in ("left", "right"))


def test_resize_scales_object():
    tb = make_toolbox()
    img = scene_with_red_square()
    r = rec("resize", edited_object="red square")
    out = get_pipeline("resize")(tb, r, img, np.random.default_rng(1))
    assert out.success
    red = (out.edited[..., 0] > 180) & (out.edited[..., 2] < 100)
    orig_area = 16 * 16
    ratio = red.sum() / orig_area
    assert ratio < 0.7 or ratio > 1.2


def test_relation_swaps():
    tb = make_toolbox()
    img = scene_with_red_square(8, 8, 20, 20)
    img[40:56, 40:56] = BLUE
    r = rec("relation", edited_object="red square", new_object="blue box")
    out = get_pipeline("relation")(tb, r, img, np.random.default_rng(2))
    assert out.success
    red = (out.edited[..., 0] > 180) & (out.edited[..., 2] < 100)
    ys, xs = np.nonzero(red)
    # red square now near (48, 48)
    assert abs(xs.mean() - 48) < 6 and abs(ys.mean() - 48) < 6
    assert "swap" in r.edit


def test_outpainting_crop():
    tb = make_toolbox()
    img = scene_with_red_square(20, 20, 44, 44)  # 24x24 = 14% area, not on edge
    r = rec("outpainting", edited_object="red square")
    out = get_pipeline("outpainting")(tb, r, img, np.random.default_rng(4))
    assert out.success
    assert out.input_image.shape[0] < H and out.input_image.shape[1] < W
    assert (out.edited == img).all()
    assert r.edit  # template instruction synthesized


def test_paste_and_occlusion_helpers():
    bg = np.zeros((32, 32, 3), np.uint8)
    obj = np.zeros((32, 32, 3), np.uint8)
    obj[4:8, 4:8] = 255
    m = np.zeros((32, 32), bool)
    m[4:8, 4:8] = True
    out, nm = paste_object(bg, obj, m, (20, 20))
    assert nm[20, 20] and out[20, 20, 0] == 255
    other = np.zeros((1, 32, 32), bool)
    other[0, 5:7, 5:7] = True
    assert check_occlusion(m, other)
    assert not check_occlusion(m, None)


def test_select_crop_rules():
    boxes = np.array([[1, 1, 20, 20],     # touches border
                      [10, 10, 54, 54],   # 47% area ok
                      [30, 30, 34, 34]])  # too small
    valid = np.array([True, True, True])
    assert select_crop(boxes, valid, (64, 64)) == (10, 10, 54, 54)
    assert select_crop(boxes[:1], valid[:1], (64, 64)) is None


def test_rotation_math_and_colmap_io(tmp_path):
    # 30° yaw about +y
    ang = np.radians(30) / 2
    q1 = np.array([1.0, 0, 0, 0])
    q2 = np.array([np.cos(ang), 0, np.sin(ang), 0])
    axis, deg = relative_rotation(q1, q2)
    assert abs(deg - 30) < 1e-6 and axis[1] > 0.99
    assert determine_rotation(q1, q2) == "left"
    assert determine_rotation(q1, q1) is None  # 0° below min
    # roll (about z) is rejected
    qz = np.array([np.cos(ang), 0, 0, np.sin(ang)])
    assert determine_rotation(q1, qz) is None

    imgs = {1: ColmapImage(1, q1, np.zeros(3), 1, "a.jpg"),
            2: ColmapImage(2, q2, np.ones(3), 1, "b.jpg")}
    write_images_binary(tmp_path / "images.bin", imgs)
    back = read_images_binary(tmp_path / "images.bin")
    assert back[2].name == "b.jpg"
    np.testing.assert_allclose(back[2].qvec, q2)


def test_registry_coverage():
    for t in ("add", "remove", "replace", "color_alter", "tone_transfer",
              "movement", "resize", "relation", "outpainting", "counting",
              "background_change", "appearance_alter"):
        assert t in EDIT_PIPELINES
    with pytest.raises(KeyError):
        get_pipeline("nonexistent")


def test_textual_change_pipeline():
    tb = make_toolbox()
    a = np.full((32, 32, 3), 10, np.uint8)
    b = np.full((32, 32, 3), 200, np.uint8)
    tb.extra["flux_pair"] = lambda ca, cb, seed: (a, b)
    r = rec("textual_change")
    r.input = 'a sign that reads "OPEN"'
    r.output = 'a sign that reads "CLOSED"'
    out = get_pipeline("textual_change")(tb, r, a, np.random.default_rng(0))
    assert out.success
    assert (out.input_image == a).all() and (out.edited == b).all()
    # OCR gate: mismatching recognized text → rejected
    tb.ocr = lambda im: "WRONG"
    out2 = get_pipeline("textual_change")(tb, r, a, np.random.default_rng(0))
    assert not out2.success and "OCR" in out2.reason
    # OCR matching → accepted
    tb.ocr = lambda im: "open" if im[0, 0, 0] == 10 else "closed"
    out3 = get_pipeline("textual_change")(tb, r, a, np.random.default_rng(0))
    assert out3.success
