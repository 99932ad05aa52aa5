import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.edits.registry import get_pipeline
from anyedit_tpu.filters.scorers import ssim, ocr_text_match
from anyedit_tpu.diffusion.regional import (
    parse_canvas_plan, build_regional_conditioning, region_bias, Region,
)
from anyedit_tpu.models.unet_sd import UNet2DCondition, TINY_UNET
from tests.test_edits import make_toolbox, scene_with_red_square


def test_ssim_bounds():
    a = jnp.asarray(np.random.default_rng(0).random((16, 16, 3)), jnp.float32)
    assert abs(float(ssim(a, a)) - 1.0) < 1e-4
    b = 1.0 - a
    assert float(ssim(a, b)) < 0.5


def test_ocr_match():
    assert ocr_text_match("OPEN!", "open")
    assert not ocr_text_match("OPEN", "CLOSED")
    assert not ocr_text_match("", "")


def test_implicit_pipeline_best_of_n():
    tb = make_toolbox()
    img = scene_with_red_square()
    tar_good = img.copy()
    tar_good[..., 2] = 200

    calls = []

    def p2p_pair(ori_cap, tar_cap, keyword, seed):
        calls.append(seed)
        # candidate quality varies with seed parity
        tar = tar_good if seed % 2 == 0 else np.zeros_like(img)
        return img, tar, None

    tb.extra["p2p_pair"] = p2p_pair
    tb.clip_image = lambda im: np.asarray([im.mean() / 255.0])
    tb.clip_text = lambda s: np.asarray([1.0])
    rec = InstructionRecord(edit="after the rain", input="a dry street",
                            output="a wet street", edit_type="implicit_change",
                            image_file="x.jpg")
    out = get_pipeline("implicit_change")(tb, rec, img,
                                          np.random.default_rng(0))
    assert out.success and len(calls) == 3
    # the bright candidate (higher CLIP+SSIM) must win over the black one
    assert out.edited.mean() > 50


def test_sdxl_inpaint_stage2_mask_semantics():
    """Implicit stage 2 (implicit_tool.py:96-127): per-step compositing must
    keep everything outside the mask at the VAE roundtrip of the input
    EXACTLY (last-step composite uses the un-noised original latents), and
    repaint inside a full mask."""
    from anyedit_tpu.cli import tiny_zoo_config
    from anyedit_tpu.runtime.zoo import ModelZoo

    zoo = ModelZoo(tiny_zoo_config())
    inpaint = zoo.toolbox(with_diffusion=False,
                          slots=("sdxl_inpaint",)).extra["sdxl_inpaint"]
    size = zoo.cfg.canvas.edit_size
    img = np.random.default_rng(3).integers(0, 255, (size, size, 3),
                                            np.uint8)

    out0 = np.asarray(inpaint(img, np.zeros((size, size), np.float32),
                              "a scene", seed=0, steps=4))
    vname = "sdxl_vae" if zoo.cfg.refine_unet.addition_embed_dim else "vae"
    vcfg = (zoo.cfg.sdxl_vae if zoo.cfg.refine_unet.addition_embed_dim
            else zoo.cfg.vae)
    enc, dec = zoo._vae_named(vname, vcfg)
    roundtrip = zoo._from_latents(
        zoo._to_latents(img, enc, vcfg.scaling_factor),
        dec, vcfg.scaling_factor, img.shape[:2])
    np.testing.assert_allclose(out0.astype(np.int32),
                               np.asarray(roundtrip).astype(np.int32),
                               atol=2)

    out1 = np.asarray(inpaint(img, np.ones((size, size), np.float32),
                              "a scene", seed=0, steps=4))
    assert out1.shape == img.shape
    assert np.abs(out1.astype(np.int32) - out0.astype(np.int32)).mean() > 1.0


def test_style_change_pipeline():
    tb = make_toolbox()
    img = scene_with_red_square()
    rec = InstructionRecord(edit="make it van gogh style", input="c",
                            output="o", edit_type="style_change",
                            image_file="x.jpg")
    out = get_pipeline("style_change")(tb, rec, img, np.random.default_rng(0))
    assert out.success and out.edited.shape == img.shape


def test_parse_canvas_plan():
    text = """global: a cozy living room
region: 0.0,0.0,0.5,1.0 | a bookshelf full of books
region: 0.5,0.2,1.0,0.9 | a sleeping golden retriever
"""
    g, regions = parse_canvas_plan(text)
    assert g == "a cozy living room"
    assert len(regions) == 2
    assert regions[0][0] == (0.0, 0.0, 0.5, 1.0)
    assert "retriever" in regions[1][1]


def test_region_bias_masks_cross_region_tokens():
    regions = [Region(box=(0.0, 0.0, 0.5, 1.0), span=(4, 8)),
               Region(box=(0.5, 0.0, 1.0, 1.0), span=(8, 12))]
    bias = region_bias(regions, hw=4, text_len=12, global_span=(0, 4))
    bias = np.asarray(bias).reshape(4, 4, 12)
    # left-column pixel: global + left-region tokens visible, right masked
    assert (bias[0, 0, :8] == 0).all() and (bias[0, 0, 8:] < -1e8).all()
    # right-column pixel: global + right-region tokens visible
    assert (bias[0, 3, :4] == 0).all() and (bias[0, 3, 8:] == 0).all()
    assert (bias[0, 3, 4:8] < -1e8).all()


def test_regional_conditioning_in_unet():
    cfg = dataclasses.replace(TINY_UNET, dtype=jnp.float32)
    model = UNet2DCondition(cfg)
    key = jax.random.key(0)

    def encode_text(prompt):
        h = abs(hash(prompt)) % 1000
        return jax.random.normal(jax.random.key(h), (1, 4, cfg.context_dim))

    ctx, proc = build_regional_conditioning(
        encode_text, "a park",
        [((0.0, 0.0, 0.5, 1.0), "a fountain"),
         ((0.5, 0.0, 1.0, 1.0), "a bench")],
        latent_hws=(8, 4))
    assert ctx.shape == (1, 12, cfg.context_dim)
    x = jax.random.normal(key, (1, 8, 8, 4))
    t = jnp.array([5])
    params = model.init(key, x, t, ctx)
    out_reg = model.apply(params, x, t, ctx, processor=proc)
    out_plain = model.apply(params, x, t, ctx)
    assert out_reg.shape == out_plain.shape
    assert float(jnp.max(jnp.abs(out_reg - out_plain))) > 1e-6
    # swapping the two region prompts changes the output (regions are live)
    ctx2, proc2 = build_regional_conditioning(
        encode_text, "a park",
        [((0.0, 0.0, 0.5, 1.0), "a bench"),
         ((0.5, 0.0, 1.0, 1.0), "a fountain")],
        latent_hws=(8, 4))
    out_swap = model.apply(params, x, t, ctx2, processor=proc2)
    assert float(jnp.max(jnp.abs(out_swap - out_reg))) > 1e-6
