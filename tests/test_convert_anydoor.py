"""AnyDoor ControlLDM converter validation (no real checkpoint offline).

Inverse-walk our tiny trees to synthesize an ldm-named state dict with the
exact source shapes, convert, and assert every leaf lands with the right
transform — plus key-uniqueness (each our-leaf consumes a distinct source
tensor), which catches up/down or index misrouting.

Reference naming: cldm/cldm.py:307 (ControlLDM state dict prefixes
model.diffusion_model / control_model / first_stage_model /
cond_stage_model.projector), ldm openaimodel + autoencoder layouts.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyedit_tpu.models.controlnet import ControlNet
from anyedit_tpu.models.unet_sd import TINY_UNET, UNet2DCondition
from anyedit_tpu.models.vae import TINY_VAE, AutoencoderKL
from anyedit_tpu.weights.convert import (
    _controlnet_key, _ldm_unet_key, _ldm_vae_key,
    convert_controlnet_anydoor, convert_ldm_unet, convert_vae_ldm,
    convert_anydoor_projector,
    t_conv, t_linear, t_id, t_lin_as_conv11, t_conv11_as_lin,
)

TINY = dataclasses.replace(TINY_UNET, context_dim=16)
N_LEVELS = len(TINY.block_channels)
LPB = TINY.layers_per_block
ATTN = TINY.attn_levels


def _src_shape(tf, leaf_shape):
    """Source-tensor shape whose transform produces `leaf_shape`."""
    if tf is t_conv:
        kh, kw, i, o = leaf_shape
        return (o, i, kh, kw)
    if tf is t_linear:
        i, o = leaf_shape
        return (o, i)
    if tf is t_lin_as_conv11:
        _, _, i, o = leaf_shape
        return (o, i)
    if tf is t_conv11_as_lin:
        i, o = leaf_shape
        return (o, i, 1, 1)
    assert tf is t_id
    return tuple(leaf_shape)


def _inverse_src(tree, key_fn):
    rng = np.random.default_rng(0)
    src, n_leaves = {}, 0

    def walk(node, path):
        nonlocal n_leaves
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        n_leaves += 1
        key, tf = key_fn(path)
        assert key not in src, f"source key collision: {key}"
        src[key] = rng.standard_normal(
            _src_shape(tf, np.shape(node))).astype(np.float32)

    walk(tree, ())
    return src, n_leaves


def _check(tree, converted, key_fn, src):
    def walk(node, conv, path):
        if isinstance(node, dict):
            for k in node:
                walk(node[k], conv[k], path + (k,))
            return
        key, tf = key_fn(path)
        np.testing.assert_allclose(np.asarray(conv), tf(src[key]), rtol=1e-6)

    walk(tree, converted, ())


@pytest.fixture(scope="module")
def unet_tree():
    unet = UNet2DCondition(TINY)
    x = jnp.zeros((1, 8, 8, TINY.in_channels), jnp.float32)
    return unet.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32),
                     jnp.zeros((1, 4, TINY.context_dim), jnp.float32))


def test_ldm_unet_roundtrip(unet_tree):
    key_fn = lambda p: _ldm_unet_key(p, N_LEVELS, LPB, ATTN,
                                     "model.diffusion_model.")
    src, n = _inverse_src(unet_tree, key_fn)
    assert len(src) == n           # bijective mapping
    out = convert_ldm_unet(unet_tree, src, n_levels=N_LEVELS, lpb=LPB,
                           attn_levels=ATTN)
    _check(unet_tree, out, key_fn, src)


def test_ldm_unet_key_spots(unet_tree):
    # conv_in / out / time embed / ds / upsample slot math
    k, _ = _ldm_unet_key(("params", "conv_in", "kernel"), 4, 2,
                         (True, True, True, False), "model.diffusion_model.")
    assert k == "model.diffusion_model.input_blocks.0.0.weight"
    k, _ = _ldm_unet_key(("params", "down_1_ds", "kernel"), 4, 2,
                         (True, True, True, False), "")
    assert k == "input_blocks.6.0.op.weight"
    k, _ = _ldm_unet_key(("params", "down_2_res_1", "conv1", "kernel"), 4, 2,
                         (True, True, True, False), "")
    assert k == "input_blocks.8.0.in_layers.2.weight"
    # upsample: level 3 (no attn) → slot 1 of output block 2; level 2 → slot 2
    k, _ = _ldm_unet_key(("params", "up_3_us", "kernel"), 4, 2,
                         (True, True, True, False), "")
    assert k == "output_blocks.2.1.conv.weight"
    k, _ = _ldm_unet_key(("params", "up_2_us", "kernel"), 4, 2,
                         (True, True, True, False), "")
    assert k == "output_blocks.5.2.conv.weight"
    # first processed up block is the innermost level
    k, _ = _ldm_unet_key(("params", "up_3_res_0", "conv2", "kernel"), 4, 2,
                         (True, True, True, False), "")
    assert k == "output_blocks.0.0.out_layers.3.weight"
    k, _ = _ldm_unet_key(("params", "up_0_res_2", "norm1", "scale"), 4, 2,
                         (True, True, True, False), "")
    assert k == "output_blocks.11.0.in_layers.0.weight"


def test_controlnet_roundtrip():
    cn = ControlNet(TINY)
    x = jnp.zeros((1, 8, 8, TINY.in_channels), jnp.float32)
    hint = jnp.zeros((1, 64, 64, 4), jnp.float32)
    tree = cn.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32),
                   jnp.zeros((1, 4, TINY.context_dim), jnp.float32), hint)
    import re
    zeros = [int(m[1]) for k in tree["params"]
             if (m := re.match(r"zero_(\d+)$", k))]
    key_fn = lambda p: _controlnet_key(p, N_LEVELS, LPB, ATTN, max(zeros),
                                       "control_model.")
    src, n = _inverse_src(tree, key_fn)
    assert len(src) == n
    out = convert_controlnet_anydoor(tree, src, n_levels=N_LEVELS, lpb=LPB,
                                     attn_levels=ATTN)
    _check(tree, out, key_fn, src)
    # hint pyramid: 7 convs at even torch indices + the zero proj at 14
    assert "control_model.input_hint_block.0.weight" in src
    assert "control_model.input_hint_block.12.weight" in src
    assert "control_model.input_hint_block.14.weight" in src
    # mid zero conv routes to middle_block_out
    assert "control_model.middle_block_out.0.weight" in src
    assert f"control_model.zero_convs.{max(zeros)}.0.weight" not in src


def test_vae_ldm_roundtrip():
    vae = AutoencoderKL(TINY_VAE)
    px = jnp.zeros((1, 32, 32, 3), jnp.float32)
    tree = vae.init(jax.random.key(0), px)
    key_fn = lambda p: _ldm_vae_key(p, "first_stage_model.")
    src, n = _inverse_src(tree, key_fn)
    assert len(src) == n
    out = convert_vae_ldm(tree, src)
    _check(tree, out, key_fn, src)
    # spot names: ldm mid/attn/updown layout
    assert "first_stage_model.encoder.mid.block_1.conv1.weight" in src
    assert "first_stage_model.encoder.mid.attn_1.q.weight" in src
    assert "first_stage_model.decoder.up.1.upsample.conv.weight" in src
    assert "first_stage_model.quant_conv.weight" in src


def test_projector_roundtrip():
    from flax import linen as nn

    class _Proj(nn.Module):
        @nn.compact
        def __call__(self, e):
            return nn.Dense(8)(e)

    proj = _Proj()
    tree = proj.init(jax.random.key(0), jnp.zeros((1, 3, 16)))
    w = np.random.default_rng(1).standard_normal((8, 16)).astype(np.float32)
    b = np.zeros((8,), np.float32)
    out = convert_anydoor_projector(
        tree, {"cond_stage_model.projector.weight": w,
               "cond_stage_model.projector.bias": b})
    np.testing.assert_allclose(out["params"]["Dense_0"]["kernel"], w.T)


def test_hint_encoder_matches_reference_pyramid():
    """input_hint_block (cldm/cldm.py:146-163): strides at convs 4,8,12 give
    8x total downsampling; channel ladder 16,16,32,32,96,96,256."""
    from anyedit_tpu.models.controlnet import HintEncoder
    assert [c for c, _ in HintEncoder.PYRAMID] == [16, 16, 32, 32, 96, 96, 256]
    assert [s for _, s in HintEncoder.PYRAMID] == [1, 1, 2, 1, 2, 1, 2]
    enc = HintEncoder(TINY.block_channels[0], TINY)
    hint = jnp.zeros((1, 64, 64, 4), jnp.float32)
    params = enc.init(jax.random.key(0), hint)
    out = enc.apply(params, hint)
    assert out.shape == (1, 8, 8, TINY.block_channels[0])
    # zero-init projection → exact no-op contribution at init
    assert float(jnp.abs(out).max()) == 0.0


def test_dinov2_hub_swiglu_roundtrip():
    """Hub-named ViT-g state dict (SwiGLU mlp.w12/w3, ls gamma) converts,
    with bicubic pos-grid interpolation 28→14 patches."""
    import dataclasses as dc
    from anyedit_tpu.models.dinov2 import DinoV2, DinoV2Config
    from anyedit_tpu.weights.convert import convert_dinov2_hub

    cfg = DinoV2Config(img_size=28, patch=7, dim=32, depth=2, heads=2,
                       ffn="swiglu")
    m = DinoV2(cfg)
    tree = m.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3), jnp.float32))
    rng = np.random.default_rng(3)
    hid = cfg.swiglu_hidden
    src = {"cls_token": rng.standard_normal((1, 1, 32)).astype(np.float32),
           # source grid 8x8 (65 rows) → ours 4x4 (17 rows): interpolated
           "pos_embed": rng.standard_normal((1, 65, 32)).astype(np.float32),
           "patch_embed.proj.weight":
               rng.standard_normal((32, 3, 7, 7)).astype(np.float32),
           "patch_embed.proj.bias": np.zeros(32, np.float32),
           "norm.weight": np.ones(32, np.float32),
           "norm.bias": np.zeros(32, np.float32)}
    for i in range(2):
        b = f"blocks.{i}"
        src |= {f"{b}.norm1.weight": np.ones(32, np.float32),
                f"{b}.norm1.bias": np.zeros(32, np.float32),
                f"{b}.norm2.weight": np.ones(32, np.float32),
                f"{b}.norm2.bias": np.zeros(32, np.float32),
                f"{b}.attn.qkv.weight":
                    rng.standard_normal((96, 32)).astype(np.float32),
                f"{b}.attn.qkv.bias": np.zeros(96, np.float32),
                f"{b}.attn.proj.weight":
                    rng.standard_normal((32, 32)).astype(np.float32),
                f"{b}.attn.proj.bias": np.zeros(32, np.float32),
                f"{b}.ls1.gamma": np.full(32, 1e-5, np.float32),
                f"{b}.ls2.gamma": np.full(32, 1e-5, np.float32),
                f"{b}.mlp.w12.weight":
                    rng.standard_normal((2 * hid, 32)).astype(np.float32),
                f"{b}.mlp.w12.bias": np.zeros(2 * hid, np.float32),
                f"{b}.mlp.w3.weight":
                    rng.standard_normal((32, hid)).astype(np.float32),
                f"{b}.mlp.w3.bias": np.zeros(32, np.float32)}
    out = convert_dinov2_hub(tree, src)
    assert out["params"]["pos"].shape == tree["params"]["pos"].shape
    np.testing.assert_allclose(out["params"]["block_0"]["qkv"]["kernel"],
                               src["blocks.0.attn.qkv.weight"].T, rtol=1e-6)
    # converted params actually run
    o = m.apply(out, jnp.ones((1, 28, 28, 3), jnp.float32))
    assert o["cls"].shape == (1, 32) and o["patch"].shape == (1, 16, 32)


def test_bootstrap_registry_has_anydoor():
    from anyedit_tpu.weights.bootstrap import REGISTRY
    for name in ("unet_anydoor", "controlnet_anydoor", "anydoor_proj",
                 "vae_anydoor", "dinov2_g"):
        assert name in REGISTRY
