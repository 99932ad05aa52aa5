"""Converter tests: bijective round-trip through the HF naming scheme.

Real HF checkpoints are unavailable offline, so we validate that (a) every
param in our trees maps to a unique diffusers/CLIP key, (b) tensor
transforms round-trip exactly, (c) missing/mis-shaped source tensors fail
loudly. Absolute key-name fidelity is asserted against a frozen list of
known diffusers keys for the flagship blocks.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyedit_tpu.models.unet_sd import UNet2DCondition, TINY_UNET
from anyedit_tpu.models.vae import AutoencoderKL, TINY_VAE
from anyedit_tpu.models.clip import CLIPTextEncoder, TINY_TEXT
from anyedit_tpu.weights.convert import (
    convert_unet_sd, convert_vae, convert_clip_text,
    _unet_key, t_conv, t_linear, t_id, save_params, load_params_file,
)


def _fake_hf_from_ours(tree, key_fn):
    """Inverse-walk: build an HF-style state dict whose conversion must
    reproduce `tree` exactly."""
    inv = {id(t_conv): lambda w: np.transpose(w, (3, 2, 0, 1)),
           id(t_linear): np.transpose, id(t_id): np.asarray}
    hf = {}
    rng = np.random.default_rng(0)

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            key, tf = key_fn(path)
            assert key not in hf, f"duplicate mapping {key}"
            hf[key] = inv[id(tf)](np.asarray(node))

    walk(jax.tree.map(lambda x: np.asarray(x), tree), ())
    return hf


def test_unet_converter_roundtrip():
    cfg = dataclasses.replace(TINY_UNET, dtype=jnp.float32)
    model = UNet2DCondition(cfg)
    key = jax.random.key(0)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 4, cfg.context_dim))
    tree = model.init(key, x, t, ctx)
    n_levels = len(cfg.block_channels)
    hf = _fake_hf_from_ours(tree, lambda p: _unet_key(p, n_levels))
    # spot-check canonical diffusers key names exist
    assert "conv_in.weight" in hf
    assert "time_embedding.linear_1.weight" in hf
    assert any(k.startswith("down_blocks.0.attentions.0.transformer_blocks.0."
                            "attn2.to_k") for k in hf)
    assert any(k.startswith("up_blocks.1.resnets.0.norm1") for k in hf)
    out = convert_unet_sd(tree, hf, n_levels)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # converted weights actually run
    o = model.apply(out, x, t, ctx)
    assert o.shape == (1, 8, 8, 4)


def test_unet_converter_missing_key_raises():
    cfg = dataclasses.replace(TINY_UNET, dtype=jnp.float32)
    model = UNet2DCondition(cfg)
    tree = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                      jnp.zeros((1,), jnp.int32), jnp.zeros((1, 4, cfg.context_dim)))
    hf = _fake_hf_from_ours(tree, lambda p: _unet_key(p, 2))
    del hf["conv_in.weight"]
    with pytest.raises(KeyError, match="conv_in.weight"):
        convert_unet_sd(tree, hf, 2)


def test_vae_converter_roundtrip():
    from anyedit_tpu.weights.convert import _vae_key
    cfg = dataclasses.replace(TINY_VAE, dtype=jnp.float32)
    model = AutoencoderKL(cfg)
    tree = model.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
    n = len(cfg.block_channels)
    hf = _fake_hf_from_ours(tree, lambda p: _vae_key(p, n))
    assert "encoder.conv_in.weight" in hf
    assert "decoder.mid_block.attentions.0.to_q.weight" in hf
    assert "quant_conv.weight" in hf and "post_quant_conv.weight" in hf
    out = convert_vae(tree, hf, n)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_clip_text_converter_roundtrip():
    from anyedit_tpu.weights.convert import _clip_text_key
    cfg = dataclasses.replace(TINY_TEXT, dtype=jnp.float32)
    model = CLIPTextEncoder(cfg)
    tree = model.init(jax.random.key(2), jnp.zeros((1, 8), jnp.int32))
    hf = _fake_hf_from_ours(tree, _clip_text_key)
    assert "text_model.embeddings.token_embedding.weight" in hf
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in hf
    assert "text_model.final_layer_norm.weight" in hf
    out = convert_clip_text(tree, hf)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_load_msgpack(tmp_path):
    tree = {"params": {"a": np.ones((2, 3), np.float32),
                       "b": {"c": np.zeros((4,), np.float32)}}}
    save_params(tree, tmp_path / "m.msgpack")
    back = load_params_file(tmp_path / "m.msgpack")
    np.testing.assert_array_equal(back["params"]["a"], tree["params"]["a"])


def test_sam_converter_roundtrip():
    from anyedit_tpu.models.sam import SAM, TINY_SAM
    from anyedit_tpu.weights.convert import (
        convert_sam, _sam_key, t_convT, t_pos_embed,
    )
    cfg = dataclasses.replace(TINY_SAM, dtype=jnp.float32)
    m = SAM(cfg)
    tree = m.init(jax.random.key(0), jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
                  jnp.zeros((1, 1, 4)))
    inv = {id(t_conv): lambda w: np.transpose(w, (3, 2, 0, 1)),
           id(t_linear): np.transpose, id(t_id): np.asarray,
           id(t_convT): lambda w: np.transpose(w, (3, 2, 0, 1)),
           id(t_pos_embed): lambda w: np.asarray(w)[None]}
    hf = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            key, tf = _sam_key(path)
            assert key not in hf, f"duplicate {key}"
            if key == "prompt_encoder.no_mask_embed.weight":
                hf[key] = np.asarray(node)[None]       # (C,) ← (1,C)
            else:
                hf[key] = inv[id(tf)](np.asarray(node))

    walk(jax.tree.map(np.asarray, tree), ())
    assert "image_encoder.pos_embed" in hf
    assert "mask_decoder.transformer.layers.0.self_attn.q_proj.weight" in hf
    assert "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix" in hf
    out = convert_sam(tree, hf)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sdxl_unet_converter_roundtrip():
    """SDXL variant: linear proj_in/out reshape into our 1x1 convs; the
    micro-conditioning add_embedding keys map; per-level transformer
    depths are honored."""
    from anyedit_tpu.models.unet_sd import TINY_XL_UNET
    from anyedit_tpu.weights.convert import (
        _unet_key_linear_proj, convert_unet_sdxl, t_lin_as_conv11)

    cfg = dataclasses.replace(TINY_XL_UNET, dtype=jnp.float32)
    model = UNet2DCondition(cfg)
    key = jax.random.key(0)
    x = jnp.zeros((1, 8, 8, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 4, cfg.context_dim))
    pooled = jnp.zeros((1, cfg.addition_embed_dim))
    tids = jnp.zeros((1, cfg.addition_time_dim))
    tree = model.init(key, x, t, ctx, pooled_text=pooled, time_ids=tids)
    n_levels = len(cfg.block_channels)

    inv = {id(t_conv): lambda w: np.transpose(w, (3, 2, 0, 1)),
           id(t_linear): np.transpose, id(t_id): np.asarray,
           id(t_lin_as_conv11): lambda w: np.transpose(w[0, 0])}
    hf = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            k, tf = _unet_key_linear_proj(path, n_levels)
            assert k not in hf, k
            hf[k] = inv[id(tf)](np.asarray(node))

    walk(jax.tree.map(np.asarray, tree), ())
    assert "add_embedding.linear_1.weight" in hf
    # linear proj stored as 2-D in the diffusers checkpoint
    pk = [k for k in hf if k.endswith("proj_in.weight")]
    assert pk and all(hf[k].ndim == 2 for k in pk)
    out = convert_unet_sdxl(tree, hf, n_levels=n_levels)
    chex = __import__("chex")
    chex.assert_trees_all_close(out, jax.tree.map(np.asarray, tree))


def test_load_torch_state_sharded(tmp_path):
    """HF sharded checkpoints: directory of shards + *.index.json merge."""
    from safetensors.numpy import save_file
    from anyedit_tpu.weights.convert import load_torch_state
    import json

    a = {"layer.0.weight": np.ones((2, 2), np.float32)}
    b = {"layer.1.weight": np.full((3,), 2.0, np.float32)}
    save_file(a, str(tmp_path / "model-00001-of-00002.safetensors"))
    save_file(b, str(tmp_path / "model-00002-of-00002.safetensors"))
    (tmp_path / "model.safetensors.index.json").write_text(json.dumps({
        "weight_map": {"layer.0.weight": "model-00001-of-00002.safetensors",
                       "layer.1.weight": "model-00002-of-00002.safetensors"}}))
    for src in (tmp_path, tmp_path / "model.safetensors.index.json"):
        st = load_torch_state(src)
        assert set(st) == {"layer.0.weight", "layer.1.weight"}
        np.testing.assert_array_equal(st["layer.1.weight"], b["layer.1.weight"])
