"""GDINO + LaMa converter validation (no real checkpoints offline):

* build a synthetic torch-style state dict with the exact source key names
  and shapes the converters expect, derived by inverse-walking our trees,
* convert and assert exact landing (values + transposes) per leaf,
* verify fused in_proj slicing and the FFC concat/interleave transforms.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyedit_tpu.models.gdino import GroundingDINO, TINY_GDINO
from anyedit_tpu.models.lama import LamaGenerator, TINY_LAMA
from anyedit_tpu.weights.convert import (
    _gdino_key, _lama_key, convert_gdino, convert_lama,
    t_conv, t_linear, t_id, t_fu_pack, t_fu_vec, t_convT4, _split3,
)


def _inverse_src(tree, key_fn):
    """Walk our tree; build {src_key: tensor} s.t. convert reproduces it."""
    rng = np.random.default_rng(0)
    src: dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        leaf = np.asarray(node)
        key, tf = key_fn(path)
        if isinstance(key, tuple):
            # concat transforms (LaMa split downsample): draw source halves
            if key[0] in src:
                return
            if leaf.ndim == 4:      # conv kernel concat on O
                o = leaf.shape[-1]
                ol = o // 4         # TINY ratio 0.75 → local quarter
                a = rng.standard_normal((ol,) + (leaf.shape[2],) +
                                        leaf.shape[:2]).astype(np.float32)
                b = rng.standard_normal((o - ol,) + (leaf.shape[2],) +
                                        leaf.shape[:2]).astype(np.float32)
            else:
                o = leaf.shape[0]
                ol = o // 4
                a = rng.standard_normal(ol).astype(np.float32)
                b = rng.standard_normal(o - ol).astype(np.float32)
            src[key[0]], src[key[1]] = a, b
            return
        if key in src:
            return
        # per-transform inverse source shapes
        if "in_proj_" in key and key.endswith(("weight", "bias")) \
                and ".self_attn." in key or ".ca_text." in key:
            if key.endswith("in_proj_weight"):
                c = leaf.shape[0]
                src[key] = rng.standard_normal((3 * c, c)).astype(np.float32)
                return
            if key.endswith("in_proj_bias"):
                c = leaf.shape[0]
                src[key] = rng.standard_normal(3 * c).astype(np.float32)
                return
        if tf is t_conv:
            h, w, i, o = leaf.shape
            src[key] = rng.standard_normal((o, i, h, w)).astype(np.float32)
        elif tf is t_convT4:
            h, w, o, i = leaf.shape
            src[key] = rng.standard_normal((i, o, h, w)).astype(np.float32)
        elif tf is t_linear:
            src[key] = rng.standard_normal(leaf.T.shape).astype(np.float32)
        elif tf is t_fu_pack:
            h, w, i, o = 1, 1, leaf.shape[2], leaf.shape[3]
            src[key] = rng.standard_normal((o, i, h, w)).astype(np.float32)
        elif tf is t_fu_vec:
            src[key] = rng.standard_normal(leaf.shape).astype(np.float32)
        elif key.endswith("cls_token"):
            src[key] = rng.standard_normal((1, 1) + leaf.shape).astype(np.float32)
        elif key.endswith("pos_embed"):
            src[key] = rng.standard_normal((1,) + leaf.shape).astype(np.float32)
        else:
            # convT kernels (leaf (k,k,O,I); torch (I,O,k,k)) + identity
            if leaf.ndim == 4 and key.endswith("weight") and "model." in key:
                h, w, o, i = leaf.shape
                src[key] = rng.standard_normal((i, o, h, w)).astype(np.float32)
            else:
                w = rng.standard_normal(leaf.shape).astype(np.float32)
                if key.endswith("running_var"):
                    w = np.abs(w) + 0.5     # variances must be positive
                src[key] = w

    walk(jax.tree.map(np.asarray, tree), ())
    for k, v in src.items():                 # variances must be positive
        if k.endswith("running_var"):
            src[k] = np.abs(v) + 0.5
    return src


def test_gdino_converter_total_and_exact():
    cfg = dataclasses.replace(TINY_GDINO, dtype=jnp.float32)
    m = GroundingDINO(cfg)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    msk = jnp.ones((1, cfg.max_text_len), bool)
    tree = m.init(jax.random.key(0), px, ids, msk)["params"]
    src = _inverse_src(tree, _gdino_key)
    # canonical reference key names must appear
    for want in ("backbone.0.patch_embed.proj.weight",
                 "bert.encoder.layer.0.attention.self.query.weight",
                 "transformer.encoder.fusion_layers.0.attn.v_proj.weight",
                 "transformer.encoder.layers.0.self_attn.sampling_offsets.weight",
                 "transformer.decoder.layers.0.ca_text.in_proj_weight",
                 "transformer.decoder.ref_point_head.layers.0.weight",
                 "transformer.enc_output.weight", "bbox_embed.0.layers.2.weight",
                 "input_proj.0.0.weight", "feat_map.weight",
                 "transformer.tgt_embed.weight"):
        assert want in src, want
    out = convert_gdino(tree, src)
    # exact landing: linear transposed, conv HWIO, fused qkv sliced
    np.testing.assert_array_equal(
        out["feat_map"]["kernel"], src["feat_map.weight"].T)
    np.testing.assert_array_equal(
        out["in_proj_0"]["kernel"],
        np.transpose(src["input_proj.0.0.weight"], (2, 3, 1, 0)))
    fused = src["transformer.decoder.layers.0.self_attn.in_proj_weight"]
    c = fused.shape[1]
    np.testing.assert_array_equal(out["dec_0"]["sk"]["kernel"],
                                  fused[c:2 * c].T)
    # converted tree must run
    logits, boxes = m.apply({"params": out}, px, ids, msk)
    assert np.isfinite(np.asarray(logits)).all()


def test_gdino_converter_missing_key_raises():
    cfg = dataclasses.replace(TINY_GDINO, dtype=jnp.float32)
    m = GroundingDINO(cfg)
    tree = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                  jnp.zeros((1, cfg.max_text_len), jnp.int32),
                  jnp.ones((1, cfg.max_text_len), bool))["params"]
    with pytest.raises(KeyError):
        convert_gdino(tree, {"module.backbone.0.patch_embed.proj.weight":
                             np.zeros((16, 3, 4, 4))})


def test_lama_converter_total_and_exact():
    cfg = TINY_LAMA
    m = LamaGenerator(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    msk = jnp.zeros((1, 32, 32, 1))
    tree = m.init(jax.random.key(0), img, msk)["params"]
    kf = lambda p: _lama_key(p, cfg.n_downsample, cfg.n_blocks)
    src = _inverse_src(tree, kf)
    for want in ("model.1.ffc.convl2l.weight",          # stem
                 "model.3.ffc.convl2l.weight",          # last downsample (split)
                 "model.3.ffc.convl2g.weight",
                 "model.4.conv1.ffc.convg2g.fu.conv_layer.weight",
                 "model.7.weight",                      # first ConvTranspose
                 f"model.{4 + 4 * cfg.n_downsample + cfg.n_blocks}.weight"):
        assert want in src, sorted(src)[:40]
    out = convert_lama(tree, {("generator." + k): v for k, v in src.items()},
                       n_down=cfg.n_downsample, n_blocks=cfg.n_blocks)
    # stem conv exact
    np.testing.assert_array_equal(
        out["stem"]["kernel"],
        np.transpose(src["model.1.ffc.convl2l.weight"], (2, 3, 1, 0)))
    # split downsample concat on O axis
    got = out[f"down_{cfg.n_downsample - 1}"]["kernel"]
    a = np.transpose(src["model.3.ffc.convl2l.weight"], (2, 3, 1, 0))
    b = np.transpose(src["model.3.ffc.convl2g.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(got, np.concatenate([a, b], axis=-1))
    # converted tree must run
    y = m.apply({"params": out}, img, msk)
    assert np.isfinite(np.asarray(y)).all()


def test_fu_pack_interleave_semantics():
    """torch FourierUnit channels are (re,im)-interleaved; ours are
    [re..., im...]. t_fu_pack must permute BOTH kernel channel axes."""
    c = 3
    w = np.zeros((2 * c, 2 * c, 1, 1), np.float32)   # (O, I, 1, 1)
    for o in range(2 * c):
        for i in range(2 * c):
            w[o, i] = 100 * o + i
    packed = t_fu_pack(w)                            # (1,1,I,O) ours-order
    # ours input channel 0 = torch re_0 = torch input 0; ours input c =
    # torch im_0 = torch input 1
    assert packed[0, 0, 0, 0] == w[0, 0]
    assert packed[0, 0, c, 0] == w[0, 1]
    # ours output c (im_0) = torch output 1
    assert packed[0, 0, 0, c] == w[1, 0]
    v = np.arange(2 * c, dtype=np.float32)
    np.testing.assert_array_equal(
        t_fu_vec(v), np.concatenate([v[0::2], v[1::2]]))


def test_bootstrap_registry_abstract_trees():
    """Every REGISTRY entry must build against an abstract tree: verify the
    end-to-end cmd path on the aesthetic head (small enough to run) and
    that eval_shape trees walk without materializing params."""
    import torch
    from anyedit_tpu.weights.bootstrap import REGISTRY, convert_checkpoint

    assert {"unet_ip2p", "vae", "clip_text", "clip_vision", "sam", "gdino",
            "lama", "aesthetic"} <= set(REGISTRY)
    mlp = torch.nn.Sequential(
        torch.nn.Linear(768, 1024), torch.nn.Dropout(0.2),
        torch.nn.Linear(1024, 128), torch.nn.Dropout(0.2),
        torch.nn.Linear(128, 64), torch.nn.Dropout(0.1),
        torch.nn.Linear(64, 16), torch.nn.Linear(16, 1))
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "aes.pth")
        torch.save({f"layers.{k}": v for k, v in mlp.state_dict().items()},
                   src)
        out = os.path.join(d, "aesthetic.msgpack")
        convert_checkpoint("aesthetic", src, out)
        from anyedit_tpu.weights.convert import load_params_file
        tree = load_params_file(out)
        assert tree["fc0"]["kernel"].shape == (768, 1024)


def test_hed_converter_and_structure():
    """HED: converter totality (synthetic ControlNetHED state dict) and the
    5-projection-mean forward semantics with handcrafted weights."""
    import jax
    import jax.numpy as jnp
    from anyedit_tpu.models.hed import HED, HED_STAGES
    from anyedit_tpu.weights.convert import _hed_key, convert_hed

    m = HED()
    px = jnp.zeros((1, 32, 32, 3))
    tree = m.init(jax.random.key(0), px)["params"]
    src = _inverse_src(tree, _hed_key)
    assert "block1.convs.0.weight" in src and "block5.projection.weight" in src
    out = convert_hed(tree, src)
    np.testing.assert_array_equal(
        out["b0_conv0"]["kernel"],
        np.transpose(src["block1.convs.0.weight"], (2, 3, 1, 0)))
    y = m.apply({"params": out}, px)
    assert y.shape == (1, 32, 32) and np.isfinite(np.asarray(y)).all()
    # semantics: zero weights → projections all bias; sigmoid(mean(bias))
    zeroed = jax.tree.map(np.zeros_like, out)
    for i in range(5):
        zeroed[f"b{i}_proj"]["bias"] = np.asarray([float(i)])
    y0 = m.apply({"params": zeroed}, px)
    import scipy.special
    np.testing.assert_allclose(np.asarray(y0)[0, 0, 0],
                               scipy.special.expit(np.mean([0, 1, 2, 3, 4])),
                               atol=1e-6)


def test_depth_anything_converter_total():
    """DA-V2 converter: official naming coverage (pretrained.* dinov2 fused
    qkv + depth_head.* scratch/refinenet/resize layout), exact landing."""
    import dataclasses as dc
    import jax.numpy as jnp
    from anyedit_tpu.models.depth import DepthAnythingV2, TINY_DEPTH
    from anyedit_tpu.weights.convert import _da2_key, convert_depth_anything

    cfg = dc.replace(TINY_DEPTH, dtype=jnp.float32)
    m = DepthAnythingV2(cfg)
    s = cfg.backbone.img_size
    px = jnp.zeros((1, s, s, 3))
    tree = m.init(jax.random.key(0), px)["params"]
    src = _inverse_src(tree, _da2_key)
    for want in ("pretrained.blocks.0.attn.qkv.weight",
                 "pretrained.blocks.0.ls1.gamma",
                 "depth_head.projects.0.weight",
                 "depth_head.resize_layers.0.weight",
                 "depth_head.scratch.layer1_rn.weight",
                 "depth_head.scratch.refinenet4.resConfUnit2.conv1.weight",
                 "depth_head.scratch.refinenet1.out_conv.weight",
                 "depth_head.scratch.output_conv2.2.weight"):
        assert want in src, want
    out = convert_depth_anything(tree, src)
    np.testing.assert_array_equal(
        out["head"]["layer1_rn"]["kernel"],
        np.transpose(src["depth_head.scratch.layer1_rn.weight"], (2, 3, 1, 0)))
    d = m.apply({"params": out}, px)
    assert d.shape == (1, s, s) and np.isfinite(np.asarray(d)).all()
