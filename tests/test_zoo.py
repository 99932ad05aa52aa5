"""Full-integration smoke: tiny model zoo → Toolbox → real pipeline run.

Random weights mean no semantic quality — these tests check the plumbing:
shapes, bucket resizes, jit boundaries, and that every closure composes.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from anyedit_tpu.core.config import CanvasConfig
from anyedit_tpu.models.gdino import TINY_GDINO
from anyedit_tpu.models.sam import TINY_SAM
from anyedit_tpu.models.lama import TINY_LAMA
from anyedit_tpu.models.unet_sd import TINY_UNET
from anyedit_tpu.models.vae import TINY_VAE
from anyedit_tpu.models.clip import TINY_TEXT
from anyedit_tpu.runtime.zoo import ModelZoo, ZooConfig


@pytest.fixture(scope="module")
def zoo():
    cfg = ZooConfig(
        canvas=CanvasConfig(edit_size=32, grounding_size=32, sam_size=64,
                            latent_down=2),
        gdino=dataclasses.replace(TINY_GDINO, dtype=jnp.float32),
        sam=dataclasses.replace(TINY_SAM, dtype=jnp.float32),
        lama=TINY_LAMA,
        ip2p_unet=dataclasses.replace(TINY_UNET, in_channels=8,
                                      dtype=jnp.float32),
        vae=dataclasses.replace(TINY_VAE, dtype=jnp.float32),
        text=dataclasses.replace(TINY_TEXT, dtype=jnp.float32,
                                 vocab_size=30522, max_len=77),
        box_threshold=0.0,  # random weights: accept anything for smoke
    )
    return ModelZoo(cfg)


def test_grounder_smoke(zoo):
    img = np.random.default_rng(0).integers(0, 255, (48, 40, 3), np.uint8)
    g = zoo.grounder()(img, "red square", mode="merge")
    # random weights may or may not detect; if they do, shapes must be right
    if g is not None:
        assert g.mask.shape == (48, 40)
        assert g.boxes.shape[1] == 4
        assert 0.0 <= float(g.union_ratio) <= 1.0


def test_inpainter_identity_outside_mask(zoo):
    img01 = np.random.default_rng(1).random((30, 37, 3)).astype(np.float32)
    mask = np.zeros((30, 37), np.float32)
    mask[5:15, 5:15] = 1.0
    out = zoo.inpainter()(img01, mask)
    assert out.shape == img01.shape
    np.testing.assert_allclose(out * (1 - mask[..., None]),
                               img01 * (1 - mask[..., None]), atol=1e-5)


def test_ip2p_editor_smoke(zoo):
    img = np.random.default_rng(2).integers(0, 255, (48, 40, 3), np.uint8)
    out = zoo.ip2p()(img, "make it blue", None, steps=2, seed=0)
    assert out.shape == img.shape and out.dtype == np.uint8
    mask = np.zeros((48, 40), np.float32)
    mask[:24] = 1.0
    out2 = zoo.ip2p()(img, "make it blue", mask, steps=2, seed=0)
    assert out2.shape == img.shape


def test_toolbox_composition(zoo):
    tb = zoo.toolbox(with_diffusion=False)
    assert tb.ground is not None and tb.inpaint is not None


def test_require_weights_fails_loud(tmp_path):
    """--require-weights semantics: a missing per-slot msgpack raises
    instead of silently random-initializing (zoo.py load_params/_wf)."""
    (tmp_path / "vocab.txt").write_text("[PAD]\n[UNK]\n[CLS]\n[SEP]\na\n")
    (tmp_path / "clip_merges.txt").write_text("#version: 0.2\n")
    from anyedit_tpu.cli import tiny_zoo_config
    z = ModelZoo(tiny_zoo_config(), weights_dir=tmp_path,
                 require_weights=True)
    with pytest.raises(FileNotFoundError, match="lama"):
        z.inpainter()
    with pytest.raises(ValueError, match="weights_dir"):
        ModelZoo(tiny_zoo_config(), require_weights=True)


def test_ip2p_stepwise_matches_fused():
    """cfg.fused_diffusion_loop=False (per-step compile units for hosts
    whose remote-compile can't take the 50-step fori_loop graph) must be
    bit-equivalent to the fused path — same RNG draws, same DDIM chain,
    same per-step masked compositing."""
    from anyedit_tpu.cli import tiny_zoo_config

    img = np.random.default_rng(7).integers(0, 255, (64, 64, 3), np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[:32] = 1.0
    outs = []
    for fused in (True, False):
        cfg = dataclasses.replace(tiny_zoo_config(),
                                  fused_diffusion_loop=fused)
        edit = ModelZoo(cfg).ip2p()
        outs.append((edit(img, "make it blue", None, steps=3, seed=1),
                     edit(img, "make it blue", mask, steps=3, seed=1)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_grounder_stepwise_matches_monolithic(zoo):
    """stepwise_grounding=True builds the same grounder semantics from
    per-layer compile units (the production-shape path)."""
    import dataclasses as dc

    img = np.zeros((48, 48, 3), np.uint8)
    img[12:36, 12:36] = (250, 30, 30)
    g0 = zoo.toolbox(slots=[]).ground(img, "red square")
    z2 = ModelZoo(dc.replace(zoo.cfg, stepwise_grounding=True), seed=zoo.seed)
    g1 = z2.toolbox(slots=[]).ground(img, "red square")
    assert (g0 is None) == (g1 is None)
    if g0 is not None:
        np.testing.assert_allclose(np.asarray(g1.boxes), np.asarray(g0.boxes),
                                   atol=1e-3, rtol=1e-3)
        same = np.mean((np.asarray(g1.mask) > 0) == (np.asarray(g0.mask) > 0))
        assert same > 0.99, same


def test_ip2p_lcm_mode(zoo, tmp_path):
    """cfg.lcm_steps>0 routes the ip2p slot through the distilled few-step
    consistency sampler (train/distill.py lcm_edit): guidance knobs are
    folded into the weights (ignored per-call), masked edits composite at
    x0, and a `unet_ip2p_lcm.msgpack` student is preferred over the
    teacher slot."""
    import jax
    from flax.serialization import msgpack_restore, msgpack_serialize

    cfg = dataclasses.replace(zoo.cfg, lcm_steps=2)
    z = ModelZoo(cfg)
    edit = z.ip2p()
    img = np.random.default_rng(5).integers(0, 255, (48, 40, 3), np.uint8)
    out = edit(img, "make it blue", None, seed=0)
    assert out.shape == img.shape and out.dtype == np.uint8

    # the teacher's CFG knobs are folded into the student: per-call
    # steps/s_txt/s_img must not change the result
    out2 = edit(img, "make it blue", None, steps=17, s_txt=3.5, s_img=0.1,
                seed=0)
    np.testing.assert_array_equal(out, out2)

    mask = np.zeros((48, 40), np.float32)
    mask[:24] = 1.0
    outm = edit(img, "make it blue", mask, seed=0)
    assert outm.shape == img.shape
    assert not np.array_equal(outm, out)   # composite changed the bottom

    # distilled-student slot preference: with unet_ip2p_lcm.msgpack on
    # disk, _ip2p_core loads IT (not the teacher slot / random init)
    hw = cfg.canvas.edit_size // cfg.canvas.latent_down
    from anyedit_tpu.models.unet_sd import UNet2DCondition
    unet = UNet2DCondition(cfg.ip2p_unet)
    student = jax.jit(unet.init)(
        jax.random.key(123),
        jnp.zeros((3, hw, hw, cfg.ip2p_unet.in_channels), jnp.float32),
        jnp.zeros((3,), jnp.int32),
        jnp.zeros((3, 77, cfg.ip2p_unet.context_dim), jnp.float32))
    (tmp_path / "unet_ip2p_lcm.msgpack").write_bytes(
        msgpack_serialize(jax.device_get(student)))
    zw = ModelZoo(cfg, weights_dir=tmp_path, allow_fallback_tokenizers=True)
    _, loaded, _ = zw._ip2p_core()
    want = msgpack_restore(
        (tmp_path / "unet_ip2p_lcm.msgpack").read_bytes())
    lw = jax.tree_util.tree_leaves(want)
    ll = jax.tree_util.tree_leaves(loaded)
    assert len(lw) == len(ll)
    np.testing.assert_array_equal(np.asarray(ll[0]), np.asarray(lw[0]))
