"""W8A8 int8 fast-mode numerics (ops/quant.py).

Bounds the quantization drift per layer and end-to-end through the tiny
UNet: the int8 path must track the bf16 path closely enough that the
50-step CFG edit stays in-distribution (per-layer relative error ~1%,
whole-UNet cosine > 0.95 at random weights — random weights are the
WORST case for per-channel quant because activations are near-gaussian
with no outlier structure for per-channel scales to exploit).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyedit_tpu.models.unet_sd import TINY_UNET, UNet2DCondition
from anyedit_tpu.ops.quant import (
    QuantConv, QuantDense, absmax_scale, quantize_int8, quantize_kernel,
    quantize_params,
)



def test_quantize_int8_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 32)),
                    jnp.float32)
    s = absmax_scale(x)
    xq = quantize_int8(x, s)
    assert xq.dtype == jnp.int8
    err = np.abs(np.asarray(xq, np.float32) * np.asarray(s) - np.asarray(x))
    assert err.max() <= float(s[0, 0]) * 0.5 + 1e-6   # half-ulp of the grid


def test_quant_dense_tracks_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 64)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(64,)) * 0.01, jnp.float32)
    kq, ks = quantize_kernel(w)
    params = {"params": {"kernel_q": kq, "kernel_scale": ks, "bias": b}}
    got = QuantDense(64, dtype=jnp.float32).apply(params, x)
    want = x @ w + b
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel


def test_quant_conv_tracks_float():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 24)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 24, 16)) * 0.05, jnp.float32)
    kq, ks = quantize_kernel(w)
    params = {"params": {"kernel_q": kq, "kernel_scale": ks,
                         "bias": jnp.zeros((16,), jnp.float32)}}
    got = QuantConv(16, dtype=jnp.float32).apply(params, x)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel


def test_unet_quant_end_to_end():
    cfg = TINY_UNET
    qcfg = dataclasses.replace(cfg, quant=True)
    unet, qunet = UNet2DCondition(cfg), UNet2DCondition(qcfg)
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    t = jnp.asarray([500])
    ctx = jax.random.normal(jax.random.key(2), (1, 7, cfg.context_dim))
    fparams = unet.init(key, x, t, ctx)
    shapes = jax.eval_shape(lambda: qunet.init(key, x, t, ctx))
    qparams = {"params": quantize_params(shapes["params"],
                                         fparams["params"])}
    want = unet.apply(fparams, x, t, ctx)
    got = qunet.apply(qparams, x, t, ctx)
    assert np.isfinite(np.asarray(got)).all()
    cos = float(jnp.sum(got * want)
                / (jnp.linalg.norm(got) * jnp.linalg.norm(want)))
    assert cos > 0.95, cos


def test_zoo_quant_ip2p_edit():
    """quant_ip2p=True streams an edit end-to-end through the quantized
    UNet (params converted at slot build from the float load path)."""
    from anyedit_tpu.cli import tiny_zoo_config
    from anyedit_tpu.runtime.zoo import ModelZoo

    cfg = dataclasses.replace(tiny_zoo_config(), quant_ip2p=True)
    zoo = ModelZoo(cfg)
    img = np.random.default_rng(3).integers(0, 255, (32, 32, 3), np.uint8)
    out = zoo.ip2p()(img, "make it blue", None, steps=2, seed=0)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float32)).all()


def test_zoo_quant_dp_batched_editor():
    """int8 params (int8 leaves + fp32 scales) replicate over a dp=8 mesh
    and the batched editor runs end-to-end — quant composes with the
    multi-chip data-parallel path, not just the single-chip editor."""
    from anyedit_tpu.cli import tiny_zoo_config
    from anyedit_tpu.core.mesh import make_mesh, MeshSpec
    from anyedit_tpu.runtime.zoo import ModelZoo

    cfg = dataclasses.replace(tiny_zoo_config(), quant_ip2p=True)
    zoo = ModelZoo(cfg)
    mesh = make_mesh(MeshSpec(dp=8), devices=jax.devices()[:8])
    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 255, (32, 32, 3), np.uint8) for _ in range(2)]
    outs = zoo.ip2p_batch_fn(mesh=mesh, bucket=8)(
        imgs, ["make it red", "make it blue"], steps=2, seeds=[1, 2])
    assert len(outs) == 2
    for o, im in zip(outs, imgs):
        assert o.shape == im.shape and o.dtype == np.uint8
        assert np.isfinite(o.astype(np.float32)).all()


def test_zoo_quant_diffusion_inpaint_and_refine():
    """quant_diffusion=True extends W8A8 to the 9-ch inpaint UNet and the
    SDXL-class refine UNet (the other pure-sampling slots)."""
    from anyedit_tpu.cli import tiny_zoo_config
    from anyedit_tpu.runtime.zoo import ModelZoo

    cfg = dataclasses.replace(tiny_zoo_config(), quant_diffusion=True)
    zoo = ModelZoo(cfg)
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = zoo.sd_inpainter()(img, mask, "a red square", steps=2, seed=0)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float32)).all()
    unet, params = zoo._refine_unet()
    flat = jax.tree_util.tree_leaves(params)
    assert any(leaf.dtype == jnp.int8 for leaf in flat)


def test_mmdit_quant_end_to_end():
    """MMDiT (SD3/UltraEdit backbone) quant=True forward tracks the float
    forward after quantize_params (block projections/FFNs int8; adaLN,
    embeds and head float)."""
    from anyedit_tpu.models.mmdit import MMDiT, TINY_MMDIT

    cfg = TINY_MMDIT
    qcfg = dataclasses.replace(cfg, quant=True)
    m, qm = MMDiT(cfg), MMDiT(qcfg)
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, cfg.in_channels))
    t = jnp.asarray([0.5], jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 7, cfg.context_dim))
    pooled = jax.random.normal(jax.random.key(3), (1, cfg.pooled_dim))
    fparams = m.init(key, x, t, ctx, pooled)
    shapes = jax.eval_shape(lambda: qm.init(key, x, t, ctx, pooled))
    qparams = {"params": quantize_params(shapes["params"],
                                         fparams["params"])}
    want = m.apply(fparams, x, t, ctx, pooled)
    got = qm.apply(qparams, x, t, ctx, pooled)
    assert np.isfinite(np.asarray(got)).all()
    cos = float(jnp.sum(got * want)
                / (jnp.linalg.norm(got) * jnp.linalg.norm(want)))
    assert cos > 0.95, cos


def test_flux_quant_end_to_end():
    """Flux (textual_change generator) quant=True forward tracks float."""
    from anyedit_tpu.models.flux import Flux, TINY_FLUX, make_ids

    cfg = TINY_FLUX
    qcfg = dataclasses.replace(cfg, quant=True)
    m, qm = Flux(cfg), Flux(qcfg)
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, cfg.in_channels))
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 7, cfg.context_dim))
    pooled = jax.random.normal(jax.random.key(3), (1, cfg.pooled_dim))
    fparams = m.init(key, x, t, ctx, pooled)
    shapes = jax.eval_shape(lambda: qm.init(key, x, t, ctx, pooled))
    qparams = {"params": quantize_params(shapes["params"],
                                         fparams["params"])}
    want = m.apply(fparams, x, t, ctx, pooled)
    got = qm.apply(qparams, x, t, ctx, pooled)
    assert np.isfinite(np.asarray(got)).all()
    cos = float(jnp.sum(got * want)
                / (jnp.linalg.norm(got) * jnp.linalg.norm(want)))
    assert cos > 0.95, cos


def test_flash_int8_matches_sdpa_interpret():
    """INT8 flash kernel (interpret mode) tracks the fp32 sdpa: per-tensor
    symmetric quantization on q/k plus the fixed /127 prob grid bounds the
    output drift to a few percent at SD-like magnitudes."""
    from anyedit_tpu.ops.attention import flash_int8, sdpa_xla

    rng = np.random.default_rng(5)
    bh, l, d = 2, 1024, 128
    q = jnp.asarray(rng.normal(size=(bh, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(bh, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(bh, l, d)), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    got = flash_int8(q, k, v, scale, block_q=512, block_k=512,
                     interpret=True)
    want = sdpa_xla(q[:, None].reshape(bh, 1, l, d),
                    k.reshape(bh, 1, l, d), v.reshape(bh, 1, l, d),
                    scale=scale).reshape(bh, l, d)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.03, rel      # per-row q / per-channel v scales


def test_quant_batched_vs_per_record_drift_bounded():
    """dp-batched int8 vs per-record int8: the activation scales are
    per-row/per-sample (mathematically batch-independent), but fp32
    reduction order differs between batch shapes, and int8 ROUNDING turns
    last-bit scale differences into discrete jumps that chain across
    steps — so exact bf16-style batch invariance
    (test_parallel_edit.py::test_dp_batch_matches_per_record, <2/255)
    does not hold. Bound the drift instead: a few quant levels of mean
    divergence, same image content."""
    from anyedit_tpu.cli import tiny_zoo_config
    from anyedit_tpu.core.mesh import make_mesh, MeshSpec
    from anyedit_tpu.runtime.zoo import ModelZoo

    cfg = dataclasses.replace(tiny_zoo_config(), quant_ip2p=True)
    zoo = ModelZoo(cfg)
    mesh = make_mesh(MeshSpec(dp=8), devices=jax.devices()[:8])
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, (32, 32, 3), np.uint8) for _ in range(2)]
    instrs = ["make it red", "add snow"]
    outs = zoo.ip2p_batch_fn(mesh=mesh, bucket=8)(
        imgs, instrs, steps=2, seeds=[3, 4])
    single = zoo.ip2p()
    for i in range(2):
        want = single(imgs[i], instrs[i], None, steps=2, seed=3 + i)
        drift = np.mean(np.abs(outs[i].astype(np.float32)
                               - want.astype(np.float32)))
        assert drift < 16.0, drift      # ~6% of the u8 range


def test_llama_quant_end_to_end():
    """Llama (instruction-gen LLM) quant=True forward tracks float — the
    W8A8 block projections must preserve next-token logit ordering at
    tiny random-weight scale."""
    from anyedit_tpu.models.llama import Llama, TINY_LLAMA

    cfg = TINY_LLAMA
    qcfg = dataclasses.replace(cfg, quant=True)
    key = jax.random.key(0)
    ids = jax.random.randint(jax.random.key(1), (1, 9), 0, cfg.vocab_size)
    m, qm = Llama(cfg), Llama(qcfg)
    fparams = m.init(key, ids)
    shapes = jax.eval_shape(lambda: qm.init(key, ids))
    qparams = {"params": quantize_params(shapes["params"],
                                         fparams["params"])}
    want = m.apply(fparams, ids)
    got = qm.apply(qparams, ids)
    w = want[0] if isinstance(want, tuple) else want
    g = got[0] if isinstance(got, tuple) else got
    assert np.isfinite(np.asarray(g)).all()
    cos = float(jnp.sum(g * w) / (jnp.linalg.norm(g) * jnp.linalg.norm(w)))
    assert cos > 0.95, cos


def test_quantize_params_fails_loudly_on_mismatch():
    cfg = dataclasses.replace(TINY_UNET, quant=True)
    qunet = UNet2DCondition(cfg)
    key = jax.random.key(0)
    x = jnp.zeros((1, 8, 8, 4))
    shapes = jax.eval_shape(
        lambda: qunet.init(key, x, jnp.asarray([1]),
                           jnp.zeros((1, 7, cfg.context_dim))))
    with pytest.raises(KeyError):
        quantize_params(shapes["params"], {"wrong": {}})
