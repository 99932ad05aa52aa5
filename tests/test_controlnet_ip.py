import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.models.unet_sd import (
    UNet2DCondition, TINY_UNET, TINY_XL_UNET, SDXL_UNET,
)
from anyedit_tpu.models.controlnet import ControlNet
from anyedit_tpu.models.ip_adapter import (
    ImageProjection, Resampler, IPAdapterWeights, cross_attn_sites,
    ip_adapter_processor,
)


F32 = lambda cfg: dataclasses.replace(cfg, dtype=jnp.float32)


def test_sdxl_unet_forward_and_params():
    cfg = F32(TINY_XL_UNET)
    model = UNet2DCondition(cfg)
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 8, 8, 4))
    t = jnp.array([10, 20])
    ctx = jax.random.normal(key, (2, 6, cfg.context_dim))
    pooled = jax.random.normal(key, (2, cfg.addition_embed_dim))
    tids = jnp.tile(jnp.array([[512, 512, 0, 0, 512, 512]], jnp.float32), (2, 1))
    params = model.init(key, x, t, ctx, pooled_text=pooled, time_ids=tids)
    out = model.apply(params, x, t, ctx, pooled_text=pooled, time_ids=tids)
    assert out.shape == (2, 8, 8, 4)
    # micro-conditioning is live: different time_ids → different output
    out2 = model.apply(params, x, t, ctx, pooled_text=pooled, time_ids=tids * 0)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-6


def test_sdxl_full_param_count():
    model = UNet2DCondition(SDXL_UNET)
    x = jax.ShapeDtypeStruct((1, 16, 16, 4), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((1, 77, 2048), jnp.float32)
    pooled = jax.ShapeDtypeStruct((1, 1280), jnp.float32)
    tids = jax.ShapeDtypeStruct((1, 6), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x, t, ctx,
                            pooled_text=pooled, time_ids=tids)
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 2.3e9 < n < 2.8e9, n  # SDXL base UNet ≈ 2.57B


def test_controlnet_zero_init_is_noop_then_learns():
    cfg = F32(TINY_UNET)
    unet = UNet2DCondition(cfg)
    cn = ControlNet(cfg)
    key = jax.random.key(1)
    x = jax.random.normal(key, (1, 8, 8, 4))
    t = jnp.array([5])
    ctx = jax.random.normal(key, (1, 4, cfg.context_dim))
    hint = jax.random.normal(key, (1, 64, 64, 3))
    up = unet.init(key, x, t, ctx)
    cp = cn.init(jax.random.fold_in(key, 1), x, t, ctx, hint)
    res, mid = cn.apply(cp, x, t, ctx, hint)
    # zero-convs → residuals are exactly zero at init
    for r in res + [mid]:
        assert float(jnp.max(jnp.abs(r))) == 0.0
    out_plain = unet.apply(up, x, t, ctx)
    out_ctrl = unet.apply(up, x, t, ctx, controlnet_residuals=res,
                          controlnet_mid=mid)
    np.testing.assert_allclose(np.asarray(out_ctrl), np.asarray(out_plain),
                               atol=1e-6)
    # perturb zero-conv weights → control becomes live
    import flax
    cp2 = flax.core.unfreeze(cp) if hasattr(flax.core, "unfreeze") else dict(cp)
    leaves = jax.tree_util.tree_map(lambda a: a + 0.01, cp)
    res2, mid2 = cn.apply(leaves, x, t, ctx, hint)
    out_ctrl2 = unet.apply(up, x, t, ctx, controlnet_residuals=res2,
                           controlnet_mid=mid2)
    assert float(jnp.max(jnp.abs(out_ctrl2 - out_plain))) > 1e-6


def test_image_projection_and_resampler_shapes():
    key = jax.random.key(2)
    emb = jax.random.normal(key, (2, 32))
    proj = ImageProjection(num_tokens=4, context_dim=16)
    p = proj.init(key, emb)
    toks = proj.apply(p, emb)
    assert toks.shape == (2, 4, 16)

    patches = jax.random.normal(key, (2, 10, 24))
    rs = Resampler(num_latents=6, dim=16, depth=2, heads=2, out_dim=16)
    rp = rs.init(key, patches)
    lat = rs.apply(rp, patches)
    assert lat.shape == (2, 6, 16)


def test_ip_adapter_end_to_end_in_unet():
    cfg = F32(TINY_UNET)
    unet = UNet2DCondition(cfg)
    key = jax.random.key(3)
    x = jax.random.normal(key, (1, 8, 8, 4))
    t = jnp.array([5])
    ctx = jax.random.normal(key, (1, 4, cfg.context_dim))
    up = unet.init(key, x, t, ctx)

    names, dims = cross_attn_sites(cfg)
    assert len(names) > 0 and all(n.endswith(".cross") for n in names)
    w = IPAdapterWeights(names, dims, cfg.context_dim)
    img_tokens = jax.random.normal(key, (1, 4, cfg.context_dim))
    wp = w.init(jax.random.fold_in(key, 1), img_tokens)
    site_kv = w.apply(wp, img_tokens)
    assert set(site_kv) == set(names)

    proc = ip_adapter_processor(site_kv, scale=1.0)
    out_ip = unet.apply(up, x, t, ctx, processor=proc)
    out_plain = unet.apply(up, x, t, ctx)
    assert float(jnp.max(jnp.abs(out_ip - out_plain))) > 1e-6
    # scale 0 → identical to plain
    out_zero = unet.apply(up, x, t, ctx,
                          processor=ip_adapter_processor(site_kv, scale=0.0))
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(out_plain),
                               atol=2e-6)
    # image sensitivity: different image tokens → different output
    site_kv2 = w.apply(wp, img_tokens * 2.0)
    out_ip2 = unet.apply(up, x, t, ctx,
                         processor=ip_adapter_processor(site_kv2, scale=1.0))
    assert float(jnp.max(jnp.abs(out_ip2 - out_ip))) > 1e-6


def test_cross_attn_sites_cover_unet_visits():
    """Site enumeration must exactly match the names the UNet emits."""
    cfg = F32(TINY_UNET)
    unet = UNet2DCondition(cfg)
    key = jax.random.key(4)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 4, cfg.context_dim))
    params = unet.init(key, x, t, ctx)
    seen = set()

    def spy(q, k, v, meta, extra):
        if not meta.is_self:
            seen.add(meta.name)
        from anyedit_tpu.ops.attention import sdpa_xla
        return sdpa_xla(q, k, v)

    unet.apply(params, x, t, ctx, processor=spy)
    names, _ = cross_attn_sites(cfg)
    assert seen == set(names)
