"""SD3 MM-DiT + Flux converter validation (inverse-walk, no checkpoints).

Covers the fused projections (our per-stream qkv / single-block linear1 map
to CONCATs of diffusers to_q/to_k/to_v/proj_mlp), the AdaLayerNormContinuous
half-swap, the PatchEmbed conv→Dense rearrangement, and the positional-grid
reshape. Reference use sites: attribute_tool.py:83 (SD3 UltraEdit),
textual_change_tool.py:24-41 (FluxPipeline).
"""

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.models.flux import Flux, TINY_FLUX
from anyedit_tpu.models.mmdit import MMDiT, TINY_MMDIT
from anyedit_tpu.weights.convert import (
    _flux_key, _mmdit_key, convert_flux, convert_mmdit,
    t_conv, t_linear, t_id, t_patch_conv_as_dense,
    t_swap_halves_lin, t_swap_halves_bias, t_cat_linear, t_cat_bias,
)


def _inv_shape(tf, leaf_shape, keys, our_path):
    """Source shapes whose transform reproduces leaf_shape; returns a list
    aligned with `keys` (len>1 for concat transforms)."""
    if tf is t_linear:
        i, o = leaf_shape
        return [(o, i)]
    if tf is t_id:
        return [tuple(leaf_shape)]
    if tf is t_conv:
        kh, kw, i, o = leaf_shape
        return [(o, i, kh, kw)]
    if tf is t_patch_conv_as_dense:
        flat, o = leaf_shape          # (p·p·C, D); TINY patch=2
        p = 2
        return [(o, flat // (p * p), p, p)]
    if tf is t_swap_halves_lin:
        i, o = leaf_shape
        return [(o, i)]
    if tf is t_swap_halves_bias:
        return [tuple(leaf_shape)]
    if tf in (t_cat_linear, t_cat_bias):
        if tf is t_cat_linear:
            i, o = leaf_shape
        else:
            (o,) = leaf_shape
        if len(keys) == 3:
            parts = [o // 3] * 3
        else:                          # linear1: (d, d, d, 4d)
            d = o // 7
            parts = [d, d, d, 4 * d]
        if tf is t_cat_linear:
            return [(pp, i) for pp in parts]
        return [(pp,) for pp in parts]
    raise AssertionError(f"no inverse for {tf} at {our_path}")


def _run_roundtrip(tree, key_fn, convert_fn, special=None):
    rng = np.random.default_rng(0)
    src = {}
    order = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        if special and path[-1] in special:
            for k, shape in special[path[-1]](np.shape(node)).items():
                src[k] = rng.standard_normal(shape).astype(np.float32)
            return
        key, tf = key_fn(path)
        keys = key if isinstance(key, tuple) else (key,)
        shapes = _inv_shape(tf, np.shape(node), keys, path)
        for k, shp in zip(keys, shapes):
            assert k not in src, f"collision {k}"
            src[k] = rng.standard_normal(shp).astype(np.float32)

    walk(tree, ())
    out = convert_fn(tree, src)

    def check(node, conv, path):
        if isinstance(node, dict):
            for k in node:
                check(node[k], conv[k], path + (k,))
            return
        if special and path[-1] in special:
            return
        key, tf = key_fn(path)
        keys = key if isinstance(key, tuple) else (key,)
        np.testing.assert_allclose(np.asarray(conv),
                                   tf(*(src[k] for k in keys)), rtol=1e-6)

    check(tree, out, ())
    return src, out


def test_mmdit_roundtrip():
    m = MMDiT(TINY_MMDIT)
    c = TINY_MMDIT
    tree = m.init(jax.random.key(0),
                  jnp.zeros((1, 8, 8, c.in_channels), jnp.float32),
                  jnp.zeros((1,), jnp.float32),
                  jnp.zeros((1, 5, c.context_dim), jnp.float32),
                  jnp.zeros((1, c.pooled_dim), jnp.float32))
    last = c.depth - 1
    mh = c.max_hw

    special = {"pos_emb": lambda shape: {
        "pos_embed.pos_embed": (1, mh * mh, c.dim)}}

    def key_fn(path):
        p = [q for q in path if q != "params"]
        return _mmdit_key(path, last)

    src, out = _run_roundtrip(tree, key_fn, convert_mmdit, special)
    # pos grid reshaped (1, max², D) → (max, max, D)
    np.testing.assert_allclose(
        out["params"]["pos_emb"],
        src["pos_embed.pos_embed"][0].reshape(mh, mh, c.dim), rtol=1e-6)
    # the LAST block's context norm is the 2-chunk Continuous variant with
    # swapped halves; earlier blocks are the 6-chunk Zero variant
    k0, tf0 = _mmdit_key(("params", "block_0", "txt_mod", "kernel"), last)
    assert k0 == "transformer_blocks.0.norm1_context.linear.weight"
    assert tf0 is t_linear
    _, tfl = _mmdit_key(("params", f"block_{last}", "txt_mod", "kernel"), last)
    assert tfl is t_swap_halves_lin
    assert tree["params"][f"block_{last}"]["txt_mod"]["kernel"].shape[-1] \
        == 2 * c.dim
    assert tree["params"]["block_0"]["txt_mod"]["kernel"].shape[-1] \
        == 6 * c.dim
    # converted params actually run
    o = m.apply(out, jnp.ones((1, 8, 8, c.in_channels), jnp.float32),
                jnp.full((1,), 500.0),
                jnp.ones((1, 5, c.context_dim), jnp.float32),
                jnp.ones((1, c.pooled_dim), jnp.float32))
    assert o.shape == (1, 8, 8, c.out_channels)


def test_mmdit_qk_norm_gate():
    """SD3-medium (UltraEdit base) has NO qk norm → no *_qn params."""
    m = MMDiT(TINY_MMDIT)
    tree = m.init(jax.random.key(0),
                  jnp.zeros((1, 8, 8, TINY_MMDIT.in_channels), jnp.float32),
                  jnp.zeros((1,), jnp.float32),
                  jnp.zeros((1, 5, TINY_MMDIT.context_dim), jnp.float32),
                  jnp.zeros((1, TINY_MMDIT.pooled_dim), jnp.float32))
    assert "img_qn" not in tree["params"]["block_0"]
    import dataclasses
    m2 = MMDiT(dataclasses.replace(TINY_MMDIT, qk_norm=True))
    tree2 = m2.init(jax.random.key(0),
                    jnp.zeros((1, 8, 8, TINY_MMDIT.in_channels), jnp.float32),
                    jnp.zeros((1,), jnp.float32),
                    jnp.zeros((1, 5, TINY_MMDIT.context_dim), jnp.float32),
                    jnp.zeros((1, TINY_MMDIT.pooled_dim), jnp.float32))
    assert "img_qn" in tree2["params"]["block_0"]


def test_flux_roundtrip():
    c = TINY_FLUX
    m = Flux(c)
    tree = m.init(jax.random.key(0),
                  jnp.zeros((1, 8, 8, c.in_channels), jnp.float32),
                  jnp.zeros((1,), jnp.float32),
                  jnp.zeros((1, 5, c.context_dim), jnp.float32),
                  jnp.zeros((1, c.pooled_dim), jnp.float32))
    src, out = _run_roundtrip(tree, lambda p: _flux_key(p), convert_flux)
    # fused img qkv = concat of the three separate diffusers projections
    d = c.dim
    w = np.asarray(out["params"]["double_0"]["img_qkv"]["kernel"])
    np.testing.assert_allclose(
        w[:, :d], src["transformer_blocks.0.attn.to_q.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        w[:, 2 * d:], src["transformer_blocks.0.attn.to_v.weight"].T,
        rtol=1e-6)
    # single-block linear1 = [q|k|v|mlp]
    w1 = np.asarray(out["params"]["single_0"]["linear1"]["kernel"])
    np.testing.assert_allclose(
        w1[:, 3 * d:],
        src["single_transformer_blocks.0.proj_mlp.weight"].T, rtol=1e-6)
    o = m.apply(out, jnp.ones((1, 8, 8, c.in_channels), jnp.float32),
                jnp.full((1,), 500.0),
                jnp.ones((1, 5, c.context_dim), jnp.float32),
                jnp.ones((1, c.pooled_dim), jnp.float32))
    assert o.shape == (1, 8, 8, c.in_channels)


def test_bootstrap_registry_has_sd3_flux():
    from anyedit_tpu.weights.bootstrap import REGISTRY
    assert "mmdit_ultraedit" in REGISTRY
    assert "flux" in REGISTRY


def test_ip_adapter_converters():
    """image_proj/ip_adapter groups (h94/IP-Adapter naming) land exactly;
    site index i → ModuleList slot 2i+1 (self-attns hold no params)."""
    import dataclasses
    from anyedit_tpu.models.ip_adapter import (
        ImageProjection, IPAdapterWeights, Resampler, cross_attn_sites)
    from anyedit_tpu.models.unet_sd import TINY_UNET
    from anyedit_tpu.weights.convert import (
        convert_image_projection, convert_ip_adapter_weights,
        convert_resampler)

    rng = np.random.default_rng(0)
    # plain projection
    proj = ImageProjection(num_tokens=2, context_dim=8)
    tree = proj.init(jax.random.key(0), jnp.zeros((1, 16)))
    src = {"image_proj": {
        "proj.weight": rng.standard_normal((16, 16)).astype(np.float32),
        "proj.bias": np.zeros(16, np.float32),
        "norm.weight": np.ones(8, np.float32),
        "norm.bias": np.zeros(8, np.float32)}}
    out = convert_image_projection(tree, src)
    np.testing.assert_allclose(out["params"]["proj"]["kernel"],
                               src["image_proj"]["proj.weight"].T)

    # per-site K/V against the odd-index layout
    names, dims = cross_attn_sites(TINY_UNET)
    ipw = IPAdapterWeights(names, dims, TINY_UNET.context_dim)
    tok = jnp.zeros((1, 2, TINY_UNET.context_dim))
    tree = ipw.init(jax.random.key(0), tok)
    src = {"ip_adapter": {}}
    for i, (nm, dim) in enumerate(zip(names, dims)):
        for kv in ("k", "v"):
            src["ip_adapter"][f"{2 * i + 1}.to_{kv}_ip.weight"] = \
                rng.standard_normal(
                    (dim, TINY_UNET.context_dim)).astype(np.float32)
    out = convert_ip_adapter_weights(tree, src, names)
    safe0 = names[0].replace(".", "__")
    np.testing.assert_allclose(
        out["params"][f"{safe0}_k"]["kernel"],
        src["ip_adapter"]["1.to_k_ip.weight"].T)

    # resampler (Plus): separate norms + fused to_kv, bias-free
    rs = Resampler(num_latents=3, dim=8, depth=2, heads=2, out_dim=8)
    tree = rs.init(jax.random.key(0), jnp.zeros((1, 5, 12)))
    src = {"image_proj.latents":
               rng.standard_normal((1, 3, 8)).astype(np.float32),
           "image_proj.proj_in.weight":
               rng.standard_normal((8, 12)).astype(np.float32),
           "image_proj.proj_in.bias": np.zeros(8, np.float32),
           "image_proj.proj_out.weight":
               rng.standard_normal((8, 8)).astype(np.float32),
           "image_proj.proj_out.bias": np.zeros(8, np.float32),
           "image_proj.norm_out.weight": np.ones(8, np.float32),
           "image_proj.norm_out.bias": np.zeros(8, np.float32)}
    for i in range(2):
        b = f"image_proj.layers.{i}"
        src |= {f"{b}.0.norm1.weight": np.ones(8, np.float32),
                f"{b}.0.norm1.bias": np.zeros(8, np.float32),
                f"{b}.0.norm2.weight": np.ones(8, np.float32),
                f"{b}.0.norm2.bias": np.zeros(8, np.float32),
                f"{b}.0.to_q.weight":
                    rng.standard_normal((8, 8)).astype(np.float32),
                f"{b}.0.to_kv.weight":
                    rng.standard_normal((16, 8)).astype(np.float32),
                f"{b}.0.to_out.weight":
                    rng.standard_normal((8, 8)).astype(np.float32),
                f"{b}.1.0.weight": np.ones(8, np.float32),
                f"{b}.1.0.bias": np.zeros(8, np.float32),
                f"{b}.1.1.weight":
                    rng.standard_normal((32, 8)).astype(np.float32),
                f"{b}.1.3.weight":
                    rng.standard_normal((8, 32)).astype(np.float32)}
    out = convert_resampler(tree, src)
    np.testing.assert_allclose(out["params"]["latents"],
                               src["image_proj.latents"][0])
    np.testing.assert_allclose(out["params"]["kv_0"]["kernel"],
                               src["image_proj.layers.0.0.to_kv.weight"].T)
    o = rs.apply(out, jnp.ones((1, 5, 12)))
    assert o.shape == (1, 3, 8)
