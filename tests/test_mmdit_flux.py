import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.models.mmdit import MMDiT, TINY_MMDIT, SD3_MEDIUM, MMDiTConfig
from anyedit_tpu.models.flux import (
    Flux, TINY_FLUX, FLUX_SCHNELL, make_ids, rope_freqs, apply_rope,
)
from anyedit_tpu.diffusion.ultraedit import ultraedit_edit, flux_pair


F32 = lambda c: dataclasses.replace(c, dtype=jnp.float32)


def test_mmdit_forward():
    cfg = F32(TINY_MMDIT)
    m = MMDiT(cfg)
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 8, 8, cfg.in_channels))
    t = jnp.array([100.0, 500.0])
    ctx = jax.random.normal(key, (2, 6, cfg.context_dim))
    pooled = jax.random.normal(key, (2, cfg.pooled_dim))
    p = m.init(key, x, t, ctx, pooled)
    out = m.apply(p, x, t, ctx, pooled)
    assert out.shape == (2, 8, 8, cfg.out_channels)
    assert bool(jnp.all(jnp.isfinite(out)))
    # adaLN-Zero invariant: zero-init gates → conditioning inert at init
    out_init2 = m.apply(p, x, t, ctx * 2, pooled)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_init2))
    # perturb the zero-init modulation weights → conditioning becomes live
    p2 = jax.tree.map(lambda a: a + 0.01, p)
    o1 = m.apply(p2, x, t, ctx, pooled)
    o2 = m.apply(p2, x, t, ctx * 2, pooled)
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-6
    o3 = m.apply(p2, x, t * 0, ctx, pooled)
    assert float(jnp.max(jnp.abs(o1 - o3))) > 1e-6  # timestep live too


def test_sd3_medium_param_count():
    m = MMDiT(SD3_MEDIUM)
    x = jax.ShapeDtypeStruct((1, 16, 16, 16), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((1, 77, 4096), jnp.float32)
    pooled = jax.ShapeDtypeStruct((1, 2048), jnp.float32)
    shapes = jax.eval_shape(m.init, jax.random.key(0), x, t, ctx, pooled)
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 1.8e9 < n < 2.6e9, n  # SD3-medium MMDiT ≈ 2.0B


def test_rope_properties():
    ids = make_ids(2, 3, 4)
    assert ids.shape == (4 + 6, 3)
    assert float(jnp.max(jnp.abs(ids[:4]))) == 0.0  # text ids are zero
    cos, sin = rope_freqs(ids, (4, 6, 6))
    assert cos.shape == (10, 8)
    q = jax.random.normal(jax.random.key(1), (1, 2, 10, 16))
    qr = apply_rope(q, cos, sin)
    # rotation preserves per-pair norms
    n0 = jnp.linalg.norm(q.reshape(1, 2, 10, 8, 2), axis=-1)
    n1 = jnp.linalg.norm(qr.reshape(1, 2, 10, 8, 2), axis=-1)
    np.testing.assert_allclose(np.asarray(n0), np.asarray(n1), atol=1e-5)
    # text tokens (id 0) are unrotated
    np.testing.assert_allclose(np.asarray(qr[:, :, :4]), np.asarray(q[:, :, :4]),
                               atol=1e-6)


def test_flux_forward():
    cfg = F32(TINY_FLUX)
    m = Flux(cfg)
    key = jax.random.key(2)
    x = jax.random.normal(key, (1, 8, 8, cfg.in_channels))
    t = jnp.array([500.0])
    ctx = jax.random.normal(key, (1, 5, cfg.context_dim))
    pooled = jax.random.normal(key, (1, cfg.pooled_dim))
    p = m.init(key, x, t, ctx, pooled)
    out = m.apply(p, x, t, ctx, pooled)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_flux_schnell_param_count():
    m = Flux(FLUX_SCHNELL)
    x = jax.ShapeDtypeStruct((1, 16, 16, 16), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((1, 64, 4096), jnp.float32)
    pooled = jax.ShapeDtypeStruct((1, 768), jnp.float32)
    shapes = jax.eval_shape(m.init, jax.random.key(0), x, t, ctx, pooled)
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 10e9 < n < 13e9, n  # Flux ≈ 11.9B


def test_ultraedit_mask_semantics():
    """Oracle velocity: with v = eps - x0_target, the loop lands on the
    target inside the mask and stays on the original outside."""
    key = jax.random.key(3)
    orig = 0.3 * jax.random.normal(key, (1, 8, 8, 4))
    target = -orig
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)

    def v_fn(x_in, t, ctx, pooled):
        lat = x_in[..., :4]
        b3 = lat.shape[0]
        # recover the true eps from current (lat, sigma): lat = (1-s)x0+s·eps
        # the oracle returns v = eps - x0 for x0 = target
        s = (t[0] / 1000.0)
        tgt = jnp.concatenate([target] * 3, axis=0)[:b3]
        eps = (lat - (1.0 - s) * tgt) / jnp.maximum(s, 1e-6)
        return eps - tgt

    ctx = jnp.zeros((1, 4, 8))
    pooled = jnp.zeros((1, 8))
    out = ultraedit_edit(v_fn, orig, ctx, pooled, ctx, pooled, key,
                         num_steps=25, mask=mask)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), np.asarray(orig[:, 4:]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(target[:, :4]),
                               atol=0.15)


def test_flux_pair_shares_seed():
    def v_fn(x, t, ctx, pooled):
        # velocity pulls toward a ctx-dependent target
        tgt = jnp.mean(ctx) * jnp.ones_like(x)
        s = jnp.maximum(t[0] / 1000.0, 1e-6)
        eps = (x - (1 - s) * tgt) / s
        return eps - tgt

    ctx_a = jnp.ones((1, 4, 8))
    ctx_b = -jnp.ones((1, 4, 8))
    pooled = jnp.zeros((1, 8))
    a, b = flux_pair(v_fn, (1, 8, 8, 4), ctx_a, pooled, ctx_b, pooled,
                     seed=7, num_steps=8)
    a2, _ = flux_pair(v_fn, (1, 8, 8, 4), ctx_a, pooled, ctx_b, pooled,
                      seed=7, num_steps=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a2))  # deterministic
    assert float(jnp.max(jnp.abs(a - b))) > 0.5  # prompts differ
    np.testing.assert_allclose(np.asarray(a), 1.0, atol=0.05)
    np.testing.assert_allclose(np.asarray(b), -1.0, atol=0.05)
