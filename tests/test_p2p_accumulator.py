"""VERDICT r1 weak #6: the p2p_pair builder accumulates AttentionStore
cross-attn maps INSIDE a traced fori_loop, relying on a pre-trace to fix
the accumulator shape. Validate numerically that the fused-loop
accumulation equals a step-by-step python loop of the same program."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.diffusion.processors import AttentionStore
from anyedit_tpu.models.unet_sd import UNet2DCondition, TINY_UNET
from anyedit_tpu.schedulers import make_noise_schedule, ddim_init, ddim_step


def _setup():
    cfg = dataclasses.replace(TINY_UNET, dtype=jnp.float32)
    unet = UNet2DCondition(cfg)
    key = jax.random.key(0)
    hw = 8
    x = jnp.zeros((2, hw, hw, cfg.in_channels))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jax.random.normal(key, (2, 5, cfg.context_dim))
    params = unet.init(key, x, t, ctx)
    return cfg, unet, params, ctx, hw


def test_fused_accumulation_matches_stepwise():
    cfg, unet, params, ctx, hw = _setup()
    ns = make_noise_schedule()
    steps = 3
    st = ddim_init(ns, steps)
    store = AttentionStore(max_hw=hw * hw)
    z0 = jax.random.normal(jax.random.key(1), (2, hw, hw, cfg.in_channels))

    def one_step(lat, i):
        store.reset()
        eps = unet.apply(params, lat, jnp.full((2,), st.timesteps[i]), ctx,
                         processor=store.processor())
        maps = store.collect()
        best = max(maps, key=lambda n: maps[n].shape[1])
        return ddim_step(ns, st, i, eps, lat), maps[best]

    # fused loop with in-trace accumulation (the p2p_pair pattern)
    def fused(z0):
        store.reset()
        _ = unet.apply(params, z0, jnp.zeros((2,), jnp.int32), ctx,
                       processor=store.processor())
        maps = store.collect()
        best = max(maps, key=lambda n: maps[n].shape[1])
        acc0 = jnp.zeros_like(maps[best])

        def body(i, carry):
            lat, acc = carry
            lat, m = one_step(lat, i)
            return lat, acc + m
        return jax.lax.fori_loop(0, steps, body, (z0, acc0))

    lat_f, acc_f = jax.jit(fused)(z0)

    # step-by-step python loop (each step its own trace)
    lat = z0
    acc = None
    for i in range(steps):
        lat, m = jax.jit(one_step)(lat, jnp.asarray(i))
        acc = m if acc is None else acc + m
    np.testing.assert_allclose(np.asarray(acc_f), np.asarray(acc),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lat_f), np.asarray(lat),
                               rtol=2e-4, atol=2e-5)
    # the store actually captured cross-attention (not a zero accumulator)
    assert float(jnp.abs(acc_f).sum()) > 0
    # maps are probability rows over text tokens
    np.testing.assert_allclose(np.asarray(acc_f.sum(-1)),
                               np.full(acc_f.shape[:-1], float(steps)),
                               atol=1e-3)
