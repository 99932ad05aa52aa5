import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.diffusion.processors import (
    masactrl_processor, AttentionStore, mask_from_ca, alignment_matrix,
    p2p_replace_processor,
)
from anyedit_tpu.models.unet_sd import UNet2DCondition, TINY_UNET
from anyedit_tpu.models.layers import AttnMeta
from anyedit_tpu.edits.action_change import consistent_synthesis
from anyedit_tpu.schedulers import make_noise_schedule


CFG = dataclasses.replace(TINY_UNET, dtype=jnp.float32)
META_SELF = AttnMeta("x.self", True, 2, 4)
META_CROSS = AttnMeta("x.cross", False, 2, 4)


def _qkv(key, b=2, h=2, l=8, d=4):
    ks = jax.random.split(key, 3)
    return (jax.random.normal(ks[0], (b, h, l, d)),
            jax.random.normal(ks[1], (b, h, l, d)),
            jax.random.normal(ks[2], (b, h, l, d)))


def test_masactrl_swaps_target_kv():
    q, k, v = _qkv(jax.random.key(0))
    proc = masactrl_processor(start_step=0, start_layer=0)
    out = proc(q, k, v, META_SELF, {"step": jnp.asarray(5)})
    from anyedit_tpu.ops.attention import sdpa_xla
    # row 1 (target) must equal attention of q1 against k0/v0
    expect = sdpa_xla(q[1:2], k[0:1], v[0:1])
    np.testing.assert_allclose(np.asarray(out[1:2]), np.asarray(expect), atol=1e-5)
    # row 0 (source) unchanged
    np.testing.assert_allclose(np.asarray(out[0:1]),
                               np.asarray(sdpa_xla(q[0:1], k[0:1], v[0:1])),
                               atol=1e-5)


def test_masactrl_respects_step_and_layer_gates():
    q, k, v = _qkv(jax.random.key(1))
    from anyedit_tpu.ops.attention import sdpa_xla
    default = sdpa_xla(q, k, v)
    # before start_step → default
    proc = masactrl_processor(start_step=10, start_layer=0)
    out = proc(q, k, v, META_SELF, {"step": jnp.asarray(3)})
    np.testing.assert_allclose(np.asarray(out), np.asarray(default), atol=1e-5)
    # layer counter below start_layer → default
    proc2 = masactrl_processor(start_step=0, start_layer=2)
    extra = {"step": jnp.asarray(5)}
    out2 = proc2(q, k, v, META_SELF, extra)       # site 0 < 2
    np.testing.assert_allclose(np.asarray(out2), np.asarray(default), atol=1e-5)
    out3 = proc2(q, k, v, META_SELF, extra)       # site 1 < 2
    out4 = proc2(q, k, v, META_SELF, extra)       # site 2 → active
    assert float(jnp.max(jnp.abs(out4[1] - default[1]))) > 1e-6
    # cross-attention never swapped
    out5 = proc(q, k, v, META_CROSS, {"step": jnp.asarray(99)})
    np.testing.assert_allclose(np.asarray(out5), np.asarray(default), atol=1e-5)


def test_attention_store_and_mask():
    store = AttentionStore()
    q, k, v = _qkv(jax.random.key(2), b=1, l=16)
    kc = jax.random.normal(jax.random.key(3), (1, 2, 6, 4))  # 6 text tokens
    vc = jax.random.normal(jax.random.key(4), (1, 2, 6, 4))
    store.processor()(q, kc, vc, META_CROSS, {})
    maps = store.collect()
    assert "x.cross" in maps and maps["x.cross"].shape == (1, 16, 6)
    # synthetic accumulated map: token 2 hot in the first 8 positions
    acc = jnp.zeros((1, 16, 6)).at[:, :8, 2].set(1.0)
    m = mask_from_ca(acc, token_idx=2, hw=4)
    assert m.shape == (1, 4, 4)
    assert bool(m[0, 0, 0]) and not bool(m[0, 3, 3])


def test_alignment_matrix():
    src = ["a", "cat", "on", "grass"]
    tgt = ["a", "dog", "on", "grass"]
    m = alignment_matrix(src, tgt)
    assert m.shape == (4, 4)
    assert m[0, 0] == 1 and m[2, 2] == 1 and m[3, 3] == 1
    assert m[1, 1] == 1  # unmatched token maps to same position (refine)


def test_p2p_replace_targets_only():
    q, k, v = _qkv(jax.random.key(5))
    mapper = np.eye(8, dtype=np.float32)
    proc = p2p_replace_processor(mapper, stop_step=10)
    from anyedit_tpu.ops.attention import sdpa_xla
    out_active = proc(q, k, v, META_CROSS, {"step": jnp.asarray(0)})
    out_done = proc(q, k, v, META_CROSS, {"step": jnp.asarray(20)})
    default = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_done), np.asarray(default), atol=1e-5)
    # identity mapper: target probs replaced by SOURCE probs → row1 changes
    assert float(jnp.max(jnp.abs(out_active[1] - default[1]))) > 1e-6
    np.testing.assert_allclose(np.asarray(out_active[0]), np.asarray(default[0]),
                               atol=1e-5)


def test_consistent_synthesis_end_to_end():
    ns = make_noise_schedule()
    model = UNet2DCondition(CFG)
    key = jax.random.key(6)
    x = jnp.zeros((4, 8, 8, 4))
    t = jnp.zeros((4,), jnp.int32)
    ctx = jnp.zeros((4, 4, CFG.context_dim))
    params = model.init(key, x, t, ctx)

    def unet_apply(x, t, c, proc, extra):
        return model.apply(params, x, t, c, processor=proc, extra=extra)

    src_ctx = jax.random.normal(key, (1, 4, CFG.context_dim))
    tgt_ctx = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, CFG.context_dim))
    un = jnp.zeros((1, 4, CFG.context_dim))
    out = consistent_synthesis(unet_apply, ns, src_ctx, tgt_ctx, un, key,
                               latent_hw=8, num_steps=4, start_step=1,
                               start_layer=0)
    assert out.shape == (2, 8, 8, 4)
    assert bool(jnp.all(jnp.isfinite(out)))
    # branches share the start latent but diverge by prompt
    assert float(jnp.max(jnp.abs(out[0] - out[1]))) > 1e-5
