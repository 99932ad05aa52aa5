import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.train.anysd import (
    AnySDTrainer, TINY_ANYSD, expert_id, EXPERT_NAMES, TASK_EMB_BOOKS, shard_tree,
)
from anyedit_tpu.core.mesh import make_mesh, MeshSpec


def _tiny_trainer():
    cfg = dataclasses.replace(
        TINY_ANYSD, unet=dataclasses.replace(TINY_ANYSD.unet, dtype=jnp.float32,
                                             in_channels=8))
    return AnySDTrainer(cfg)


def _batch(cfg, b=4):
    key = jax.random.key(0)
    return {
        "edited_latents": jax.random.normal(key, (b, 8, 8, 4)),
        "orig_latents": jax.random.normal(jax.random.fold_in(key, 1), (b, 8, 8, 4)),
        "text_emb": jax.random.normal(jax.random.fold_in(key, 2),
                                      (b, 7, cfg.unet.context_dim)),
        "image_embed": jax.random.normal(jax.random.fold_in(key, 3),
                                         (b, cfg.image_embed_dim)),
        "task_id": jnp.array([0, 1, 2, 3] * (b // 4)),
    }


def test_expert_book_covers_all_types():
    from anyedit_tpu.core.schema import EDIT_TYPES
    assert len(EXPERT_NAMES) == 11
    for t in EDIT_TYPES:
        assert 0 <= expert_id(t) < 11
    booked = {t for ts in TASK_EMB_BOOKS.values() for t in ts}
    assert "remove" in booked and "visual_reference" in booked


def test_train_step_descends():
    tr = _tiny_trainer()
    key = jax.random.key(1)
    unet_p, ad_p, opt = tr.init(key, latent_hw=8, text_len=7)
    batch = _batch(tr.cfg)
    losses = []
    for i in range(4):
        ad_p, opt, loss = jax.jit(tr.train_step)(ad_p, opt, unet_p, batch,
                                                 jax.random.key(42))  # fixed key
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # same batch+noise → loss must drop
    assert np.isfinite(losses).all()


def test_only_adapter_trains():
    tr = _tiny_trainer()
    key = jax.random.key(2)
    unet_p, ad_p, opt = tr.init(key, latent_hw=8, text_len=7)
    batch = _batch(tr.cfg)
    before = jax.tree.map(lambda x: x.copy(), unet_p)
    ad_p2, _, _ = jax.jit(tr.train_step)(ad_p, opt, unet_p, batch, key)
    # unet untouched; adapter changed
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(unet_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    diffs = [float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(jax.tree.leaves(ad_p), jax.tree.leaves(ad_p2))]
    assert max(diffs) > 0


def test_sharded_train_step(mesh8):
    tr = _tiny_trainer()
    key = jax.random.key(3)
    unet_p, ad_p, opt = tr.init(key, latent_hw=8, text_len=7)
    ad_spec, unet_spec, data_sh = tr.shardings(mesh8)
    ad_p = shard_tree(ad_p, ad_spec)
    unet_p = shard_tree(unet_p, unet_spec)
    opt = tr.tx.init(ad_p)
    batch = jax.tree.map(lambda x: jax.device_put(x, data_sh), _batch(tr.cfg, b=8))
    step = jax.jit(tr.train_step)
    ad_p2, opt2, loss = step(ad_p, opt, unet_p, batch, key)
    assert np.isfinite(float(loss))
    # expert tensor sharding survived the step
    w1 = ad_p2["params"]["expert_w1"]
    assert "ep" in str(w1.sharding.spec)
