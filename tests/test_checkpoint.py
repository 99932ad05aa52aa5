import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.train.anysd import AnySDTrainer, TINY_ANYSD
from anyedit_tpu.train.checkpoint import TrainCheckpointer


def test_save_rotate_resume(tmp_path):
    cfg = dataclasses.replace(
        TINY_ANYSD, unet=dataclasses.replace(TINY_ANYSD.unet,
                                             dtype=jnp.float32, in_channels=8))
    tr = AnySDTrainer(cfg)
    key = jax.random.key(0)
    unet_p, ad_p, opt = tr.init(key, latent_hw=8, text_len=7)

    ck = TrainCheckpointer(tmp_path / "ckpt", keep=2, save_interval_steps=1)
    for step in (1, 2, 3):
        scaled = jax.tree.map(lambda x: x + float(step), ad_p)
        assert ck.save(step, scaled, opt)
    ck.wait()
    # rotation: only the last `keep` steps remain
    assert ck.mgr.all_steps() == [2, 3]

    step, ad_r, opt_r = ck.restore_latest(
        jax.tree.map(np.asarray, ad_p), jax.tree.map(np.asarray, opt))
    assert step == 3
    a0 = jax.tree.leaves(ad_p)[0]
    r0 = jax.tree.leaves(ad_r)[0]
    np.testing.assert_allclose(np.asarray(r0), np.asarray(a0) + 3.0, atol=1e-6)

    # restored state slots directly back into a train step
    batch = {
        "edited_latents": jnp.zeros((2, 8, 8, 4)),
        "orig_latents": jnp.zeros((2, 8, 8, 4)),
        "text_emb": jnp.zeros((2, 7, cfg.unet.context_dim)),
        "image_embed": jnp.zeros((2, cfg.image_embed_dim)),
        "task_id": jnp.array([0, 1]),
    }
    ad2, opt2, loss = jax.jit(tr.train_step)(ad_r, opt_r, unet_p, batch, key)
    assert np.isfinite(float(loss))
    ck.close()


def test_restore_empty(tmp_path):
    ck = TrainCheckpointer(tmp_path / "empty")
    step, a, o = ck.restore_latest(None, None)
    assert step is None and a is None and o is None
    ck.close()
