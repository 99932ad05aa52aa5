"""LCM consistency distillation of the IP2P editor (train/distill.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyedit_tpu.schedulers import make_noise_schedule
from anyedit_tpu.train.distill import (
    TINY_DISTILL, DistillConfig, LCMDistiller, boundary_scalings, lcm_edit,
)


def _tiny_batch(key, b=2, hw=8, ctx_len=4):
    from anyedit_tpu.models.unet_sd import TINY_UNET
    ks = jax.random.split(key, 4)
    d = TINY_UNET.context_dim
    return {
        "edited_latents": jax.random.normal(ks[0], (b, hw, hw, 4)) * 0.3,
        "orig_latents": jax.random.normal(ks[1], (b, hw, hw, 4)) * 0.3,
        "text_emb": jax.random.normal(ks[2], (b, ctx_len, d)),
        "uncond_emb": jnp.zeros((b, ctx_len, d)),
    }


@pytest.fixture(scope="module")
def distiller():
    d = LCMDistiller(TINY_DISTILL)
    teacher = d.unet.init(jax.random.key(0),
                          jnp.zeros((1, 8, 8, 8)), jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 4, TINY_DISTILL.unet.context_dim)))
    return d, teacher


def test_boundary_condition_at_t0():
    """f(x, 0) must equal x exactly — the consistency anchor (LCM §4.1)."""
    c_skip, c_out = boundary_scalings(TINY_DISTILL, jnp.zeros((3,), jnp.int32))
    np.testing.assert_allclose(np.asarray(c_skip), 1.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(c_out), 0.0, atol=1e-7)
    # and decays monotonically toward pure x0-prediction at high noise
    hi, ho = boundary_scalings(TINY_DISTILL, jnp.asarray([999]))
    assert float(hi[0]) < 0.01 and float(ho[0]) > 0.99


def test_distill_step_runs_and_updates(distiller):
    d, teacher = distiller
    student, ema, opt = d.init(teacher)
    batch = _tiny_batch(jax.random.key(1))
    step = jax.jit(d.distill_step)
    s1, e1, o1, loss1 = step(student, ema, opt, teacher, batch,
                             jax.random.key(2))
    assert jnp.isfinite(loss1), loss1
    # the student must have moved off the teacher initialization
    diff = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()),
        jax.tree_util.tree_map(jnp.subtract, s1, student), 0.0)
    assert diff > 0.0
    # EMA stays between the old target and the new student (decay 0.95)
    s2, e2, o2, loss2 = step(s1, e1, o1, teacher, batch, jax.random.key(3))
    assert jnp.isfinite(loss2)


def test_grad_flows_only_into_student(distiller):
    """EMA target and teacher are constants of the update (stop-grad)."""
    d, teacher = distiller
    student, ema, _ = d.init(teacher)
    batch = _tiny_batch(jax.random.key(4))
    g_ema = jax.grad(lambda e: d.loss_fn(student, e, teacher, batch,
                                         jax.random.key(5)))(ema)
    total = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()), g_ema, 0.0)
    assert total == 0.0


def test_lcm_edit_shapes_and_finiteness(distiller):
    d, teacher = distiller
    student, _, _ = d.init(teacher)
    ns = make_noise_schedule()
    img = jax.random.normal(jax.random.key(6), (1, 8, 8, 4)) * 0.3
    ctx = jax.random.normal(jax.random.key(7),
                            (1, 4, TINY_DISTILL.unet.context_dim))
    out = lcm_edit(d.unet.apply, student, ns, TINY_DISTILL, img, ctx,
                   jax.random.key(8), num_steps=4)
    assert out.shape == img.shape
    assert bool(jnp.isfinite(out).all())


def test_distill_step_shards_on_mesh(distiller, mesh8):
    """dp-batched distillation on the virtual 8-device mesh (2×2×2)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    d, teacher = distiller
    student, ema, opt = d.init(teacher)
    batch = _tiny_batch(jax.random.key(9), b=4)
    dp = NamedSharding(mesh8, P("dp"))
    batch = {k: jax.device_put(v, dp) for k, v in batch.items()}
    s1, e1, o1, loss = jax.jit(d.distill_step)(student, ema, opt, teacher,
                                               batch, jax.random.key(10))
    assert jnp.isfinite(loss)
