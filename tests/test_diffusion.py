"""Pipeline semantics with oracle eps functions (no weights needed)."""

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.schedulers import make_noise_schedule, add_noise
from anyedit_tpu.diffusion import (
    ip2p_edit, predict_edit_mask, noise_diff_heatmap,
    sample_text2img, sample_inpaint,
)


NS = make_noise_schedule()


def _oracle_eps(target):
    """eps_fn recovering `target` regardless of conditioning; ignores extra
    conditioning channels beyond the first 4."""
    def eps_fn(x, t, ctx):
        lat = x[..., :4]
        acp = NS.alphas_cumprod[t].reshape((-1, 1, 1, 1))
        return (lat - jnp.sqrt(acp) * target[:lat.shape[0] // target.shape[0] * target.shape[0]].repeat(lat.shape[0] // target.shape[0], axis=0)) / jnp.sqrt(1 - acp)
    return eps_fn


def test_ip2p_unmasked_region_is_faithful():
    key = jax.random.key(0)
    orig = jax.random.normal(key, (1, 8, 8, 4))
    target = -orig  # the "edited" content the model pulls toward

    def eps_fn(x, t, ctx):
        lat = x[..., :4]
        acp = NS.alphas_cumprod[t].reshape((-1, 1, 1, 1))
        tgt = jnp.concatenate([target] * (lat.shape[0] // 1), axis=0)
        return (lat - jnp.sqrt(acp) * tgt) / jnp.sqrt(1 - acp)

    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)  # top half editable
    ctx = jnp.zeros((1, 4, 16))
    out = ip2p_edit(eps_fn, NS, orig, ctx, ctx, key, num_steps=20, mask=mask)
    # bottom half (mask=0) must equal the original latents
    np.testing.assert_allclose(np.asarray(out[:, 4:]), np.asarray(orig[:, 4:]),
                               atol=1e-4)
    # top half must have moved toward the target
    d_target = float(jnp.mean(jnp.abs(out[:, :4] - target[:, :4])))
    d_orig = float(jnp.mean(jnp.abs(out[:, :4] - orig[:, :4])))
    assert d_target < d_orig


def test_ip2p_global_edit_reaches_target():
    key = jax.random.key(1)
    orig = 0.3 * jax.random.normal(key, (1, 8, 8, 4))
    target = 0.7 * jax.random.normal(jax.random.fold_in(key, 5), orig.shape)

    def eps_fn(x, t, ctx):
        lat = x[..., :4]
        acp = NS.alphas_cumprod[t].reshape((-1, 1, 1, 1))
        tgt = jnp.concatenate([target] * (lat.shape[0]), axis=0)[:lat.shape[0]]
        return (lat - jnp.sqrt(acp) * tgt) / jnp.sqrt(1 - acp)

    ctx = jnp.zeros((1, 4, 16))
    # with scales summing so that total guidance reproduces the oracle:
    # e_full == e_img == e_unc → eps == oracle for any scales.
    out = ip2p_edit(eps_fn, NS, orig, ctx, ctx, key, num_steps=20,
                    guidance_scale=8.0, image_guidance_scale=0.9)
    # SD timestep grid ends at t=1 (steps_offset=1, set_alpha_to_one=False):
    # the output sits at the acp[0] level of target, i.e. within a
    # sqrt(1-acp0) eps residual whose implied noise must be ~unit-normal.
    acp0 = float(NS.alphas_cumprod[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                               atol=5 * (1 - acp0) ** 0.5)
    resid = (np.asarray(out) - acp0 ** 0.5 * np.asarray(target)) / (1 - acp0) ** 0.5
    assert 0.5 < resid.std() < 1.5, resid.std()


def test_ip2p_jits_under_fori():
    key = jax.random.key(2)
    orig = jax.random.normal(key, (2, 8, 8, 4))
    ctx = jnp.zeros((2, 4, 16))

    def eps_fn(x, t, c):
        return 0.05 * x[..., :4]

    f = jax.jit(lambda o, k: ip2p_edit(eps_fn, NS, o, ctx, ctx, k, num_steps=10))
    out = f(orig, key)
    assert out.shape == orig.shape and bool(jnp.all(jnp.isfinite(out)))


def test_noise_diff_mask_localizes():
    key = jax.random.key(3)
    orig = jax.random.normal(key, (1, 8, 8, 4))

    def eps_fn(x, t, ctx):
        lat = x[..., :4]
        b = lat.shape[0] // 2
        # text branch (first half) disagrees with image branch in top-left 4x4
        bump = jnp.zeros_like(lat).at[:, :4, :4, :].set(2.0)
        out_text = 0.1 * lat[:b] + bump[:b]
        out_img = 0.1 * lat[b:]
        return jnp.concatenate([out_text, out_img], axis=0)

    heat = noise_diff_heatmap(eps_fn, NS, orig, jnp.zeros((1, 4, 16)),
                              jnp.zeros((1, 4, 16)), key)
    mask = predict_edit_mask(heat, threshold=0.5, sharpness=50.0)
    inside = float(jnp.mean(mask[0, :4, :4, 0]))
    outside = float(jnp.mean(mask[0, 4:, 4:, 0]))
    assert inside > 0.9 and outside < 0.1


def test_text2img_oracle():
    key = jax.random.key(4)
    target = 0.4 * jax.random.normal(key, (1, 8, 8, 4))

    def eps_fn(x, t, ctx):
        acp = NS.alphas_cumprod[t].reshape((-1, 1, 1, 1))
        tgt = jnp.concatenate([target, target], axis=0)[:x.shape[0]]
        return (x - jnp.sqrt(acp) * tgt) / jnp.sqrt(1 - acp)

    ctx = jnp.zeros((1, 4, 16))
    out = sample_text2img(eps_fn, NS, (1, 8, 8, 4), ctx, ctx, key, num_steps=20)
    # final state keeps the acp[0] noise floor (steps_offset=1 grid)
    acp0 = float(NS.alphas_cumprod[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                               atol=5 * (1 - acp0) ** 0.5)
    resid = (np.asarray(out) - acp0 ** 0.5 * np.asarray(target)) / (1 - acp0) ** 0.5
    assert 0.5 < resid.std() < 1.5, resid.std()


def test_inpaint_keeps_unmasked():
    key = jax.random.key(5)
    orig = 0.5 * jax.random.normal(key, (1, 8, 8, 4))
    mask = jnp.zeros((1, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)

    def eps_fn(x, t, ctx):  # model pulls toward zeros in repaint region
        lat = x[..., :4]
        acp = NS.alphas_cumprod[t].reshape((-1, 1, 1, 1))
        return lat / jnp.sqrt(1 - acp) * 0 + (lat - 0) / jnp.sqrt(1 - acp)

    out = sample_inpaint(eps_fn, NS, orig, mask, jnp.zeros((1, 4, 16)),
                         jnp.zeros((1, 4, 16)), key, num_steps=20)
    np.testing.assert_allclose(np.asarray(out * (1 - mask)),
                               np.asarray(orig * (1 - mask)), atol=1e-4)
    # repaint region pulled toward 0 (the oracle's target)
    assert float(jnp.mean(jnp.abs(out[:, 2:6, 2:6]))) < \
        float(jnp.mean(jnp.abs(orig[:, 2:6, 2:6])))
