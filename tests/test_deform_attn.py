import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.ops.deform_attn import ms_deform_attn, ms_deform_attn_ref


def _inputs(key, b=1, q=5, h=2, d=4, shapes=((6, 8), (3, 4))):
    s = sum(hh * ww for hh, ww in shapes)
    l = len(shapes)
    k = 3
    ks = jax.random.split(key, 3)
    value = jax.random.normal(ks[0], (b, s, h, d))
    locs = jax.random.uniform(ks[1], (b, q, h, l, k, 2), minval=0.05, maxval=0.95)
    w = jax.nn.softmax(jax.random.normal(ks[2], (b, q, h, l * k))).reshape(
        (b, q, h, l, k))
    return value, shapes, locs, w


def test_matches_reference():
    value, shapes, locs, w = _inputs(jax.random.key(0))
    fast = ms_deform_attn(value, shapes, locs, w)
    slow = ms_deform_attn_ref(value, shapes, locs, w)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=1e-5, rtol=1e-5)


def test_out_of_bounds_zero():
    value, shapes, locs, w = _inputs(jax.random.key(1))
    far = jnp.full_like(locs, 5.0)  # all samples far outside
    out = ms_deform_attn(value, shapes, far, w)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_exact_pixel_center():
    """Sampling exactly at a pixel center returns that pixel's value."""
    hh, ww, h, d = 4, 4, 1, 2
    value = jnp.arange(hh * ww * h * d, dtype=jnp.float32).reshape(1, hh * ww, h, d)
    # pixel (row 1, col 2): normalized center = ((2+0.5)/4, (1+0.5)/4)
    locs = jnp.array([(2 + 0.5) / ww, (1 + 0.5) / hh]).reshape(1, 1, 1, 1, 1, 2)
    w = jnp.ones((1, 1, 1, 1, 1))
    out = ms_deform_attn(value, ((hh, ww),), locs, w)
    expected = value[0, 1 * ww + 2, 0]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(expected), atol=1e-5)


def test_jit_and_batch():
    value, shapes, locs, w = _inputs(jax.random.key(2), b=3, q=16)
    f = jax.jit(lambda v, l, ww: ms_deform_attn(v, shapes, l, ww))
    out = f(value, locs, w)
    assert out.shape == (3, 16, 2 * 4)
    assert bool(jnp.all(jnp.isfinite(out)))
