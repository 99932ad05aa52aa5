import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.models.lama import LamaGenerator, TINY_LAMA, LAMA, pad_to_modulo


def test_lama_shapes_and_composite():
    model = LamaGenerator(TINY_LAMA)
    key = jax.random.key(0)
    img = jax.random.uniform(key, (1, 32, 32, 3))
    mask = jnp.zeros((1, 32, 32, 1)).at[:, 8:24, 8:24].set(1.0)
    params = model.init(key, img, mask)
    out = model.apply(params, img, mask)
    assert out.shape == img.shape
    # outside the mask the ORIGINAL pixels must be returned exactly
    np.testing.assert_allclose(np.asarray(out * (1 - mask)),
                               np.asarray(img * (1 - mask)), atol=1e-6)
    # inside the mask the output is the network's prediction in [0,1]
    inside = np.asarray(out[:, 8:24, 8:24])
    assert inside.min() >= 0.0 and inside.max() <= 1.0
    assert bool(jnp.all(jnp.isfinite(out)))


def test_lama_mask_independence():
    """The masked region's content must not leak into the prediction:
    changing pixels UNDER the mask must not change the output."""
    model = LamaGenerator(TINY_LAMA)
    key = jax.random.key(1)
    img = jax.random.uniform(key, (1, 32, 32, 3))
    mask = jnp.zeros((1, 32, 32, 1)).at[:, 4:12, 4:12].set(1.0)
    params = model.init(key, img, mask)
    img2 = img.at[:, 6:10, 6:10].set(0.0)  # alter hidden content only
    o1 = model.apply(params, img, mask)
    o2 = model.apply(params, img2, mask)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_pad_to_modulo():
    x = jnp.zeros((1, 30, 37, 3))
    padded, (h, w) = pad_to_modulo(x, 8)
    assert padded.shape == (1, 32, 40, 3)
    assert (h, w) == (30, 37)


def test_lama_param_count():
    model = LamaGenerator(LAMA)
    img = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    mask = jax.ShapeDtypeStruct((1, 64, 64, 1), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.key(0), img, mask)
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 2e7 < n < 4e7, n  # LaMa ≈ 27M
