import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from anyedit_tpu.core.config import CanvasConfig
from anyedit_tpu.models.gdino import TINY_GDINO
from anyedit_tpu.models.sam import TINY_SAM
from anyedit_tpu.models.lama import TINY_LAMA
from anyedit_tpu.models.unet_sd import TINY_UNET
from anyedit_tpu.models.vae import TINY_VAE
from anyedit_tpu.models.clip import TINY_TEXT
from anyedit_tpu.runtime.zoo import ModelZoo, ZooConfig
from anyedit_tpu.train.validation import image_grid, log_validation


@pytest.fixture(scope="module")
def zoo():
    cfg = ZooConfig(
        canvas=CanvasConfig(edit_size=32, grounding_size=32, sam_size=64,
                            latent_down=2),
        gdino=dataclasses.replace(TINY_GDINO, dtype=jnp.float32),
        sam=dataclasses.replace(TINY_SAM, dtype=jnp.float32),
        lama=TINY_LAMA,
        ip2p_unet=dataclasses.replace(TINY_UNET, in_channels=8,
                                      dtype=jnp.float32),
        vae=dataclasses.replace(TINY_VAE, dtype=jnp.float32),
        text=dataclasses.replace(TINY_TEXT, dtype=jnp.float32,
                                 vocab_size=30522, max_len=77),
    )
    return ModelZoo(cfg)


def test_anydoor_runner_smoke(zoo):
    run = zoo.anydoor()
    rng = np.random.default_rng(0)
    target = rng.integers(0, 255, (40, 48, 3), np.uint8)
    mask = np.zeros((40, 48), np.float32)
    mask[10:30, 10:30] = 1.0
    collage = rng.integers(0, 255, (40, 48, 3), np.uint8)
    hf = rng.random((40, 48)).astype(np.float32) * 255
    ref = rng.integers(0, 255, (32, 32, 3), np.uint8)
    out = run(target, mask, collage, hf, ref, steps=2)
    assert out.shape == target.shape and out.dtype == np.uint8
    # outside the mask, the target is untouched (crop_back paste)
    np.testing.assert_array_equal(out[0:5, 0:5], target[0:5, 0:5])


def test_image_grid_and_validation_log(tmp_path):
    imgs = [np.full((8, 8, 3), v, np.uint8) for v in (0, 64, 128, 192)]
    grid = image_grid(imgs, cols=2, pad=1)
    assert grid.shape == (17, 17, 3)
    path = log_validation(lambda im, ins: 255 - im,
                          [(imgs[0], "invert"), (imgs[1], "invert")],
                          tmp_path, step=7)
    assert path.name == "val_step_7.png" and path.exists()


def test_p2p_pair_runner(zoo):
    run = zoo.p2p_pair()
    ori, tar, mask = run("a cat on grass", "a dog on grass", "dog", seed=0,
                         steps=2)
    size = zoo.cfg.canvas.edit_size
    assert ori.shape == (size, size, 3) and tar.shape == (size, size, 3)
    assert mask.shape == (size, size) and mask.dtype == bool
    # shared seed: deterministic
    ori2, _, _ = run("a cat on grass", "a dog on grass", "dog", seed=0, steps=2)
    np.testing.assert_array_equal(ori, ori2)
