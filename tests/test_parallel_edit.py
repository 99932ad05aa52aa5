"""Data-parallel batched editing over the virtual 8-device mesh.

The reference shards factory work by launching one process per GPU with
index ranges (scripts/*.sh, local_pipeline_tool.py:579-583). The TPU-native
replacement is `ModelZoo.ip2p_batch_fn(mesh)`: one process, records
device-batched with the batch axis sharded over `dp`. These tests check
(a) the sharded batch runs end-to-end on a dp=8 CPU mesh and
(b) unmasked batched results are bit-comparable to the per-record editor.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyedit_tpu.core.config import CanvasConfig
from anyedit_tpu.core.mesh import make_mesh, MeshSpec
from anyedit_tpu.models.unet_sd import TINY_UNET
from anyedit_tpu.models.vae import TINY_VAE
from anyedit_tpu.models.clip import TINY_TEXT
from anyedit_tpu.runtime.zoo import ModelZoo, ZooConfig


@pytest.fixture(scope="module")
def zoo():
    cfg = ZooConfig(
        canvas=CanvasConfig(edit_size=32, grounding_size=32, sam_size=64,
                            latent_down=2),
        ip2p_unet=dataclasses.replace(TINY_UNET, in_channels=8,
                                      dtype=jnp.float32),
        vae=dataclasses.replace(TINY_VAE, dtype=jnp.float32),
        text=dataclasses.replace(TINY_TEXT, dtype=jnp.float32,
                                 vocab_size=30522, max_len=77),
    )
    return ModelZoo(cfg)


def _images(n):
    rng = np.random.default_rng(3)
    return [rng.integers(0, 255, (40, 40, 3), np.uint8) for _ in range(n)]


def test_dp_batch_matches_per_record(zoo):
    mesh = make_mesh(MeshSpec(dp=8), devices=jax.devices()[:8])
    imgs = _images(3)
    instrs = ["make it red", "make it blue", "add snow"]
    batched = zoo.ip2p_batch_fn(mesh=mesh, bucket=8)
    outs = batched(imgs, instrs, steps=2, seeds=[5, 6, 7])
    single = zoo.ip2p()
    for i in range(3):
        want = single(imgs[i], instrs[i], None, steps=2, seed=5 + i)
        got = outs[i]
        assert got.shape == want.shape == imgs[i].shape
        # identical math per record (same per-record noise, batched UNet);
        # tolerance covers batched-vs-single fp reassociation
        assert np.mean(np.abs(got.astype(np.float32)
                              - want.astype(np.float32))) < 2.0


def test_dp_batch_masked_runs(zoo):
    mesh = make_mesh(MeshSpec(dp=8), devices=jax.devices()[:8])
    imgs = _images(2)
    m = np.zeros((40, 40), np.float32)
    m[10:30, 10:30] = 1.0
    batched = zoo.ip2p_batch_fn(mesh=mesh, bucket=8)
    outs = batched(imgs, ["brighten the square", "recolor it"],
                   masks=[m, None], steps=2)
    assert len(outs) == 2
    for o, im in zip(outs, imgs):
        assert o.shape == im.shape and o.dtype == np.uint8
        assert np.isfinite(o.astype(np.float32)).all()


def test_single_device_batching(zoo):
    outs = zoo.ip2p_batch_fn(mesh=None, bucket=4)(
        _images(2), ["a", "b"], steps=1)
    assert len(outs) == 2 and outs[0].dtype == np.uint8


def test_batch_larger_than_bucket_chunks(zoo):
    """n > bucket must chunk internally (round-2 advisory: the old code
    raised IndexError past the bucket), and tail chunks use a smaller
    compiled bucket with padded-vs-real accounting."""
    batched = zoo.ip2p_batch_fn(mesh=None, bucket=2)
    imgs = _images(5)
    r0, p0 = batched.stats["real"], batched.stats["padded"]
    outs = batched(imgs, [f"edit {i}" for i in range(5)], steps=1)
    assert len(outs) == 5
    for o, im in zip(outs, imgs):
        assert o.shape == im.shape and o.dtype == np.uint8
    # chunks: 2+2+1 → tail runs in a bucket-1 program, zero padding
    assert batched.stats["real"] - r0 == 5
    assert batched.stats["padded"] - p0 == 0


def test_tail_bucket_respects_dp(zoo):
    mesh = make_mesh(MeshSpec(dp=8), devices=jax.devices()[:8])
    batched = zoo.ip2p_batch_fn(mesh=mesh, bucket=8)
    r0, p0 = batched.stats["real"], batched.stats["padded"]
    outs = batched(_images(3), ["a", "b", "c"], steps=1)
    assert len(outs) == 3
    # dp=8 floor: tail cannot shrink below the mesh's dp extent
    assert batched.stats["real"] - r0 == 3
    assert batched.stats["padded"] - p0 == 5


def test_lcm_batch_matches_per_record(zoo):
    """ADVICE r4 (medium): with lcm_steps>0 the batched editor must run the
    consistency sampler (folded-CFG student math), not the teacher 3-way-CFG
    DDIM loop — and per-record seeds must reproduce the per-record lcm
    editor's noise draws."""
    cfg = dataclasses.replace(zoo.cfg, lcm_steps=2)
    z = ModelZoo(cfg)
    imgs = _images(3)
    instrs = ["make it red", "make it blue", "add snow"]
    batched = z.ip2p_batch_fn(mesh=None, bucket=4)
    outs = batched(imgs, instrs, seeds=[5, 6, 7])
    single = z.ip2p()
    for i in range(3):
        want = single(imgs[i], instrs[i], None, seed=5 + i)
        got = outs[i]
        assert got.shape == want.shape == imgs[i].shape
        assert np.mean(np.abs(got.astype(np.float32)
                              - want.astype(np.float32))) < 2.0


def test_lcm_batch_masked_composites(zoo):
    cfg = dataclasses.replace(zoo.cfg, lcm_steps=2)
    z = ModelZoo(cfg)
    imgs = _images(2)
    m = np.zeros((40, 40), np.float32)
    m[:20] = 1.0
    batched = z.ip2p_batch_fn(mesh=None, bucket=2)
    out_m, out_f = batched(imgs, ["recolor", "recolor"], masks=[m, None],
                           seeds=[3, 3])
    assert out_m.shape == imgs[0].shape and out_m.dtype == np.uint8
    assert np.isfinite(out_m.astype(np.float32)).all()
