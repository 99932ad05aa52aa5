"""LaMa — large-mask inpainting with Fast Fourier Convolutions.

The reference's `AnyEdit_Collection/other_modules/lama/` is EMPTY in its
checkout; callers import `saicinpainting...load_checkpoint` and run
`model({'image', 'mask'}) → 'inpainted'` (local_pipeline_tool.py:91-122).
This is a ground-up rebuild of that contract from the LaMa architecture
(Suvorov et al., WACV'22): ResNet-style generator whose residual blocks are
FFCs — a local conv branch + a global branch that convolves in the Fourier
domain (jnp.fft.rfft2 — a natural fit for XLA/TPU, replacing the
reference's cuFFT path).

BatchNorm appears as `FrozenBN` (inference affine with loadable running
stats), since the factory only ever runs the pretrained generator.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class LamaConfig:
    base: int = 64
    n_downsample: int = 3
    n_blocks: int = 9            # big-lama: 18
    ratio_g: float = 0.75        # global-branch channel fraction in blocks
    dtype: Any = jnp.float32     # FFT path prefers fp32


LAMA = LamaConfig()
BIG_LAMA = LamaConfig(n_blocks=18)
TINY_LAMA = LamaConfig(base=8, n_downsample=2, n_blocks=2)


class FrozenBN(nn.Module):
    """Inference BatchNorm: y = (x - mean) / sqrt(var+eps) * gamma + beta."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        y = (xf - mean) * jnp.sqrt(1.0 / (var + self.eps)) * gamma + beta
        return y.astype(x.dtype)


def _conv(feat, k, stride=1, name=None, dtype=jnp.float32,
          pad_mode: str = "zeros"):
    """k×k conv; big-lama reflect-pads the stem/blocks/out convs
    (padding_type='reflect' in the saicinpainting config) and zero-pads
    the stride-2 downsamples."""
    pad = k // 2
    if pad_mode == "reflect" and pad > 0:
        inner = nn.Conv(feat, (k, k), strides=(stride, stride),
                        padding="VALID", dtype=dtype, name=name)
        return lambda x: inner(jnp.pad(
            x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"))
    return nn.Conv(feat, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), dtype=dtype, name=name)


class SpectralTransform(nn.Module):
    """Global branch: conv → rFFT2 → 1x1 conv over (re‖im) → iFFT → conv."""

    out_ch: int
    cfg: LamaConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = _conv(self.out_ch // 2, 1, name="down", dtype=c.dtype)(x)
        h = FrozenBN(name="bn1")(h)
        h = nn.relu(h)
        # FourierUnit
        hf = jnp.fft.rfft2(h.astype(jnp.float32), axes=(1, 2), norm="ortho")
        ff = jnp.concatenate([hf.real, hf.imag], axis=-1)
        ff = _conv(self.out_ch, 1, name="fu_conv", dtype=c.dtype)(ff.astype(c.dtype))
        ff = FrozenBN(name="fu_bn")(ff)
        ff = nn.relu(ff)
        re, im = jnp.split(ff.astype(jnp.float32), 2, axis=-1)
        spatial = jnp.fft.irfft2(re + 1j * im, s=h.shape[1:3], axes=(1, 2),
                                 norm="ortho").astype(c.dtype)
        h = h + spatial
        return _conv(self.out_ch, 1, name="up", dtype=c.dtype)(h)


class FFC(nn.Module):
    """Fast Fourier Convolution: 2x2 grid of local/global cross paths."""

    out_ch: int
    cfg: LamaConfig
    kernel: int = 3
    pad_mode: str = "reflect"      # resnet blocks reflect-pad (big-lama)

    @nn.compact
    def __call__(self, x_l, x_g):
        c = self.cfg
        og = int(self.out_ch * c.ratio_g)
        ol = self.out_ch - og
        pm = self.pad_mode
        y_l = _conv(ol, self.kernel, name="l2l", dtype=c.dtype, pad_mode=pm)(x_l)
        y_g = _conv(og, self.kernel, name="l2g", dtype=c.dtype, pad_mode=pm)(x_l)
        if x_g is not None and x_g.shape[-1] > 0:
            y_l = y_l + _conv(ol, self.kernel, name="g2l", dtype=c.dtype,
                              pad_mode=pm)(x_g)
            y_g = y_g + SpectralTransform(og, c, name="g2g")(x_g)
        return y_l, y_g


class FFCResBlock(nn.Module):
    ch: int
    cfg: LamaConfig

    @nn.compact
    def __call__(self, x_l, x_g):
        h_l, h_g = FFC(self.ch, self.cfg, name="ffc1")(x_l, x_g)
        h_l = nn.relu(FrozenBN(name="bn1_l")(h_l))
        h_g = nn.relu(FrozenBN(name="bn1_g")(h_g))
        h_l, h_g = FFC(self.ch, self.cfg, name="ffc2")(h_l, h_g)
        h_l = nn.relu(FrozenBN(name="bn2_l")(h_l))
        h_g = nn.relu(FrozenBN(name="bn2_g")(h_g))
        return x_l + h_l, x_g + h_g


class LamaGenerator(nn.Module):
    """(image [-1..1] or [0..1], mask {0,1}) → inpainted image, same range.

    Contract of `inpaint_img_with_lama` (local_pipeline_tool.py:91-122):
    input = masked image ⊕ mask; output composited as
    mask·prediction + (1−mask)·image.
    """

    cfg: LamaConfig = LAMA

    @nn.compact
    def __call__(self, image, mask):
        c = self.cfg
        x = jnp.concatenate([image * (1.0 - mask), mask], axis=-1).astype(c.dtype)
        h = _conv(c.base, 7, name="stem", pad_mode="reflect")(x)
        h = nn.relu(FrozenBN(name="stem_bn")(h))
        ch = c.base
        for i in range(c.n_downsample):
            ch *= 2
            h = _conv(ch, 3, stride=2, name=f"down_{i}")(h)
            h = nn.relu(FrozenBN(name=f"down_bn_{i}")(h))
        g = int(ch * c.ratio_g)
        h_l, h_g = h[..., :ch - g], h[..., ch - g:]
        for i in range(c.n_blocks):
            h_l, h_g = FFCResBlock(ch, c, name=f"block_{i}")(h_l, h_g)
        h = jnp.concatenate([h_l, h_g], axis=-1)
        for i in range(c.n_downsample):
            ch //= 2
            # ConvTranspose2d(3, stride 2, pad 1, output_pad 1) — exact
            # torch equivalence: padding ((1,2),(1,2)) + transpose_kernel
            # (verified numerically; see tests/test_weights.py)
            h = nn.ConvTranspose(ch, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 transpose_kernel=True, dtype=c.dtype,
                                 name=f"up_{i}")(h)
            h = nn.relu(FrozenBN(name=f"up_bn_{i}")(h))
        out = _conv(3, 7, name="out", pad_mode="reflect")(h)
        out = nn.sigmoid(out.astype(jnp.float32))
        return mask * out + (1.0 - mask) * image


def pad_to_modulo(x: jnp.ndarray, mod: int = 8) -> tuple[jnp.ndarray, tuple[int, int]]:
    """Reflect-pad H,W to a multiple of `mod` (reference pad_img_to_modulo)."""
    h, w = x.shape[-3], x.shape[-2]
    ph = (mod - h % mod) % mod
    pw = (mod - w % mod) % mod
    pads = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(x, pads, mode="reflect"), (h, w)
