"""On-device quality scorers (reference filter_tool/utils.py).

Where the reference pins model copies to cuda:0/cuda:1 and synchronizes by
hand (utils.py:15-22 + torch.cuda.synchronize scattered through), here each
scorer is a pure batched function over embeddings computed by the shared
CLIP towers — one resident copy per mesh, no manual placement.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def clip_score(image_emb: jnp.ndarray, text_emb: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity of L2-normalized CLIP embeddings (utils.py:24-40).

    The reference returns logits/100-free raw cosine; thresholds in the
    filter tables are calibrated for that convention.
    """
    return jnp.sum(image_emb * text_emb, axis=-1)


def directional_clip_score(src_img: jnp.ndarray, tgt_img: jnp.ndarray,
                           src_txt: jnp.ndarray, tgt_txt: jnp.ndarray,
                           eps: float = 1e-8) -> jnp.ndarray:
    """Directional CLIP (utils.py:284-301): cos(Δimage, Δtext) where
    Δ = normalized embedding difference. Measures whether the image moved
    the way the caption edit says."""
    di = tgt_img - src_img
    dt = tgt_txt - src_txt
    di = di / jnp.maximum(jnp.linalg.norm(di, axis=-1, keepdims=True), eps)
    dt = dt / jnp.maximum(jnp.linalg.norm(dt, axis=-1, keepdims=True), eps)
    return jnp.sum(di * dt, axis=-1)


def l1_distance(img_a: jnp.ndarray, img_b: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute pixel difference on [0,1] images (utils.py:102-110)."""
    a = img_a.astype(jnp.float32)
    b = img_b.astype(jnp.float32)
    red = tuple(range(1, a.ndim))
    return jnp.mean(jnp.abs(a - b), axis=red)


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.sum(an * bn, axis=-1)


def ssim(img_a: jnp.ndarray, img_b: jnp.ndarray, max_val: float = 1.0,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over (..., H, W, C) images in [0, max_val] — the implicit
    pipeline's best-of-N consistency score (implicit_tool.py:34-127)."""
    from anyedit_tpu.ops.morphology import gaussian_blur

    a = jnp.moveaxis(img_a.astype(jnp.float32), -1, 0)  # (C, ..., H, W)
    b = jnp.moveaxis(img_b.astype(jnp.float32), -1, 0)
    mu_a = gaussian_blur(a, sigma)
    mu_b = gaussian_blur(b, sigma)
    var_a = gaussian_blur(a * a, sigma) - mu_a * mu_a
    var_b = gaussian_blur(b * b, sigma) - mu_b * mu_b
    cov = gaussian_blur(a * b, sigma) - mu_a * mu_b
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2))
    return jnp.mean(s, axis=(0, -2, -1))


def ocr_text_match(text_a: str, text_b: str) -> bool:
    """GOT-OCR2 both-sides text check (post_filter.py:70-79 surface):
    normalized string equality of the OCR'd target strings."""
    import re
    norm = lambda s: re.sub(r"[^a-z0-9]", "", s.lower())
    return norm(text_a) == norm(text_b) and len(norm(text_a)) > 0


class AestheticMLP(nn.Module):
    """The LAION aesthetic predictor head (pre_filter.py:38-81):
    768-dim CLIP-L image embedding → scalar score, trained weights
    (sac+logos+ava1-l14-linearMSE) load via the converter."""

    @nn.compact
    def __call__(self, emb):
        x = emb.astype(jnp.float32)
        for i, (dim, drop) in enumerate([(1024, .2), (128, .2), (64, .1), (16, 0)]):
            x = nn.Dense(dim, name=f"fc{i}")(x)
            del drop  # inference only — dropout inert
        return nn.Dense(1, name="out")(x)[..., 0]
