"""Attention processors: MasaCtrl & Prompt-to-Prompt as pure functions.

The reference mutates diffusers' UNet at runtime
(`regiter_attention_editor_diffusers` masactrl_utils.py; `register_attention_control`
prompt2prompt/ptp_utils.py) to intercept attention. Here the UNet exposes a
processor slot (models/layers.py:MultiHeadAttention), so the same editors
are closures passed per call:

  * `masactrl_processor` — MutualSelfAttentionControl (masactrl/masactrl.py:14):
    from step S and self-attn layer L on, target-branch queries attend to the
    SOURCE branch's keys/values → consistent action/pose edits.
  * `AttentionStore` — prompt2prompt AttentionStore (prompt_to_prompt_stable.py:132):
    captures cross-attention probability maps at trace time; `mask_from_ca`
    (:327-347) turns the stored maps for a keyword into a binary edit mask.
  * `p2p_replace_processor` — AttentionReplace (:169+): the target prompt's
    cross-attention maps are replaced by the source's, routed through a
    token alignment matrix (`alignment_matrix` ≈ seq_aligner.py).

Layer indices are trace-time counters (static per jit trace); the diffusion
step is a traced scalar passed via `extra["step"]` so one compiled program
serves every step.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.models.layers import AttnMeta
from anyedit_tpu.ops.attention import sdpa_xla


def _probs(q, k, scale=None, bias=None):
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    return jax.nn.softmax(logits, axis=-1)


# ---- MasaCtrl ------------------------------------------------------------

def masactrl_processor(start_step: int, start_layer: int,
                       source_of: Optional[np.ndarray] = None) -> Callable:
    """Mutual self-attention control.

    source_of[b] = batch row whose K/V row b should use once active.
    Default pair layout [source, target] (optionally repeated per CFG
    branch): every odd row reads from the even row before it.

    extra must carry {"step": traced scalar}; a trace-time "_sa" counter
    numbers the self-attention sites in call order.
    """

    def proc(q, k, v, meta: AttnMeta, extra):
        if not meta.is_self:
            return sdpa_xla(q, k, v)
        idx = extra.setdefault("_sa", 0)
        extra["_sa"] = idx + 1
        if idx < start_layer:
            return sdpa_xla(q, k, v)
        b = q.shape[0]
        if source_of is None:
            src = np.arange(b)
            src[1::2] = src[0::2][: len(src[1::2])]
        else:
            src = source_of
        src = jnp.asarray(src)
        step = extra["step"]
        active = step >= start_step
        k_sel = jnp.where(active, k[src], k)
        v_sel = jnp.where(active, v[src], v)
        return sdpa_xla(q, k_sel, v_sel)

    return proc


# ---- Prompt-to-Prompt ----------------------------------------------------

class AttentionStore:
    """Captures cross-attention maps during a (traced) UNet call.

    Usage per step:
        store.reset()
        eps = unet.apply(params, x, t, ctx, processor=store.processor())
        maps = store.collect()   # pytree of traced arrays — return from jit
    Accumulate the returned maps across steps host-side.
    """

    def __init__(self, watch_self: bool = False, max_hw: int = 32 * 32):
        self.watch_self = watch_self
        self.max_hw = max_hw
        self._maps: dict[str, jnp.ndarray] = {}

    def reset(self):
        self._maps = {}

    def processor(self):
        def proc(q, k, v, meta: AttnMeta, extra):
            p = _probs(q, k)
            if (self.watch_self or not meta.is_self) and q.shape[2] <= self.max_hw:
                # mean over heads → (B, L_img, L_txt)
                self._maps[meta.name] = jnp.mean(p, axis=1)
            return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32).astype(q.dtype)
        return proc

    def collect(self) -> dict[str, jnp.ndarray]:
        return dict(self._maps)


def mask_from_ca(accumulated: jnp.ndarray, token_idx: int, hw: int,
                 threshold: float = 0.3) -> jnp.ndarray:
    """Binary mask from an accumulated cross-attn map (B, hw², T)
    (`mask_from_CA`, prompt_to_prompt_stable.py:327-347): take the keyword
    column, normalize to [0,1], threshold."""
    m = accumulated[:, :, token_idx]                # (B, hw²)
    m = m - jnp.min(m, axis=-1, keepdims=True)
    m = m / jnp.maximum(jnp.max(m, axis=-1, keepdims=True), 1e-8)
    return (m > threshold).reshape(-1, hw, hw)


def alignment_matrix(src_tokens: list, tgt_tokens: list) -> np.ndarray:
    """(T_tgt, T_src) mapper: tgt position ← aligned src position
    (seq_aligner.py semantics via longest-common-subsequence blocks)."""
    import difflib
    m = np.zeros((len(tgt_tokens), len(src_tokens)), np.float32)
    sm = difflib.SequenceMatcher(a=src_tokens, b=tgt_tokens, autojunk=False)
    mapped = set()
    for block in sm.get_matching_blocks():
        for off in range(block.size):
            m[block.b + off, block.a + off] = 1.0
            mapped.add(block.b + off)
    # unmatched target tokens keep their own column if in range (refine mode)
    for i in range(len(tgt_tokens)):
        if i not in mapped and i < len(src_tokens):
            m[i, i] = 1.0
    return m


def p2p_replace_processor(mapper: np.ndarray, stop_step: int,
                          pair_of: Optional[np.ndarray] = None) -> Callable:
    """AttentionReplace: target rows' cross-attn probs ← source rows' probs
    routed through `mapper` while step < stop_step.

    Layout like masactrl: [source, target] pairs; self-attention untouched.
    """
    mp = jnp.asarray(mapper)  # (T_tgt, T_src)

    def proc(q, k, v, meta: AttnMeta, extra):
        if meta.is_self:
            return sdpa_xla(q, k, v)
        p = _probs(q, k)                              # (B,H,L,T)
        b = q.shape[0]
        if pair_of is None:
            src = np.arange(b)
            src[1::2] = src[0::2][: len(src[1::2])]
        else:
            src = pair_of
        p_src = p[jnp.asarray(src)]                   # source maps per row
        p_mapped = jnp.einsum("bhqs,ts->bhqt", p_src, mp)
        is_target = jnp.asarray((np.arange(b) % 2 == 1)[:, None, None, None])
        active = extra["step"] < stop_step
        p_used = jnp.where(active & is_target, p_mapped, p)
        return jnp.einsum("bhqk,bhkd->bhqd", p_used.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    return proc
