"""GroundingDINO — open-vocabulary detector (the grounding stage's core).

Capability parity with reference `GroundingDINO/groundingdino/models/`
(`GroundingDINO` groundingdino.py:51 forward :212, `Transformer`
transformer.py:40, fusion fuse_modules.py:99/252, deformable attention
ms_deform_attn.py:136), rebuilt TPU-first:
  * all token streams are static-shape (text padded to max_text_len,
    queries fixed at num_queries, image buckets fixed),
  * the CUDA im2col kernel is replaced by `ops.deform_attn.ms_deform_attn`,
  * cross-modality fusion (BiMultiHeadAttention) is a pair of standard
    attention calls with learned gamma gates — XLA fuses the rest.

Surface: `model.apply(params, pixels, text_ids, text_mask)` →
(pred_logits (B, Q, T), pred_boxes (B, Q, 4) in normalized cxcywh),
matching the reference's output contract consumed by
`get_grounding_output` (tool.py:116-147).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.bert import BertConfig, BertEncoder, BERT_BASE, TINY_BERT
from anyedit_tpu.models.layers import LayerNorm
from anyedit_tpu.models.swin import SwinConfig, SwinTransformer, SWIN_B, TINY_SWIN
from anyedit_tpu.ops.attention import sdpa_xla
from anyedit_tpu.ops.deform_attn import ms_deform_attn


@dataclasses.dataclass(frozen=True)
class GDINOConfig:
    swin: SwinConfig = SWIN_B
    bert: BertConfig = BERT_BASE
    hidden: int = 256
    heads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    num_queries: int = 900
    num_levels: int = 4
    num_points: int = 4
    max_text_len: int = 256
    ffn_dim: int = 2048
    # BERT special-token ids delimiting phrase segments ([CLS], [SEP], '.')
    special_ids: tuple[int, ...] = (101, 102, 1012)
    dtype: Any = jnp.bfloat16


GDINO_SWINB = GDINOConfig()
TINY_GDINO = GDINOConfig(swin=TINY_SWIN, bert=TINY_BERT, hidden=32, heads=2,
                         enc_layers=1, dec_layers=1, num_queries=12,
                         num_levels=2, num_points=2, max_text_len=16,
                         ffn_dim=64)


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def segment_text_masks(text_ids: jnp.ndarray, text_mask: jnp.ndarray,
                       special_ids: tuple[int, ...]):
    """Within-phrase self-attention mask + per-segment position ids.

    Traced re-derivation of the reference's
    `generate_masks_with_special_tokens_and_transfer_map`
    (GroundingDINO bertwarper.py): tokens may attend to each other iff they
    belong to the same phrase segment — the run of tokens between two
    delimiters, inclusive of the closing '.'; [CLS]/[SEP] attend only to
    themselves. Position ids restart at 0 per segment.

    Returns (self_attn_bias (B,1,T,T) fp32 additive, position_ids (B,T)).
    """
    is_special = jnp.zeros_like(text_ids, dtype=bool)
    for sid in special_ids:
        is_special = is_special | (text_ids == sid)
    # [CLS]/[SEP] (the first two special_ids) are isolated; '.' stays in
    # its block (reference handles col==0 / col==len-1 separately)
    isolate_tok = (text_ids == special_ids[0]) | (text_ids == special_ids[1])
    # segment id = number of special tokens strictly before position i;
    # the closing delimiter shares its segment's id.
    seg = jnp.cumsum(is_special.astype(jnp.int32), axis=1) \
        - is_special.astype(jnp.int32)
    same_seg = (seg[:, :, None] == seg[:, None, :])
    valid = text_mask[:, :, None] & text_mask[:, None, :]
    t = text_ids.shape[1]
    eye = jnp.eye(t, dtype=bool)[None]
    isolate = isolate_tok[:, :, None] | isolate_tok[:, None, :]
    allowed = (same_seg & ~isolate & valid) | eye
    bias = jnp.where(allowed, 0.0, -1e9)[:, None, :, :].astype(jnp.float32)
    # per-segment positions: distance past the previous special token
    idx = jnp.arange(t)[None, :]
    prev_special = jnp.where(is_special, idx, -1)
    prev_special = jax.lax.cummax(prev_special, axis=1)
    # shift exclusive: previous special strictly before i
    prev_excl = jnp.concatenate(
        [jnp.full_like(prev_special[:, :1], -1), prev_special[:, :-1]], axis=1)
    position_ids = jnp.where(isolate_tok, 0,
                             jnp.maximum(idx - prev_excl - 1, 0))
    return bias, position_ids


class DeformAttnModule(nn.Module):
    """Learned sampling offsets/weights + the gather op."""

    cfg: GDINOConfig

    @nn.compact
    def __call__(self, query, value, spatial_shapes, ref_points):
        """query (B,Q,C); value (B,S,C); ref_points (B,Q,L,2 or 4) normalized."""
        c = self.cfg
        b, q, _ = query.shape
        h, l, k = c.heads, c.num_levels, c.num_points
        d = c.hidden // h
        v = nn.Dense(c.hidden, dtype=c.dtype, name="value_proj")(value)
        v = v.reshape(b, -1, h, d)
        off = nn.Dense(h * l * k * 2, dtype=c.dtype, name="sampling_offsets")(query)
        off = off.reshape(b, q, h, l, k, 2).astype(jnp.float32)
        w = nn.Dense(h * l * k, dtype=c.dtype, name="attn_weights")(query)
        w = jax.nn.softmax(w.reshape(b, q, h, l * k).astype(jnp.float32), axis=-1)
        w = w.reshape(b, q, h, l, k)
        wh = jnp.asarray([(ww, hh) for hh, ww in spatial_shapes], jnp.float32)
        if ref_points.shape[-1] == 2:
            loc = ref_points[:, :, None, :, None, :] \
                + off / wh[None, None, None, :, None, :]
        else:  # boxes: offsets scaled by half box size
            ctr = ref_points[..., :2][:, :, None, :, None, :]
            size = ref_points[..., 2:][:, :, None, :, None, :]
            loc = ctr + off / k * size * 0.5
        out = ms_deform_attn(v, spatial_shapes, loc, w)
        return nn.Dense(c.hidden, dtype=c.dtype, name="out_proj")(out)


class BiFusion(nn.Module):
    """Bidirectional image↔text attention with gamma gates
    (fuse_modules.py:99 BiMultiHeadAttention / :252 BiAttentionBlock).

    The fusion attention runs at its OWN inner width: the reference
    constructs it with `embed_dim=dim_feedforward//2, num_heads=nhead//2`
    (transformer.py:99-103) — SwinB: 256→1024 rectangular projections,
    4 heads × 256 head_dim. Found by the decorrelated golden test: at
    default init the 1e-4 layer scale suppressed the head-partitioning
    mismatch of an earlier square formulation below test tolerance."""

    cfg: GDINOConfig

    @nn.compact
    def __call__(self, img, txt, txt_bias):
        c = self.cfg
        e = c.ffn_dim // 2
        h = max(1, c.heads // 2)
        d = e // h
        gi = self.param("gamma_i", nn.initializers.constant(1e-4),
                        (c.hidden,), jnp.float32)
        gt = self.param("gamma_t", nn.initializers.constant(1e-4),
                        (c.hidden,), jnp.float32)
        # NOTE the reference REBINDS v/l to the normed features before the
        # gated residual (fuse_modules.py BiAttentionBlock.forward:
        # `v = self.layer_norm_v(v); ...; v = v + drop_path(gamma_v·Δv)`) —
        # the residual stream itself is layer-normed every fusion layer.
        img_n = LayerNorm(dtype=c.dtype, name="ln_i")(img)
        txt_n = LayerNorm(dtype=c.dtype, name="ln_t")(txt)
        b, s, _ = img_n.shape
        t = txt_n.shape[1]
        sp = lambda x, l: x.reshape(b, l, h, d).transpose(0, 2, 1, 3)
        qi = sp(nn.Dense(e, dtype=c.dtype, name="qi")(img_n), s)
        kt = sp(nn.Dense(e, dtype=c.dtype, name="kt")(txt_n), t)
        vt = sp(nn.Dense(e, dtype=c.dtype, name="vt")(txt_n), t)
        vi = sp(nn.Dense(e, dtype=c.dtype, name="vi")(img_n), s)
        i2t = sdpa_xla(qi, kt, vt, bias=txt_bias)                 # img attends text
        t2i = sdpa_xla(kt, qi, vi)                                # text attends img
        i2t = i2t.transpose(0, 2, 1, 3).reshape(b, s, e)
        t2i = t2i.transpose(0, 2, 1, 3).reshape(b, t, e)
        img = img_n + gi * nn.Dense(c.hidden, dtype=c.dtype, name="oi")(i2t)
        txt = txt_n + gt * nn.Dense(c.hidden, dtype=c.dtype, name="ot")(t2i)
        return img, txt


class FFN(nn.Module):
    cfg: GDINOConfig
    dim: int = 0          # 0 → cfg.ffn_dim (text enhancer uses ffn_dim//2)

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Dense(self.dim or c.ffn_dim, dtype=c.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(c.hidden, dtype=c.dtype, name="fc2")(h)
        return LayerNorm(dtype=c.dtype, name="ln")(x + h)


def sine_pos_1d(vals: jnp.ndarray, num_feats: int,
                temp: float = 10000.0) -> jnp.ndarray:
    """get_sine_pos_embed of a scalar per position (reference
    utils.get_sine_pos_embed, exchange_xy=False): vals (..., ) →
    (..., num_feats), interleaved sin/cos, scale 2π."""
    dim_t = temp ** (2 * (jnp.arange(num_feats, dtype=jnp.float32) // 2)
                     / num_feats)
    p = vals.astype(jnp.float32)[..., None] * (2 * jnp.pi) / dim_t
    return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                     axis=-1).reshape(*vals.shape, num_feats)


class EncoderLayer(nn.Module):
    cfg: GDINOConfig

    @nn.compact
    def __call__(self, img, txt, spatial_shapes, ref_points, pos, txt_bias,
                 txt_kpm_bias, txt_pos):
        c = self.cfg
        # fusion first (per reference encoder ordering)
        img, txt = BiFusion(c, name="fusion")(img, txt, txt_kpm_bias)
        # text self-attention — post-norm (reference text_layers,
        # transformer.py: the enhancer runs at HALF the heads and HALF the
        # ffn width — `nhead//2, dim_feedforward//2`); q/k carry the sine
        # embedding of the per-segment position ids (pos_text)
        h = max(1, c.heads // 2)
        b, t, _ = txt.shape
        d = c.hidden // h
        sp = lambda x: x.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        txt_qk = txt + txt_pos.astype(txt.dtype)
        ta = sdpa_xla(sp(nn.Dense(c.hidden, dtype=c.dtype, name="tq")(txt_qk)),
                      sp(nn.Dense(c.hidden, dtype=c.dtype, name="tk")(txt_qk)),
                      sp(nn.Dense(c.hidden, dtype=c.dtype, name="tv")(txt)),
                      bias=txt_bias)
        ta = ta.transpose(0, 2, 1, 3).reshape(b, t, c.hidden)
        txt = LayerNorm(dtype=c.dtype, name="txt_ln")(
            txt + nn.Dense(c.hidden, dtype=c.dtype, name="to")(ta))
        txt = FFN(c, dim=max(1, c.ffn_dim // 2), name="txt_ffn")(txt)
        # vision deformable self-attention — post-norm (deformable DETR)
        out = DeformAttnModule(c, name="deform")(
            img + pos, img, spatial_shapes, ref_points)
        img = LayerNorm(dtype=c.dtype, name="img_ln")(img + out)
        img = FFN(c, name="img_ffn")(img)
        return img, txt


class DecoderLayer(nn.Module):
    cfg: GDINOConfig

    @nn.compact
    def __call__(self, tgt, img, txt, spatial_shapes, ref_boxes, q_pos,
                 txt_kpm_bias):
        c = self.cfg
        h, b = c.heads, tgt.shape[0]
        q = tgt.shape[1]
        d = c.hidden // h
        sp = lambda x, l: x.reshape(b, l, h, d).transpose(0, 2, 1, 3)
        # self-attention among queries — post-norm (reference decoder
        # ordering: self_attn→norm2, ca_text→catext_norm, deform→norm1,
        # ffn→norm3)
        qk = tgt + q_pos
        sa = sdpa_xla(sp(nn.Dense(c.hidden, dtype=c.dtype, name="sq")(qk), q),
                      sp(nn.Dense(c.hidden, dtype=c.dtype, name="sk")(qk), q),
                      sp(nn.Dense(c.hidden, dtype=c.dtype, name="sv")(tgt), q))
        tgt = LayerNorm(dtype=c.dtype, name="ln_sa")(
            tgt + nn.Dense(c.hidden, dtype=c.dtype, name="so")(
                sa.transpose(0, 2, 1, 3).reshape(b, q, c.hidden)))
        # text cross-attention
        t = txt.shape[1]
        ca = sdpa_xla(sp(nn.Dense(c.hidden, dtype=c.dtype, name="cq")(tgt + q_pos), q),
                      sp(nn.Dense(c.hidden, dtype=c.dtype, name="ck")(txt), t),
                      sp(nn.Dense(c.hidden, dtype=c.dtype, name="cv")(txt), t),
                      bias=txt_kpm_bias)
        tgt = LayerNorm(dtype=c.dtype, name="ln_ta")(
            tgt + nn.Dense(c.hidden, dtype=c.dtype, name="co")(
                ca.transpose(0, 2, 1, 3).reshape(b, q, c.hidden)))
        # deformable cross-attention to image
        ref = jnp.broadcast_to(ref_boxes[:, :, None, :],
                               (b, q, c.num_levels, 4))
        out = DeformAttnModule(c, name="deform")(
            tgt + q_pos, img, spatial_shapes, ref)
        tgt = LayerNorm(dtype=c.dtype, name="ln_da")(tgt + out)
        return FFN(c, name="ffn")(tgt)


class BoxHead(nn.Module):
    cfg: GDINOConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.relu(nn.Dense(c.hidden, dtype=c.dtype, name="fc1")(x))
        h = nn.relu(nn.Dense(c.hidden, dtype=c.dtype, name="fc2")(h))
        return nn.Dense(4, dtype=jnp.float32, name="fc3")(h.astype(jnp.float32))


def _sine_hw(vals, half, temp):
    """vals (L,) in radians → (L, half) interleaved sin/cos
    (PositionEmbeddingSineHW convention, temperature `temp`)."""
    dim_t = temp ** (2 * (jnp.arange(half, dtype=jnp.float32) // 2) / half)
    p = vals[:, None] / dim_t
    return jnp.stack([jnp.sin(p[:, 0::2]), jnp.cos(p[:, 1::2])],
                     axis=-1).reshape(-1, half)


def _level_geometry(c, spatial_shapes):
    """Per-token (sine position WITHOUT the level embed, reference point,
    level index) for the flattened multi-level map: pos (S, hidden),
    ref (S, 2), lvl (S,) — shared by the monolithic and stepwise paths."""
    pos_parts, ref_parts, lvl_parts = [], [], []
    for li, (hh, ww) in enumerate(spatial_shapes):
        ys = (jnp.arange(hh, dtype=jnp.float32) + 0.5) / hh
        xs = (jnp.arange(ww, dtype=jnp.float32) + 0.5) / ww
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        ref_parts.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        # cumsum-normalized coords: (idx+1)/extent · 2π (reference eps
        # folded away for full masks)
        ny = (jnp.arange(hh, dtype=jnp.float32) + 1.0) / hh * 2 * jnp.pi
        nx = (jnp.arange(ww, dtype=jnp.float32) + 1.0) / ww * 2 * jnp.pi
        half = c.hidden // 2
        ey = _sine_hw(ny, half, 20.0)                   # (hh, half)
        ex = _sine_hw(nx, half, 20.0)                   # (ww, half)
        pe = jnp.concatenate(
            [jnp.repeat(ey, ww, axis=0),
             jnp.tile(ex, (hh, 1))], axis=-1)           # (hh·ww, hidden)
        pos_parts.append(pe)
        lvl_parts.append(jnp.full((hh * ww,), li, jnp.int32))
    return (jnp.concatenate(pos_parts, 0), jnp.concatenate(ref_parts, 0),
            jnp.concatenate(lvl_parts, 0))


def _box_query_sine(c, ref_boxes):
    """Query pos embedding input from current reference boxes: interleaved
    sin/cos per coord, coords ordered (y, x, w, h) — reference
    get_sine_pos_embed with exchange_xy=True. (B, nq, 2·hidden)."""
    b, nq = ref_boxes.shape[0], ref_boxes.shape[1]
    half = c.hidden // 2
    dim_t = 10000.0 ** (2 * (jnp.arange(half, dtype=jnp.float32) // 2) / half)
    coords = ref_boxes[..., jnp.asarray([1, 0, 2, 3])]
    p = (coords[..., None] * 2 * jnp.pi) / dim_t
    return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                     axis=-1).reshape(b, nq, 2 * c.hidden)


class GroundingDINO(nn.Module):
    cfg: GDINOConfig = GDINO_SWINB

    @nn.compact
    def __call__(self, pixels, text_ids, text_mask):
        """pixels (B,H,W,3) ImageNet-normalized; text_ids (B,T) int;
        text_mask (B,T) bool (True = real token).
        → (pred_logits (B,Q,T), pred_boxes (B,Q,4) cxcywh in [0,1])."""
        c = self.cfg

        # ---- text tower -------------------------------------------------
        kpm_bias = jnp.where(text_mask, 0.0, -1e9)[:, None, None, :]  # key-pad
        # within-phrase attention + per-segment positions (bertwarper.py)
        seg_bias, position_ids = segment_text_masks(text_ids, text_mask,
                                                    c.special_ids)
        txt = BertEncoder(c.bert, name="bert")(text_ids, seg_bias,
                                               position_ids=position_ids)
        txt = nn.Dense(c.hidden, dtype=c.dtype, name="feat_map")(
            txt.astype(c.dtype))                                      # (B,T,C)

        # ---- vision tower ----------------------------------------------
        from anyedit_tpu.models.layers import GroupNorm
        feats = SwinTransformer(c.swin, name="swin")(pixels)
        maps = [feats[k] for k in sorted(feats)]
        # 1x1 proj + GroupNorm(32) per backbone level; extra coarse levels
        # are 3x3 stride-2 convs from the RAW last backbone map (reference
        # input_proj construction, groundingdino.py) — no double projection
        gn_groups = min(32, c.hidden)
        proj = []
        for i, m in enumerate(maps):
            p = nn.Conv(c.hidden, (1, 1), dtype=c.dtype, name=f"in_proj_{i}")(m)
            proj.append(GroupNorm(gn_groups, dtype=c.dtype, name=f"in_ln_{i}")(p))
        src = maps[-1]
        while len(proj) < c.num_levels:
            src = nn.Conv(c.hidden, (3, 3), strides=(2, 2), padding="SAME",
                          dtype=c.dtype, name=f"in_proj_{len(proj)}")(src)
            src = GroupNorm(gn_groups, dtype=c.dtype,
                            name=f"in_ln_{len(proj)}")(src)
            proj.append(src)
        spatial_shapes = tuple((m.shape[1], m.shape[2]) for m in proj)
        b = proj[0].shape[0]
        img = jnp.concatenate([p.reshape(b, -1, c.hidden) for p in proj],
                              axis=1)                                 # (B,S,C)
        s = img.shape[1]

        # level embedding + per-token normalized reference points.
        # Sine embedding matches PositionEmbeddingSineHW (temperature 20,
        # normalize=True scale 2π, INTERLEAVED sin/cos, [pos_y ‖ pos_x]).
        lvl_emb = self.param("level_embed", nn.initializers.normal(1.0),
                             (c.num_levels, c.hidden), jnp.float32)
        pos_base, ref_pts, tok_level = _level_geometry(c, spatial_shapes)
        pos = jnp.broadcast_to((pos_base + lvl_emb[tok_level])[None],
                               (b, s, c.hidden)).astype(c.dtype)
        ref_pts = jnp.broadcast_to(ref_pts[None, :, None, :],
                                   (b, s, c.num_levels, 2))

        # ---- cross-modality encoder ------------------------------------
        # text self-attention keeps the within-phrase mask; image→text
        # fusion and decoder cross-attention see padding-masked text only
        txt_pos = sine_pos_1d(position_ids, c.hidden)          # (B,T,C)
        for i in range(c.enc_layers):
            img, txt = EncoderLayer(c, name=f"enc_{i}")(
                img, txt, spatial_shapes, ref_pts, pos, seg_bias, kpm_bias,
                txt_pos)

        # ---- language-guided query selection ---------------------------
        out_mem = LayerNorm(dtype=c.dtype, name="mem_ln")(
            nn.Dense(c.hidden, dtype=c.dtype, name="mem_proj")(img))
        sim = jnp.einsum("bsc,btc->bst", out_mem.astype(jnp.float32),
                         txt.astype(jnp.float32))
        sim = jnp.where(text_mask[:, None, :], sim, -1e9)
        score = jnp.max(sim, axis=-1)                                 # (B,S)
        nq = min(c.num_queries, s)
        _, top_idx = jax.lax.top_k(score, nq)                         # (B,nq)
        anchors = jnp.take_along_axis(
            jnp.broadcast_to(ref_pts[:, :, 0, :], (b, s, 2)), top_idx[..., None],
            axis=1)
        # per-level proposal size: wh = 0.05 · 2^lvl (gen_encoder_output_
        # proposals, deformable-DETR convention)
        wh_all = 0.05 * (2.0 ** tok_level.astype(jnp.float32))        # (S,)
        wh_sel = jnp.take_along_axis(jnp.broadcast_to(wh_all[None], (b, s)),
                                     top_idx, axis=1)[..., None]
        prop_boxes = jnp.concatenate(
            [anchors, jnp.tile(wh_sel, (1, 1, 2))], axis=-1)          # cxcywh
        sel_mem = jnp.take_along_axis(out_mem, top_idx[..., None], axis=1)
        delta = BoxHead(c, name="enc_box_head")(sel_mem)
        ref_boxes = jax.nn.sigmoid(_inverse_sigmoid(prop_boxes) + delta)

        tgt_emb = self.param("tgt_embed", nn.initializers.normal(1.0),
                             (c.num_queries, c.hidden), jnp.float32)
        tgt = jnp.broadcast_to(tgt_emb[None, :nq], (b, nq, c.hidden)).astype(c.dtype)

        # ---- decoder with iterative box refinement ---------------------
        # shared ref_point_head MLP (reference transformer.decoder
        # ref_point_head: sine(4 coords × C/2) = 2C → C → C)
        rp_fc1 = nn.Dense(c.hidden, dtype=c.dtype, name="ref_point_fc1")
        rp_fc2 = nn.Dense(c.hidden, dtype=c.dtype, name="ref_point_fc2")
        for i in range(c.dec_layers):
            pe = _box_query_sine(c, ref_boxes)
            q_pos = rp_fc2(nn.relu(rp_fc1(pe.astype(c.dtype))))
            tgt = DecoderLayer(c, name=f"dec_{i}")(
                tgt, img, txt, spatial_shapes, ref_boxes, q_pos, kpm_bias)
            delta = BoxHead(c, name=f"dec_box_head_{i}")(tgt)
            ref_boxes = jax.nn.sigmoid(_inverse_sigmoid(ref_boxes) + delta)
            ref_boxes = jax.lax.stop_gradient(ref_boxes)
        tgt = LayerNorm(dtype=c.dtype, name="dec_norm")(tgt)

        # ---- contrastive phrase logits ----------------------------------
        # plain dot product — the reference ContrastiveEmbed (utils.py) has
        # NO 1/sqrt(d) scale and NO bias; the box_threshold values applied
        # to sigmoid(logits) downstream assume this calibration
        logits = jnp.einsum("bqc,btc->bqt", tgt.astype(jnp.float32),
                            txt.astype(jnp.float32))
        logits = jnp.where(text_mask[:, None, :], logits, -1e9)
        return logits, ref_boxes


def make_gdino_stepwise(cfg: GDINOConfig):
    """Per-stage compile units for the full detector — the production
    900-query/800px program as ONE jit exceeds this environment's
    tunneled remote-compile service (PARITY.md Round-3+ #3). Returns
    `f(params, pixels, text_ids, text_mask) -> (logits, boxes)`
    numerically identical to `GroundingDINO.__call__` but compiled as 6
    small programs: text tower, vision tower, encoder layer (reused x6),
    query selection, decoder layer (x6), final head — layer params ride
    as traced jit arguments so one compile serves all layers of a kind.
    """
    import functools
    from anyedit_tpu.models.layers import GroupNorm

    c = cfg
    gn_groups = min(32, c.hidden)

    @jax.jit
    def text_fwd(p, text_ids, text_mask):
        kpm_bias = jnp.where(text_mask, 0.0, -1e9)[:, None, None, :]
        seg_bias, position_ids = segment_text_masks(text_ids, text_mask,
                                                    c.special_ids)
        txt = BertEncoder(c.bert).apply({"params": p["bert"]}, text_ids,
                                        seg_bias, position_ids=position_ids)
        txt = nn.Dense(c.hidden, dtype=c.dtype).apply(
            {"params": p["feat_map"]}, txt.astype(c.dtype))
        txt_pos = sine_pos_1d(position_ids, c.hidden)
        return txt, seg_bias, kpm_bias, txt_pos

    @jax.jit
    def vision_fwd(p, pixels):
        feats = SwinTransformer(c.swin).apply({"params": p["swin"]}, pixels)
        maps = [feats[k] for k in sorted(feats)]
        proj = []
        for i, m in enumerate(maps):
            pr = nn.Conv(c.hidden, (1, 1), dtype=c.dtype).apply(
                {"params": p[f"in_proj_{i}"]}, m)
            proj.append(GroupNorm(gn_groups, dtype=c.dtype).apply(
                {"params": p[f"in_ln_{i}"]}, pr))
        src = maps[-1]
        while len(proj) < c.num_levels:
            i = len(proj)
            src = nn.Conv(c.hidden, (3, 3), strides=(2, 2), padding="SAME",
                          dtype=c.dtype).apply({"params": p[f"in_proj_{i}"]},
                                               src)
            src = GroupNorm(gn_groups, dtype=c.dtype).apply(
                {"params": p[f"in_ln_{i}"]}, src)
            proj.append(src)
        return tuple(proj)

    geo_cache: dict = {}

    @jax.jit
    def flatten(p, proj, pos_base, ref2d, lvl):
        b = proj[0].shape[0]
        img = jnp.concatenate([m.reshape(b, -1, c.hidden) for m in proj], 1)
        s = img.shape[1]
        pos = jnp.broadcast_to((pos_base + p["level_embed"][lvl])[None],
                               (b, s, c.hidden)).astype(c.dtype)
        ref_pts = jnp.broadcast_to(ref2d[None, :, None, :],
                                   (b, s, c.num_levels, 2))
        return img, pos, ref_pts

    @functools.partial(jax.jit, static_argnames=("shapes",))
    def enc_fwd(bp, img, txt, ref_pts, pos, seg_bias, kpm_bias, txt_pos,
                shapes):
        return EncoderLayer(c).apply({"params": bp}, img, txt, shapes,
                                     ref_pts, pos, seg_bias, kpm_bias,
                                     txt_pos)

    @jax.jit
    def qsel(p, img, txt, text_mask, ref_pts, lvl):
        b, s, _ = img.shape
        out_mem = LayerNorm(dtype=c.dtype).apply(
            {"params": p["mem_ln"]},
            nn.Dense(c.hidden, dtype=c.dtype).apply(
                {"params": p["mem_proj"]}, img))
        sim = jnp.einsum("bsc,btc->bst", out_mem.astype(jnp.float32),
                         txt.astype(jnp.float32))
        sim = jnp.where(text_mask[:, None, :], sim, -1e9)
        score = jnp.max(sim, axis=-1)
        nq = min(c.num_queries, s)
        _, top_idx = jax.lax.top_k(score, nq)
        anchors = jnp.take_along_axis(
            jnp.broadcast_to(ref_pts[:, :, 0, :], (b, s, 2)),
            top_idx[..., None], axis=1)
        wh_all = 0.05 * (2.0 ** lvl.astype(jnp.float32))
        wh_sel = jnp.take_along_axis(jnp.broadcast_to(wh_all[None], (b, s)),
                                     top_idx, axis=1)[..., None]
        prop_boxes = jnp.concatenate(
            [anchors, jnp.tile(wh_sel, (1, 1, 2))], axis=-1)
        sel_mem = jnp.take_along_axis(out_mem, top_idx[..., None], axis=1)
        delta = BoxHead(c).apply({"params": p["enc_box_head"]}, sel_mem)
        ref_boxes = jax.nn.sigmoid(_inverse_sigmoid(prop_boxes) + delta)
        tgt = jnp.broadcast_to(p["tgt_embed"][None, :nq],
                               (b, nq, c.hidden)).astype(c.dtype)
        return tgt, ref_boxes

    @functools.partial(jax.jit, static_argnames=("shapes",))
    def dec_fwd(bp, hp, p, tgt, img, txt, ref_boxes, kpm_bias, shapes):
        pe = _box_query_sine(c, ref_boxes)
        h = nn.relu(nn.Dense(c.hidden, dtype=c.dtype).apply(
            {"params": p["ref_point_fc1"]}, pe.astype(c.dtype)))
        q_pos = nn.Dense(c.hidden, dtype=c.dtype).apply(
            {"params": p["ref_point_fc2"]}, h)
        tgt = DecoderLayer(c).apply({"params": bp}, tgt, img, txt, shapes,
                                    ref_boxes, q_pos, kpm_bias)
        delta = BoxHead(c).apply({"params": hp}, tgt)
        ref_boxes = jax.nn.sigmoid(_inverse_sigmoid(ref_boxes) + delta)
        return tgt, ref_boxes

    @jax.jit
    def final(p, tgt, txt, text_mask):
        tgt = LayerNorm(dtype=c.dtype).apply({"params": p["dec_norm"]}, tgt)
        logits = jnp.einsum("bqc,btc->bqt", tgt.astype(jnp.float32),
                            txt.astype(jnp.float32))
        return jnp.where(text_mask[:, None, :], logits, -1e9)

    def forward(params, pixels, text_ids, text_mask):
        p = params["params"]
        txt, seg_bias, kpm_bias, txt_pos = text_fwd(p, text_ids, text_mask)
        proj = vision_fwd(p, pixels)
        shapes = tuple((int(m.shape[1]), int(m.shape[2])) for m in proj)
        if shapes not in geo_cache:
            geo_cache[shapes] = _level_geometry(c, shapes)
        pos_base, ref2d, lvl = geo_cache[shapes]
        img, pos, ref_pts = flatten(p, proj, pos_base, ref2d, lvl)
        for i in range(c.enc_layers):
            img, txt = enc_fwd(p[f"enc_{i}"], img, txt, ref_pts, pos,
                               seg_bias, kpm_bias, txt_pos, shapes)
        tgt, ref_boxes = qsel(p, img, txt, text_mask, ref_pts, lvl)
        for i in range(c.dec_layers):
            tgt, ref_boxes = dec_fwd(p[f"dec_{i}"], p[f"dec_box_head_{i}"],
                                     p, tgt, img, txt, ref_boxes, kpm_bias,
                                     shapes)
        return final(p, tgt, txt, text_mask), ref_boxes

    return forward
