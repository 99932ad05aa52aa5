"""Model-zoo loader: params → one resident, jitted `Toolbox`.

Replaces the reference's per-script `load_tool_model`
(local_pipeline_tool.py:191-222 and friends) where every CLI process
reloads its own GroundingDINO/SAM/LaMa/SD copies. Here each model is
built+jitted once at its canonical shape bucket and shared by every
pipeline through the Toolbox closures.

Weights: `load_params(dir)` reads converted checkpoints (weights/convert.py
output, msgpack); absent files fall back to seeded random init so the whole
factory runs hermetically (tests, dry runs, throughput benchmarks).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.core.config import CanvasConfig
from anyedit_tpu.edits.types import Toolbox
from anyedit_tpu.grounding.maskgen import (
    MAX_BOXES, grounding_result, select_boxes,
)
from anyedit_tpu.grounding.text import SimpleVocabTokenizer, phrase_token_spans
from anyedit_tpu.models.gdino import GroundingDINO, GDINOConfig, GDINO_SWINB
from anyedit_tpu.models.lama import LamaGenerator, LamaConfig, LAMA, pad_to_modulo
from anyedit_tpu.models.sam import SAM, SAMConfig, SAM_VIT_H, SAM_PIXEL_MEAN, SAM_PIXEL_STD
from anyedit_tpu.models.unet_sd import (
    UNet2DCondition, UNetConfig, SD15_IP2P_UNET, SD15_INPAINT_UNET,
)
from anyedit_tpu.models.vae import AutoencoderKL, VAEConfig, SD_VAE
from anyedit_tpu.models.clip import CLIPTextEncoder, CLIPTextConfig, CLIP_L_TEXT
from anyedit_tpu.ops.resize import (
    resize_image, normalize_to_unit, denormalize_to_u8, imagenet_normalize,
)
from anyedit_tpu.schedulers import make_noise_schedule, ddim_init, ddim_step
from anyedit_tpu.diffusion import ip2p_edit, sample_inpaint


@dataclasses.dataclass
class ZooConfig:
    canvas: CanvasConfig = CanvasConfig()
    gdino: GDINOConfig = GDINO_SWINB
    sam: SAMConfig = SAM_VIT_H
    lama: LamaConfig = LAMA
    ip2p_unet: UNetConfig = SD15_IP2P_UNET
    inpaint_unet: UNetConfig = SD15_INPAINT_UNET
    vae: VAEConfig = SD_VAE
    text: CLIPTextConfig = CLIP_L_TEXT
    box_threshold: float = 0.25
    fused_diffusion_loop: bool = True   # False: per-step jit (fast compile)


def load_params(model, example_args: tuple, weight_file: Optional[Path],
                seed: int = 0):
    """msgpack checkpoint if present, else seeded random init."""
    if weight_file is not None and Path(weight_file).exists():
        from flax.serialization import msgpack_restore
        return msgpack_restore(Path(weight_file).read_bytes())
    return jax.jit(model.init)(jax.random.key(seed), *example_args)


class ModelZoo:
    """Builds jitted closures lazily — only the models a run touches compile."""

    def __init__(self, cfg: ZooConfig | None = None,
                 weights_dir: str | Path | None = None, seed: int = 0):
        self.cfg = cfg or ZooConfig()
        self.weights = Path(weights_dir) if weights_dir else None
        self.seed = seed
        self.tokenizer = SimpleVocabTokenizer()
        self._cache: dict[str, Any] = {}

    def _wf(self, name: str) -> Optional[Path]:
        return (self.weights / f"{name}.msgpack") if self.weights else None

    def _get(self, name: str, build):
        if name not in self._cache:
            self._cache[name] = build()
        return self._cache[name]

    # ---- grounding ------------------------------------------------------
    def grounder(self):
        def build():
            c = self.cfg
            gd = GroundingDINO(c.gdino)
            size = c.canvas.grounding_size
            tlen = c.gdino.max_text_len
            px = jnp.zeros((1, size, size, 3), jnp.float32)
            ids = jnp.zeros((1, tlen), jnp.int32)
            msk = jnp.zeros((1, tlen), bool)
            gd_params = load_params(gd, (px, ids, msk), self._wf("gdino"), self.seed)
            gd_fn = jax.jit(lambda px, ids, m: gd.apply(gd_params, px, ids, m))

            sam = SAM(c.sam)
            spx = jnp.zeros((1, c.sam.img_size, c.sam.img_size, 3), jnp.float32)
            sboxes = jnp.zeros((1, MAX_BOXES, 4), jnp.float32)
            sam_params = load_params(sam, (spx, sboxes), self._wf("sam"), self.seed)
            sam_enc = jax.jit(lambda px: sam.apply(sam_params, px, method=SAM.encode))
            sam_dec = jax.jit(lambda emb, b: sam.apply(sam_params, emb, b,
                                                       method=SAM.decode_boxes))

            def ground(image_u8: np.ndarray, phrase: str, mode: str = "merge",
                       count_k: int | None = None):
                h, w = image_u8.shape[:2]
                img01 = jnp.asarray(image_u8, jnp.float32) / 255.0
                det_in = imagenet_normalize(
                    resize_image(img01, size, size, "bilinear"))[None]
                caption = phrase if phrase.endswith(".") else phrase + "."
                enc = self.tokenizer.encode(caption)
                n = min(len(enc.ids), tlen)
                ids_a = np.zeros((1, tlen), np.int32)
                ids_a[0, :n] = enc.ids[:n]
                mask_a = np.zeros((1, tlen), bool)
                mask_a[0, :n] = True
                logits, boxes = gd_fn(det_in, jnp.asarray(ids_a),
                                      jnp.asarray(mask_a))
                span = phrase_token_spans(enc, caption, [phrase])[0]
                span = (span[0], span[1]) if span[1] > span[0] else (1, max(2, n - 1))
                bx, sc, keep = select_boxes(logits[0], boxes[0], span, (h, w),
                                            box_threshold=c.box_threshold)
                if not bool(np.any(np.asarray(keep))):
                    return None
                # SAM at its own bucket; boxes scaled to SAM pixel space
                sam_in = (resize_image(jnp.asarray(image_u8, jnp.float32),
                                       c.sam.img_size, c.sam.img_size,
                                       "bilinear") - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
                scale = jnp.asarray([c.sam.img_size / w, c.sam.img_size / h,
                                     c.sam.img_size / w, c.sam.img_size / h])
                emb = sam_enc(sam_in[None])
                masks, iou = sam_dec(emb, (bx * scale)[None])
                best = jnp.argmax(iou, axis=-1)                 # (N,)
                sel = masks[jnp.arange(masks.shape[0]), best]   # (N, s4, s4)
                sel = resize_image(sel[..., None].astype(jnp.float32),
                                   h, w, "bilinear")[..., 0]
                sel = jnp.where(jnp.asarray(keep)[:, None, None], sel, -1.0)
                return grounding_result(sel, bx, sc, jnp.asarray(keep),
                                        (h, w), mode, count_k)
            return ground
        return self._get("ground", build)

    # ---- inpainting -----------------------------------------------------
    def inpainter(self):
        def build():
            lama = LamaGenerator(self.cfg.lama)
            ex_img = jnp.zeros((1, 64, 64, 3), jnp.float32)
            ex_m = jnp.zeros((1, 64, 64, 1), jnp.float32)
            params = load_params(lama, (ex_img, ex_m), self._wf("lama"), self.seed)
            fn = jax.jit(lambda i, m: lama.apply(params, i, m))

            def inpaint(img01: np.ndarray, mask01: np.ndarray) -> np.ndarray:
                x, (h, w) = pad_to_modulo(jnp.asarray(img01, jnp.float32)[None], 8)
                m, _ = pad_to_modulo(jnp.asarray(mask01, jnp.float32)[None, ..., None], 8)
                out = fn(x, m)
                return np.asarray(out[0, :h, :w])
            return inpaint
        return self._get("inpaint", build)

    # ---- diffusion editors ---------------------------------------------
    def _text_encoder(self):
        def build():
            te = CLIPTextEncoder(self.cfg.text)
            ids = jnp.zeros((1, 77), jnp.int32)
            params = load_params(te, (ids,), self._wf("clip_text"), self.seed)
            fn = jax.jit(lambda ids: te.apply(params, ids))

            def encode(text: str) -> jnp.ndarray:
                enc = self.tokenizer.encode(text)
                ids_a = np.zeros((1, 77), np.int32)
                n = min(77, len(enc.ids))
                ids_a[0, :n] = enc.ids[:n]
                hidden, _ = fn(jnp.asarray(ids_a))
                return hidden
            return encode
        return self._get("text_enc", build)

    def _vae(self):
        def build():
            vae = AutoencoderKL(self.cfg.vae)
            size = self.cfg.canvas.edit_size
            px = jnp.zeros((1, size, size, 3), jnp.bfloat16)
            params = load_params(vae, (px,), self._wf("vae"), self.seed)
            enc = jax.jit(lambda p: vae.apply(params, p, method=AutoencoderKL.encode))
            dec = jax.jit(lambda z: vae.apply(params, z, method=AutoencoderKL.decode))
            return enc, dec
        return self._get("vae", build)

    def ip2p(self):
        def build():
            c = self.cfg
            unet = UNet2DCondition(c.ip2p_unet)
            hw = c.canvas.edit_size // c.canvas.latent_down
            x = jnp.zeros((3, hw, hw, c.ip2p_unet.in_channels), jnp.bfloat16)
            t = jnp.zeros((3,), jnp.int32)
            ctx = jnp.zeros((3, 77, c.ip2p_unet.context_dim), jnp.bfloat16)
            params = load_params(unet, (x, t, ctx), self._wf("unet_ip2p"), self.seed)
            ns = make_noise_schedule()
            enc, dec = self._vae()
            text = self._text_encoder()

            import functools

            @functools.partial(jax.jit, static_argnames=("steps",))
            def run_fused(params, lat, cond, uncond, mask, k, steps, s_txt, s_img):
                def eps_fn(x, t, c_):
                    return unet.apply(params, x, t, c_)
                return ip2p_edit(eps_fn, ns, lat, cond, uncond, k,
                                 num_steps=steps, guidance_scale=s_txt,
                                 image_guidance_scale=s_img, mask=mask)

            def edit(image_u8, instruction, mask01, steps=50, s_txt=8.0,
                     s_img=0.9, seed=0):
                size = c.canvas.edit_size
                img = resize_image(jnp.asarray(image_u8, jnp.float32),
                                   size, size, "lanczos")
                lat_in = enc(normalize_to_unit(img)[None].astype(jnp.bfloat16)
                             )[0] * c.vae.scaling_factor
                cond = text(instruction).astype(jnp.bfloat16)
                uncond = text("").astype(jnp.bfloat16)
                m = None
                if mask01 is not None:
                    mh = resize_image(jnp.asarray(mask01, jnp.float32)[..., None],
                                      size // c.canvas.latent_down,
                                      size // c.canvas.latent_down, "bilinear")
                    m = (mh > 0.5).astype(jnp.float32)[None]
                out = run_fused(params, lat_in, cond, uncond, m,
                                jax.random.key(seed), steps, s_txt, s_img)
                img_out = dec((out / c.vae.scaling_factor).astype(jnp.bfloat16))[0]
                u8 = denormalize_to_u8(img_out)
                h, w = image_u8.shape[:2]
                return np.asarray(resize_image(u8.astype(jnp.float32), h, w,
                                               "lanczos").astype(jnp.uint8))
            return edit
        return self._get("ip2p", build)

    # ---- AnyDoor (ControlLDM: SD UNet + ControlNet + DINOv2 cond) -------
    def anydoor(self):
        """visual_reference runner: (target, mask, collage, hf_map, ref_image)
        → edited image. ControlNet hint = collage ⊕ HF map ⊕ mask; context =
        DINOv2 reference embedding projected to the UNet context width
        (reference cldm/cldm.py:307 + ldm encoders modules.py:279)."""
        def build():
            import dataclasses as dc
            from anyedit_tpu.models.controlnet import ControlNet
            from anyedit_tpu.models.dinov2 import DinoV2, DINOV2_L
            from anyedit_tpu.schedulers import ddim_init, ddim_step
            from flax import linen as nn

            c = self.cfg
            unet_cfg = dc.replace(c.ip2p_unet, in_channels=4)
            unet = UNet2DCondition(unet_cfg)
            cn = ControlNet(unet_cfg)
            dino_cfg = DINOV2_L if self.weights else dc.replace(
                DINOV2_L, img_size=56, depth=2, dim=64, heads=2)
            dino = DinoV2(dino_cfg)

            size = c.canvas.edit_size
            hw = size // c.canvas.latent_down
            x = jnp.zeros((2, hw, hw, 4), jnp.bfloat16)
            t = jnp.zeros((2,), jnp.int32)
            ctx = jnp.zeros((2, 2, unet_cfg.context_dim), jnp.bfloat16)
            hint_size = hw * 8  # hint enters at 8x latent res (cldm convention)
            hint = jnp.zeros((2, hint_size, hint_size, 5), jnp.float32)
            up = load_params(unet, (x, t, ctx), self._wf("unet_anydoor"), self.seed)
            cp = load_params(cn, (x, t, ctx, hint), self._wf("controlnet_anydoor"),
                             self.seed)
            dpx = jnp.zeros((1, dino_cfg.img_size, dino_cfg.img_size, 3),
                            jnp.float32)
            dp = load_params(dino, (dpx,), self._wf("dinov2"), self.seed)

            class _Proj(nn.Module):
                @nn.compact
                def __call__(self, e):
                    return nn.Dense(unet_cfg.context_dim, dtype=jnp.float32)(e)

            proj = _Proj()
            pp = load_params(proj, (jnp.zeros((1, dino_cfg.dim)),),
                             self._wf("anydoor_proj"), self.seed)
            ns = make_noise_schedule()
            enc, dec = self._vae()
            import functools

            @functools.partial(jax.jit, static_argnames=("steps",))
            def sample(up, cp, lat0, ctx2, hint2, k, steps, cfg_scale):
                st = ddim_init(ns, steps)
                lat = jax.random.normal(k, lat0.shape, jnp.float32)

                def body(i, lat):
                    lat2 = jnp.concatenate([lat, lat], axis=0)
                    res, mid = cn.apply(cp, lat2, jnp.full((2,), st.timesteps[i]),
                                        ctx2, hint2)
                    eps2 = unet.apply(up, lat2, jnp.full((2,), st.timesteps[i]),
                                      ctx2, controlnet_residuals=res,
                                      controlnet_mid=mid)
                    e_c, e_u = jnp.split(eps2, 2, axis=0)
                    eps = e_u + cfg_scale * (e_c - e_u)
                    return ddim_step(ns, st, i, eps, lat)

                return jax.lax.fori_loop(0, steps, body, lat)

            def run(target_u8, mask, collage_u8, hf_map, ref_u8,
                    steps: int = 50, cfg_scale: float = 9.0, seed: int = 0):
                ref = resize_image(jnp.asarray(ref_u8, jnp.float32) / 255.0,
                                   dino_cfg.img_size, dino_cfg.img_size,
                                   "bilinear")
                ref = imagenet_normalize(ref)[None]
                demb = dino.apply(dp, ref)["cls"]
                ctx1 = proj.apply(pp, demb)[:, None, :]           # (1,1,C)
                ctx1 = jnp.tile(ctx1, (1, 2, 1)).astype(jnp.bfloat16)
                ctx2 = jnp.concatenate([ctx1, jnp.zeros_like(ctx1)], axis=0)
                col = resize_image(jnp.asarray(collage_u8, jnp.float32) / 255.0,
                                   hint_size, hint_size, "bilinear")
                hfm = resize_image(jnp.asarray(hf_map, jnp.float32)[..., None],
                                   hint_size, hint_size, "bilinear")
                mk = resize_image(jnp.asarray(mask, jnp.float32)[..., None],
                                  hint_size, hint_size, "nearest")
                hint1 = jnp.concatenate([col, hfm / 255.0, mk], axis=-1)[None]
                hint2 = jnp.concatenate([hint1, hint1], axis=0)
                img = resize_image(jnp.asarray(target_u8, jnp.float32),
                                   size, size, "lanczos")
                lat0 = enc(normalize_to_unit(img)[None].astype(jnp.bfloat16)
                           )[0] * c.vae.scaling_factor
                out = sample(up, cp, lat0, ctx2, hint2, jax.random.key(seed),
                             steps, cfg_scale)
                dec_img = dec((out / c.vae.scaling_factor).astype(jnp.bfloat16))[0]
                u8 = denormalize_to_u8(dec_img)
                h0, w0 = target_u8.shape[:2]
                full = resize_image(u8.astype(jnp.float32), h0, w0, "lanczos")
                # paste only the masked region back onto the target (crop_back,
                # visual_reference_tool.py:143-165)
                m = jnp.asarray(mask, jnp.float32)[..., None]
                out_img = full * m + jnp.asarray(target_u8, jnp.float32) * (1 - m)
                return np.asarray(jnp.clip(out_img, 0, 255).astype(jnp.uint8))

            return run
        return self._get("anydoor", build)

    # ---- P2P pair generation (implicit_change stage 1) ------------------
    def p2p_pair(self):
        """(ori_caption, tar_caption, keyword, seed) → (ori_img, tar_img,
        keyword_mask): SD text2img of both captions from one shared start
        latent with an AttentionStore; `mask_from_ca` on the keyword token
        localizes the change (implicit_tool.py:76-127 stage 1)."""
        def build():
            import dataclasses as dc
            from anyedit_tpu.diffusion.processors import AttentionStore, mask_from_ca
            from anyedit_tpu.schedulers import ddim_init, ddim_step
            import functools

            c = self.cfg
            unet_cfg = dc.replace(c.ip2p_unet, in_channels=4)
            unet = UNet2DCondition(unet_cfg)
            hw = c.canvas.edit_size // c.canvas.latent_down
            x = jnp.zeros((4, hw, hw, 4), jnp.bfloat16)
            t = jnp.zeros((4,), jnp.int32)
            ctx0 = jnp.zeros((4, 77, unet_cfg.context_dim), jnp.bfloat16)
            params = load_params(unet, (x, t, ctx0), self._wf("unet_sd"), self.seed)
            ns = make_noise_schedule()
            enc_text = self._text_encoder()
            _, dec = self._vae()
            store = AttentionStore(max_hw=(hw // 2) ** 2)

            @functools.partial(jax.jit, static_argnames=("steps",))
            def sample_pair(params, ctx4, k, steps, cfg_scale):
                st = ddim_init(ns, steps)
                z0 = jax.random.normal(k, (1, hw, hw, 4), jnp.float32)
                lat = jnp.concatenate([z0, z0], axis=0)

                def body(i, carry):
                    lat, acc = carry
                    store.reset()
                    lat4 = jnp.concatenate([lat, lat], axis=0)
                    eps4 = unet.apply(params, lat4,
                                      jnp.full((4,), st.timesteps[i]), ctx4,
                                      processor=store.processor())
                    maps = store.collect()
                    # accumulate the largest captured cross-attn map
                    best = max(maps, key=lambda n: maps[n].shape[1])
                    acc = acc + maps[best][2:4]      # cond rows only
                    e_u, e_c = jnp.split(eps4, 2, axis=0)
                    eps = e_u + cfg_scale * (e_c - e_u)
                    return ddim_step(ns, st, i, eps, lat), acc

                # trace once to find the accumulator shape
                store.reset()
                _ = unet.apply(params, jnp.concatenate([lat, lat], 0),
                               jnp.zeros((4,), jnp.int32), ctx4,
                               processor=store.processor())
                maps = store.collect()
                best = max(maps, key=lambda n: maps[n].shape[1])
                acc0 = jnp.zeros((2,) + maps[best].shape[1:], jnp.float32)
                lat, acc = jax.lax.fori_loop(0, steps, body, (lat, acc0))
                return lat, acc

            def run(ori_caption, tar_caption, keyword, seed, steps: int = 20,
                    cfg_scale: float = 7.5):
                un = enc_text("").astype(jnp.bfloat16)
                co = enc_text(ori_caption).astype(jnp.bfloat16)
                ct = enc_text(tar_caption).astype(jnp.bfloat16)
                ctx4 = jnp.concatenate([un, un, co, ct], axis=0)
                lat, acc = sample_pair(params, ctx4, jax.random.key(seed),
                                       steps, cfg_scale)
                imgs = dec((lat / c.vae.scaling_factor).astype(jnp.bfloat16))
                u8 = np.asarray(denormalize_to_u8(imgs))
                # keyword token position in the tar caption
                enc = self.tokenizer.encode(tar_caption)
                from anyedit_tpu.grounding.text import phrase_token_spans
                span = phrase_token_spans(enc, tar_caption, [keyword])[0]
                tok = span[0] if span[1] > span[0] else 1
                ca_hw = int(np.sqrt(acc.shape[1]))
                mask = mask_from_ca(acc[1:2] / max(1, steps), min(tok, acc.shape[-1] - 1),
                                    ca_hw)
                mask_full = resize_image(
                    jnp.asarray(mask[0], jnp.float32)[..., None],
                    c.canvas.edit_size, c.canvas.edit_size, "nearest")[..., 0]
                return u8[0], u8[1], np.asarray(mask_full > 0.5)
            return run
        return self._get("p2p_pair", build)

    # ---- assembled toolbox ---------------------------------------------
    def toolbox(self, with_diffusion: bool = True,
                with_anydoor: bool = False,
                with_implicit: bool = False) -> Toolbox:
        tb = Toolbox(ground=self.grounder(), inpaint=self.inpainter())
        if with_diffusion:
            tb.ip2p = self.ip2p()
        if with_anydoor:
            tb.extra["anydoor"] = self.anydoor()
        if with_implicit:
            tb.extra["p2p_pair"] = self.p2p_pair()
        return tb
