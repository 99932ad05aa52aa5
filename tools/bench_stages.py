"""Factory stage benchmark — per-model throughput on the local chip.

Measures the grounding front door at PRODUCTION shapes — GroundingDINO
SwinB 900 queries @ 800px (reference tool.py:91-102 RandomResize(800))
and SAM ViT-H @ 1024 (predictor.py:34,169) — plus the LaMa inpainter,
with fenced, data-dependent chained timing (the only airtight method on
tunneled backends — see bench.py). Random weights; throughput is
weight-independent.

The monolithic 900-query GDINO / ViT-H@1024 programs exceed this
environment's tunneled remote-compile service, so both run through their
per-stage compile units (`make_gdino_stepwise` / `make_encode_stepwise`)
— numerically identical (tests/test_gdino.py, tests/test_sam.py), 6 and
4 small programs respectively, one compile per layer KIND.

Usage: python tools/bench_stages.py [batch] [--all]
"""

import sys
import time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from anyedit_tpu.core.cache import enable_persistent_cache
enable_persistent_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def sync(x):
    return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))


def chain(f, x0, n_it=10):
    x = f(x0); sync(x)
    x = x0
    t0 = time.perf_counter()
    for _ in range(n_it):
        x = f(x)
    sync(x)
    return (time.perf_counter() - t0) / n_it * 1e3


def stage(rows, name, fn):
    try:
        rows.append(fn())
    except Exception as e:
        rows.append((name, 0, float("nan"), float("nan")))
        print(f"[{name}] SKIPPED: {type(e).__name__}: {e}", file=sys.stderr)
    n, bb, ms, ips = rows[-1]
    print(f"{n:28} {bb:>5} {ms:>9.1f} {ips:>9.2f}", flush=True)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4
    rows = []

    # GroundingDINO SwinB @ PRODUCTION 800px / 900 queries, stepwise units
    def run_gdino_800():
        from anyedit_tpu.models.gdino import (
            GroundingDINO, GDINO_SWINB, make_gdino_stepwise)
        cfg = GDINO_SWINB
        m = GroundingDINO(cfg)
        px = jax.random.normal(jax.random.key(0), (1, 800, 800, 3),
                               jnp.float32)
        ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
        ids = ids.at[0, 0].set(101).at[0, 1].set(2054).at[0, 2].set(1012)
        mask = jnp.zeros((1, cfg.max_text_len), bool).at[0, :4].set(True)
        params = jax.eval_shape(lambda: m.init(jax.random.key(0), px, ids,
                                               mask))
        rng = np.random.default_rng(0)
        params = jax.tree.map(
            lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape)
                                  .astype(np.float32), dtype=s.dtype), params)
        fwd = make_gdino_stepwise(cfg)

        def g(x):
            logits, boxes = fwd(params, x, ids, mask)
            return x + jnp.sum(boxes[0, 0]).astype(x.dtype) * 1e-12

        ms = chain(g, px, n_it=5)
        return ("gdino_swinb_900q_800px", 1, ms, 1000 / ms)

    # SAM ViT-H encoder @ 1024 (once per image) via stepwise units
    def run_sam():
        from anyedit_tpu.models.sam import SAM, SAM_VIT_H, make_encode_stepwise
        sm = SAM(SAM_VIT_H)
        spx = jax.random.normal(jax.random.key(1), (1, 1024, 1024, 3),
                                jnp.float32)
        boxes = jnp.asarray([[[100.0, 100.0, 600.0, 600.0]]])
        shapes = jax.eval_shape(lambda: sm.init(jax.random.key(0), spx,
                                                boxes))
        rng = np.random.default_rng(1)
        sp = jax.tree.map(
            lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape)
                                  .astype(np.float32), dtype=s.dtype), shapes)
        enc = make_encode_stepwise(SAM_VIT_H)

        def gs(x):
            e = enc(sp, x)
            return x + jnp.mean(e).astype(x.dtype) * 1e-12

        ms = chain(gs, spx, n_it=5)
        print(f"{'sam_vith_encode_1024':28} {1:>5} {ms:>9.1f} "
              f"{1000 / ms:>9.2f}", flush=True)
        rows.append(("sam_vith_encode_1024", 1, ms, 1000 / ms))
        emb = enc(sp, spx)
        dec = jax.jit(lambda e: sm.apply(sp, e, boxes,
                                         method=SAM.decode_boxes)[0])

        def gd(e):
            mk = dec(e)
            return e + jnp.mean(mk).astype(e.dtype) * 1e-12

        ms = chain(gd, emb, n_it=10)
        return ("sam_decode_per_box", 1, ms, 1000 / ms)

    # LaMa @ 512 (the remove/erase inpainter)
    def run_lama():
        from anyedit_tpu.models.lama import LamaGenerator, BIG_LAMA
        lm = LamaGenerator(BIG_LAMA)
        lpx = jax.random.normal(jax.random.key(2), (b, 512, 512, 3),
                                jnp.float32)
        msk = jnp.zeros((b, 512, 512, 1), jnp.float32).at[:, 128:384,
                                                          128:384].set(1.0)
        lp = jax.jit(lm.init)(jax.random.key(0), lpx, msk)
        lf = jax.jit(lambda x: lm.apply(lp, x, msk))

        def gl(x):
            return lf(x)

        ms = chain(gl, lpx, n_it=5)
        return ("lama_512", b, ms, b / ms * 1000)

    print(f"{'stage':28} {'batch':>5} {'ms/call':>9} {'items/s':>9}",
          flush=True)
    stage(rows, "lama_512", run_lama)
    if "--all" in sys.argv:
        stage(rows, "sam_vith_1024", run_sam)
        stage(rows, "gdino_900q_800px", run_gdino_800)


if __name__ == "__main__":
    main()
