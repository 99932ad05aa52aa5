"""Factory stage benchmark — per-model throughput on the local chip.

Measures the grounding front door (GroundingDINO SwinB @ 384px + SAM ViT-H
@ 1024px) and the LaMa inpainter with fenced, data-dependent chained timing
(the only airtight method on tunneled backends — see bench.py). Random
weights; throughput is weight-independent.

Stages run SAM/LaMa first and print incrementally. The full 900-query
GroundingDINO program exceeds this environment's tunneled remote-compile
service (the compile hangs) — it only runs with `--all` and is expected
to work on a directly-attached TPU host.

Usage: python tools/bench_stages.py [batch] [--all]
"""

import sys
import time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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
        print(f"[{name}] SKIPPED: {type(e).__name__}", file=sys.stderr)
    if rows:
        n, bb, ms, ips = rows[-1]
        print(f"{n:24} {bb:>5} {ms:>9.1f} {ips:>9.1f}", flush=True)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rows = []

    # GroundingDINO SwinB @ 384 (the canonical grounding bucket)
    def run_gdino():
        from anyedit_tpu.models.gdino import GroundingDINO, GDINO_SWINB
        cfg = GDINO_SWINB
        m = GroundingDINO(cfg)
        px = jax.random.normal(jax.random.key(0), (b, 384, 384, 3),
                               jnp.float32)
        ids = jnp.zeros((b, cfg.max_text_len), jnp.int32)
        mask = jnp.ones((b, cfg.max_text_len), bool)
        params = jax.jit(m.init)(jax.random.key(0), px, ids, mask)
        fwd = jax.jit(lambda x: m.apply(params, x, ids, mask)[1])

        def g(x):
            boxes = fwd(x)
            return x + jnp.sum(boxes[0, 0]) * 1e-12

        ms = chain(g, px)
        return ("gdino_swinb_384", b, ms, b / ms * 1000)

    # SAM ViT-H encoder @ 1024 (once per image) + box decode
    def run_sam():
        from anyedit_tpu.models.sam import SAM, SAM_VIT_H
        sm = SAM(SAM_VIT_H)
        spx = jax.random.normal(jax.random.key(1), (1, 1024, 1024, 3),
                                jnp.float32)
        boxes = jnp.asarray([[[100.0, 100.0, 600.0, 600.0]]])
        sp = jax.jit(sm.init)(jax.random.key(0), spx, boxes)
        enc = jax.jit(lambda x: sm.apply(sp, x, method=SAM.encode))

        def gs(x):
            e = enc(x)
            return x + jnp.mean(e).astype(x.dtype) * 1e-12

        ms = chain(gs, spx, n_it=5)
        rows.append(("sam_vith_encode_1024", 1, ms, 1000 / ms))
        emb = sm.apply(sp, spx, method=SAM.encode)
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

    print(f"{'stage':24} {'batch':>5} {'ms/call':>9} {'items/s':>9}",
          flush=True)
    stage(rows, "lama_512", run_lama)
    if "--all" in sys.argv:
        # the ViT-H @1024 and 900-query GDINO programs exceed the tunneled
        # remote-compile service in this environment; run on a direct host
        stage(rows, "sam_vith_1024", run_sam)
        stage(rows, "gdino_swinb_384", run_gdino)


if __name__ == "__main__":
    main()
