"""Factory stage benchmark — per-model throughput on the local chip.

Measures the grounding front door (GroundingDINO SwinB @ 384px + SAM ViT-H
@ 1024px) and the LaMa inpainter with fenced, data-dependent chained timing
(the only airtight method on tunneled backends — see bench.py). Random
weights; throughput is weight-independent.

Usage: python tools/bench_stages.py [batch]
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


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rows = []

    # GroundingDINO SwinB @ 384 (the canonical grounding bucket)
    from anyedit_tpu.models.gdino import GroundingDINO, GDINO_SWINB
    import dataclasses
    cfg = GDINO_SWINB
    m = GroundingDINO(cfg)
    px = jax.random.normal(jax.random.key(0), (b, 384, 384, 3), jnp.float32)
    ids = jnp.zeros((b, cfg.max_text_len), jnp.int32)
    mask = jnp.ones((b, cfg.max_text_len), bool)
    params = jax.jit(m.init)(jax.random.key(0), px, ids, mask)
    fwd = jax.jit(lambda x: m.apply(params, x, ids, mask)[1])

    def g(x):
        boxes = fwd(x)
        # feed box stats back into pixels → data-dependent chain
        return x + jnp.mean(boxes).astype(x.dtype) * 0e-9 + \
            jnp.sum(boxes[0, 0]) * 1e-12

    ms = chain(g, px)
    rows.append(("gdino_swinb_384", b, ms, b / ms * 1000))

    # SAM ViT-H encoder @ 1024 (once per image) + box decode
    from anyedit_tpu.models.sam import SAM, SAM_VIT_H
    sm = SAM(SAM_VIT_H)
    spx = jax.random.normal(jax.random.key(1), (1, 1024, 1024, 3), jnp.float32)
    boxes = jnp.asarray([[[100.0, 100.0, 600.0, 600.0]]])
    sp = jax.jit(sm.init)(jax.random.key(0), spx, boxes)
    enc = jax.jit(lambda x: sm.apply(sp, x, method=SAM.encode))

    def gs(x):
        e = enc(x)
        return x + jnp.mean(e).astype(x.dtype) * 1e-12

    ms = chain(gs, spx, n_it=5)
    rows.append(("sam_vith_encode_1024", 1, ms, 1000 / ms))

    emb = sm.apply(sp, spx, method=SAM.encode)
    dec = jax.jit(lambda e: sm.apply(sp, e, boxes, method=SAM.decode_boxes)[0])

    def gd(e):
        mk = dec(e)
        return e + jnp.mean(mk).astype(e.dtype) * 1e-12

    ms = chain(gd, emb, n_it=10)
    rows.append(("sam_decode_per_box", 1, ms, 1000 / ms))

    # LaMa @ 512 (the remove/erase inpainter)
    from anyedit_tpu.models.lama import LaMa, BIG_LAMA
    lm = LaMa(BIG_LAMA)
    lpx = jax.random.normal(jax.random.key(2), (b, 512, 512, 4), jnp.float32)
    lp = jax.jit(lm.init)(jax.random.key(0), lpx)
    lf = jax.jit(lambda x: lm.apply(lp, x))

    def gl(x):
        o = lf(x)
        return jnp.concatenate([o, x[..., 3:]], axis=-1)

    ms = chain(gl, lpx, n_it=5)
    rows.append(("lama_512", b, ms, b / ms * 1000))

    print(f"{'stage':24} {'batch':>5} {'ms/call':>9} {'items/s':>9}")
    for name, bb, ms, ips in rows:
        print(f"{name:24} {bb:>5} {ms:>9.1f} {ips:>9.1f}")


if __name__ == "__main__":
    main()
