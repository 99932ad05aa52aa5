"""Chained timing of UNet components at SD1.5 B=24 512px shapes."""
import time
import numpy as np
import jax, jax.numpy as jnp
import math

def sync(x): return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))

def timeit_chain(f, x0, n_it=20):
    x = f(x0); sync(x)
    x = x0
    t0 = time.perf_counter()
    for _ in range(n_it):
        x = f(x)
    sync(x)
    return (time.perf_counter() - t0)/n_it*1e3

B = 24
from anyedit_tpu.ops.attention import attention

# --- self-attention per level: (lvl, hw, heads, d, blocks_count)
# SD1.5: levels 64(320ch,8h,d40), 32(640,8h,d80), 16(1280,8h,d160); mid 8(1280)
# transformer blocks: down 2 per attn level, up 3 per level, mid 1 => self+cross each
cfgs = [(64, 8, 40, 5), (32, 8, 80, 5), (16, 8, 160, 5), (8, 8, 160, 1)]
tot_self = tot_cross = 0.0
for hw, h, d, nblk in cfgs:
    l = hw*hw
    q = jax.random.normal(jax.random.key(0), (B, h, l, d), jnp.bfloat16)
    f = jax.jit(lambda q: attention(q, q, q, use_flash=True))
    def g(x):
        o = f(x)
        return (o + 1.0).astype(jnp.bfloat16)
    ms = timeit_chain(g, q)
    tot_self += ms*nblk
    print(f"self  hw={hw} h={h} d={d} x{nblk}: {ms:.2f} ms each -> {ms*nblk:.1f}")
    kv = jax.random.normal(jax.random.key(1), (B, h, 77, d), jnp.bfloat16)
    fc = jax.jit(lambda q, kv: attention(q, kv, kv, use_flash=True))
    def gc(x):
        o = fc(x, kv)
        return (o + 1.0).astype(jnp.bfloat16)
    ms = timeit_chain(gc, q)
    tot_cross += ms*nblk
    print(f"cross hw={hw} h={h} d={d} x{nblk}: {ms:.2f} ms each -> {ms*nblk:.1f}")
print("total self:", round(tot_self,1), " total cross:", round(tot_cross,1))

# --- conv3x3 at level0: 320ch 64x64
from flax import linen as nn
conv = nn.Conv(320, (3,3), dtype=jnp.bfloat16)
x0 = jax.random.normal(jax.random.key(2), (B, 64, 64, 320), jnp.bfloat16)
cp = conv.init(jax.random.key(3), x0)
fcv = jax.jit(lambda x: conv.apply(cp, x))
print("conv3x3 320->320 @64:", round(timeit_chain(lambda x: fcv(x).astype(jnp.bfloat16), x0),2), "ms")

# groupnorm at level0
from anyedit_tpu.ops.groupnorm import group_norm_ref
sc = jnp.ones(320); bi = jnp.zeros(320)
fgn = jax.jit(lambda x: group_norm_ref(x, sc, bi, num_groups=32, silu=True))
print("groupnorm+silu @64x320:", round(timeit_chain(lambda x: fgn(x).astype(jnp.bfloat16), x0),2), "ms")
