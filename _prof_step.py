import time
import numpy as np
import jax, jax.numpy as jnp

from anyedit_tpu.models.unet_sd import UNet2DCondition, SD15_IP2P_UNET
from anyedit_tpu.models.vae import AutoencoderKL, SD_VAE

key = jax.random.key(0)
n = 8
unet = UNet2DCondition(SD15_IP2P_UNET)
xs = jax.random.normal(key, (3*n, 64, 64, 8), jnp.bfloat16)
ts = jnp.zeros((3*n,), jnp.int32)
ctx3 = jax.random.normal(key, (3*n, 77, 768), jnp.bfloat16)
params = jax.jit(unet.init)(key, xs, ts, ctx3)

def sync(x):
    return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))

def timeit_chain(f, x0, n_it=20):
    # x_{i+1} = g(x_i): chain data-dependently, sync at end via readback
    x = x0
    x = f(x); sync(x)   # compile
    x = x0
    t0 = time.perf_counter()
    for _ in range(n_it):
        x = f(x)
    sync(x)
    return (time.perf_counter() - t0)/n_it*1e3

# UNet fwd chained: feed eps back into x (shapes: out 4ch, in 8ch -> tile)
fwd = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c))
def g(x):
    eps = fwd(params, x, ts, ctx3)
    return jnp.concatenate([eps, eps], axis=-1).astype(jnp.bfloat16)
ms = timeit_chain(g, xs)
print("UNet fwd B=24 (chained):", round(ms,1), "ms")
co = fwd.lower(params, xs, ts, ctx3).compile()
ca = co.cost_analysis()
fl = ca.get("flops", 0)
print("flops:", f"{fl/1e12:.2f} TF", "=> achieved", round(fl/ms/1e9,1), "TFLOP/s")
print("bytes:", f"{ca.get('bytes accessed', 0)/1e9:.2f} GB", "=>", round(ca.get('bytes accessed',0)/ms/1e6,1), "GB/s")

pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
def gbf(x):
    eps = fwd(pbf, x, ts, ctx3)
    return jnp.concatenate([eps, eps], axis=-1).astype(jnp.bfloat16)
print("UNet fwd bf16 params (chained):", round(timeit_chain(gbf, xs),1), "ms")

# VAE chained
vae = AutoencoderKL(SD_VAE)
px = jax.random.normal(jax.random.fold_in(key,2), (n,512,512,3), jnp.bfloat16)
vp = jax.jit(vae.init)(jax.random.fold_in(key,1), px)
encdec = jax.jit(lambda p, x: vae.apply(p, (vae.apply(p, x, method=AutoencoderKL.encode)[0]).astype(jnp.bfloat16), method=AutoencoderKL.decode))
def gv(x):
    return encdec(vp, x).astype(jnp.bfloat16)
print("VAE enc+dec (chained):", round(timeit_chain(gv, px, n_it=10),1), "ms")
