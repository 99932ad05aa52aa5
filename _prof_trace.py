import time
import numpy as np
import jax, jax.numpy as jnp

def sync(x): return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))

# dispatch overhead calibration: trivial chained op
x = jnp.ones((8, 128), jnp.float32)
f = jax.jit(lambda x: x + 1.0)
sync(f(x))
t0 = time.perf_counter()
y = x
for _ in range(100):
    y = f(y)
sync(y)
print("dispatch+trivial op:", round((time.perf_counter()-t0)/100*1e3, 3), "ms")

# try profiler trace on one UNet fwd
from anyedit_tpu.models.unet_sd import UNet2DCondition, SD15_IP2P_UNET
key = jax.random.key(0)
n = 8
unet = UNet2DCondition(SD15_IP2P_UNET)
xs = jax.random.normal(key, (3*n, 64, 64, 8), jnp.bfloat16)
ts = jnp.zeros((3*n,), jnp.int32)
ctx3 = jax.random.normal(key, (3*n, 77, 768), jnp.bfloat16)
params = jax.jit(unet.init)(key, xs, ts, ctx3)
fwd = jax.jit(lambda x: unet.apply(params, x, ts, ctx3))
sync(fwd(xs))
try:
    with jax.profiler.trace("/tmp/jaxtrace"):
        o = fwd(xs)
        sync(o)
    print("trace written")
except Exception as e:
    print("trace failed:", e)
