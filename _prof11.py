import time, numpy as np, jax, jax.numpy as jnp
from haghighatshoarmuir2024_tpu.ops.fir import fir_filter
from haghighatshoarmuir2024_tpu.ops.stht import stht_kernel
kernel = jnp.asarray(stht_kernel(480), dtype=jnp.float32)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((64, 12000, 7)).astype(np.float32))
for m in ("fft", "direct"):
    f = jax.jit(lambda x, m=m: fir_filter(kernel, x, axis=1, method=m))
    y = f(x); y.block_until_ready()
    t0=time.time()
    for _ in range(10): y=f(x)
    y.block_until_ready(); print(f"stht fir {m}: {(time.time()-t0)/10*1000:.2f} ms", flush=True)
