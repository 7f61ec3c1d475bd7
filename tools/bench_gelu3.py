import time
import jax, jax.numpy as jnp, numpy as np
rng = np.random.default_rng(0)
N = 404*4224
ys = [jnp.asarray(rng.normal(size=(N, 512)), jnp.bfloat16) for _ in range(3)]

def timeit(fn, tag):
    f = jax.jit(fn)
    f(ys[0]).block_until_ready()
    t0 = time.perf_counter()
    for i in range(6):
        f(ys[i % 3]).block_until_ready()
    print(f"{tag}: {(time.perf_counter()-t0)/6*1000:.2f} ms", flush=True)

timeit(lambda x: x + 1.0, "add (materialized)")
timeit(lambda x: jax.nn.gelu(x, approximate=False), "gelu erf")
timeit(lambda x: jnp.exp(x), "exp")
timeit(lambda x: jnp.maximum(x, 0), "relu")
