import time
import jax, jax.numpy as jnp, numpy as np
rng = np.random.default_rng(0)
N = 404*4224
x = jnp.asarray(rng.normal(size=(N, 512)), jnp.bfloat16)

@jax.jit
def f(x):
    return jax.nn.gelu(x, approximate=False)

r = f(x); r.block_until_ready()
# sync per call, vary input to defeat any caching
t0 = time.perf_counter()
for i in range(5):
    r = f(x + jnp.bfloat16(i))
    r.block_until_ready()
print(f"gelu sync w/ varying input: {(time.perf_counter()-t0)/5*1000:.2f} ms", flush=True)

@jax.jit
def g(x):
    return (x + 1.0).sum()   # force full read
r = g(x); r.block_until_ready()
t0 = time.perf_counter()
for i in range(5):
    g(x + jnp.bfloat16(i)).block_until_ready()
print(f"add+sum sync: {(time.perf_counter()-t0)/5*1000:.2f} ms", flush=True)
