import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(404*4224, 512)), jnp.bfloat16)  # stage-1 hidden

def t(f, tag):
    g = jax.jit(f)
    g(x).block_until_ready()
    t0 = time.perf_counter()
    outs = [g(x) for _ in range(10)]
    jax.block_until_ready(outs[-1])
    print(f"{tag}: {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)

t(lambda x: x + 1.0, "copy+add (pure BW)")
t(lambda x: jax.nn.gelu(x, approximate=False), "gelu erf bf16")
t(lambda x: jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(jnp.bfloat16), "gelu erf fp32")
t(lambda x: jax.nn.gelu(x, approximate=True), "gelu tanh bf16")
t(lambda x: jnp.exp(x), "exp bf16")
t(lambda x: x * jax.nn.sigmoid(1.702 * x), "sigmoid-gelu bf16")
def poly_gelu(x):
    # clipped odd polynomial fit of gelu', used as x*P(x^2) form... quick test: cheap poly
    xf = x
    x2 = xf * xf
    inner = xf * (0.7978845608 + 0.0356774081 * x2)   # tanh-arg
    # tanh via rational approx
    a = inner * inner
    th = inner * (27.0 + a) / (27.0 + 9.0 * a)        # pade tanh approx
    th = jnp.clip(th, -1.0, 1.0)
    return 0.5 * xf * (1.0 + th)
t(poly_gelu, "pade-tanh gelu bf16")
