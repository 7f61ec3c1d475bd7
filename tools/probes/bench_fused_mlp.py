"""Standalone: fused LN-MLP kernel vs XLA on stage shapes, correctness + speed."""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from mvlt_tpu.ops.fused_mlp import fused_ln_mlp

rng = np.random.default_rng(0)
B = 404
for (n, d, ratio) in [(4224, 64, 8), (1152, 128, 8), (384, 320, 4), (192, 512, 4)]:
    h = d * ratio
    x = jnp.asarray(rng.normal(size=(B, n, d)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(d,)), jnp.float32) * 0.1 + 1
    be = jnp.asarray(rng.normal(size=(d,)), jnp.float32) * 0.1
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, d)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32)

    @jax.jit
    def xla_ref(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True); var = xf.var(-1, keepdims=True)
        nrm = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + be).astype(x.dtype)
        hdn = jax.nn.gelu((nrm @ w1).astype(jnp.float32) + b1, approximate=False).astype(x.dtype)
        return (xf + ((hdn @ w2).astype(jnp.float32) + b2)).astype(x.dtype)

    fused = jax.jit(lambda x: fused_ln_mlp(x, g, be, w1, b1, w2, b2, eps=1e-6))
    a = xla_ref(x); bb = fused(x)
    err = float(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32)).max())
    def t(f):
        f(x).block_until_ready()
        t0 = time.perf_counter()
        outs = [f(x) for _ in range(10)]
        jax.block_until_ready(outs[-1]); return (time.perf_counter()-t0)/10*1000
    print(f"n={n} d={d}: err={err:.3e}  xla={t(xla_ref):.2f}ms  fused={t(fused):.2f}ms", flush=True)
