"""Stage-4-shape sweep for the whole-block kernel: VMEM budget vs tile.

Stage 4 (d=512, h=8, hid=2048) carries ~7.3 MB of fixed weight blocks, so
the 13 MB budget leaves only ~96-row tiles (grid 202 steps at B=101).
Sweeps the budget to see whether fatter tiles (fewer steps) pay at these
shapes.  ``python -m tools.probes.bench_block_s4``
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.ops import block_fused

B, N, D, H, M, HID = 101, 192, 512, 8, 192, 2048
rng = np.random.default_rng(0)
mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.bfloat16)
x = mk(B, N, D)
k = mk(B, H, M, 64)
v = mk(B, H, M, 64)
f32 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
args = (f32(D) + 1.0, f32(D), f32(D, D), f32(D), f32(D, D), f32(D),
        f32(D) + 1.0, f32(D), f32(D, HID), f32(HID), f32(HID, D), f32(D))

NBUF = 8
xs = jnp.stack([mk(B, N, D) for _ in range(NBUF)])

for mb in (13, 15, 16, 20):
    block_fused._VMEM_BUDGET = mb * 1024 * 1024

    @jax.jit
    def scanned(xs):
        def step(acc, xb):
            out = block_fused.fused_block(
                xb, k, v, *args, scale=0.125, eps1=1e-6, eps2=1e-6,
                num_heads=H)
            return acc + out[0, 0, :8].astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), xs)
        return acc

    np.asarray(scanned(xs))
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(scanned(xs))
        dt = min(dt, time.perf_counter() - t0)
    print(f"budget {mb:2d}MB: {dt / NBUF * 1000:.3f} ms/block", flush=True)
