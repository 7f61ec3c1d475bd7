"""Tile-size sweep for the whole-block megakernel at stage-1 shapes.

Separates grid-step overhead from streaming cost: if ms/iter tracks step
count rather than bytes, the kernel is overhead-bound and wants fatter
tiles.  ``python -m tools.bench_block_tile``
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.ops import block_fused

B, N, D, H, M, HID = 101, 4224, 64, 1, 192, 512
rng = np.random.default_rng(0)
mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.bfloat16)
x = jnp.pad(jnp.asarray(rng.normal(size=(B, N, D)) * 0.1, jnp.bfloat16),
            ((0, 0), (0, 0), (0, 64)))
k = mk(B, H, M, 64)
v = mk(B, H, M, 64)
f32 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
args = (f32(D) + 1.0, f32(D), f32(D, D), f32(D), f32(D, D), f32(D),
        f32(D) + 1.0, f32(D), f32(D, HID), f32(HID), f32(HID, D), f32(D))

for mb in (4, 6, 8, 10, 13, 15):
    block_fused._VMEM_BUDGET = mb * 1024 * 1024
    jax.clear_caches()
    try:
        fn = jax.jit(lambda x, k, v: block_fused.fused_block(
            x, k, v, *args, scale=0.125, eps1=1e-6, eps2=1e-6,
            num_heads=H, dim=D))
        out = fn(x, k, v)
        out.block_until_ready()
        t0 = time.perf_counter()
        outs = [fn(x, k, v) for _ in range(30)]
        jax.block_until_ready(outs[-1])
        dt = (time.perf_counter() - t0) / 30 * 1000
        fixed = (2 * 128 * 128 + 2 * 128 * 512 + 2 * 1 * 256 * 128) * 2
        per_row = 256 * 4 + 128 * 4 + 128 * 26 + 512 * 6
        cap = max(64, (mb * 1024 * 1024 - fixed) // per_row // 16 * 16)
        nt = max(1, -(-N // cap))
        print(f"budget {mb:2d}MB (~{nt} tiles/batch, {B*nt} steps): "
              f"{dt:.2f} ms/iter", flush=True)
    except Exception as e:  # VMEM overflow at the fat end is informative
        print(f"budget {mb:2d}MB: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
