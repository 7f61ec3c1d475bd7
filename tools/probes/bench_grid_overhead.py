"""Per-grid-step overhead of the whole-block kernel at stage-1 shapes.

Same total work, varying tile count via the VMEM budget; ms/iter vs step
count fits the per-step cost.  Chained-carry scan (out feeds the next
iteration's input) prevents XLA from hoisting the kernel, and the slope
between two in-jit repetition counts cancels the 40-65 ms fixed tunnel
dispatch cost (CLAUDE.md).  ``python -m tools.probes.bench_grid_overhead``
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
x0 = jnp.pad(jnp.asarray(rng.normal(size=(B, N, D)) * 0.02, jnp.bfloat16),
             ((0, 0), (0, 0), (0, 64)))
k = mk(B, H, M, 64)
v = mk(B, H, M, 64)
f32 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
args = (f32(D) + 1.0, f32(D), f32(D, D), f32(D), f32(D, D), f32(D),
        f32(D) + 1.0, f32(D), f32(D, HID), f32(HID), f32(HID, D), f32(D))

R_LO, R_HI = 4, 12


def bench(mb):
    block_fused._VMEM_BUDGET = mb * 1024 * 1024
    jax.clear_caches()

    def make(reps):
        @jax.jit
        def run(x):
            def step(xc, _):
                out = block_fused.fused_block(
                    xc, k, v, *args, scale=0.125, eps1=1e-6, eps2=1e-6,
                    num_heads=H, dim=D)
                return out, None
            return jax.lax.scan(step, x, None, length=reps)[0]
        return run

    lo, hi = make(R_LO), make(R_HI)
    np.asarray(jnp.sum(lo(x0)))
    np.asarray(jnp.sum(hi(x0)))

    def best(fn):
        dt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(fn(x0)))
            dt = min(dt, time.perf_counter() - t0)
        return dt

    dt = (best(hi) - best(lo)) / (R_HI - R_LO) * 1000
    fixed = (2 * 128 * 128 + 2 * 128 * 512 + 2 * 1 * 256 * 128) * 2
    per_row = 256 * 4 + 128 * 4 + 128 * 26 + 512 * 6
    cap = max(64, (mb * 1024 * 1024 - fixed) // per_row // 16 * 16)
    nt = -(-N // cap)
    for c in range(nt, nt + 8):
        if N % c == 0 and (N // c) % 16 == 0 and N // c <= cap:
            nt = c
            break
    print(f"budget {mb:2d}MB ({nt:2d} tiles, {B*nt:4d} steps): "
          f"{dt:.3f} ms/block-iter", flush=True)
    return B * nt, dt


pts = [bench(mb) for mb in (4, 6, 9, 13)]
(s0, t0), (s1, t1) = pts[0], pts[-1]
print(f"slope: {(t0 - t1) / (s0 - s1) * 1000:.2f} us/step; "
      f"intercept at 0 steps: {t1 - (t0 - t1) / (s0 - s1) * s1:.3f} ms")
