"""Probe: PVT-v2's 3x3 depthwise conv — XLA grouped-conv lowering vs a
9-shift multiply-add formulation (pure VPU elementwise, fusable).

Shapes are v2-tiny stage-1 MLP hidden: [B, 64, 64, 512].  Methodology:
slope between two in-jit scan repetition counts (CLAUDE.md).

``python -m tools.probes.bench_dwconv``
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

B, H, W, C = 101, 64, 64, 512
REPS_LO, REPS_HI = 4, 12

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.1, jnp.bfloat16)
b = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.bfloat16)


def conv_xla(x):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C) + b


def conv_shift(x):
    # 3x3 depthwise == sum of 9 shifted, per-channel-scaled copies.  All
    # VPU work; XLA fuses the pad/slice/mul/add chain into one loop.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            out = out + xp[:, dy:dy + H, dx:dx + W, :] * k[dy, dx, 0]
    return out + b


def bench(name, fn):
    def loop(reps):
        @jax.jit
        def run(x):
            def step(acc, _):
                return acc + fn(x).sum(), None
            return jax.lax.scan(step, jnp.float32(0.0), None, length=reps)[0]
        np.asarray(run(x))  # compile + warm
        dt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x))
            dt = min(dt, time.perf_counter() - t0)
        return dt
    lo, hi = loop(REPS_LO), loop(REPS_HI)
    ms = (hi - lo) / (REPS_HI - REPS_LO) * 1000
    print(f"{name}: {ms:.3f} ms/call", flush=True)
    return ms


if __name__ == "__main__":
    # correctness first (fp32, small)
    xs = jnp.asarray(rng.normal(size=(2, 8, 8, C)), jnp.float32)
    def ref(xs):
        return jax.lax.conv_general_dilated(
            xs, k.astype(jnp.float32), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C) + b.astype(jnp.float32)
    def alt(xs):
        xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = jnp.zeros_like(xs)
        for dy in range(3):
            for dx in range(3):
                out = out + xp[:, dy:dy + 8, dx:dx + 8, :] * k[dy, dx, 0].astype(jnp.float32)
        return out + b.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(jax.jit(ref)(xs)),
                               np.asarray(jax.jit(alt)(xs)), rtol=1e-3, atol=1e-3)
    print("equivalence ok", flush=True)

    bench("dwconv 9-shift", conv_shift)
    bench("dwconv XLA grouped", conv_xla)
