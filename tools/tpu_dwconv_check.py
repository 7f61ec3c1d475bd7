"""On-device check: fused_dwconv_mlp (Mosaic-compiled) vs the XLA reference
at every v2 stage shape, plus a quick timing slope.  Run as
``python -m tools.tpu_dwconv_check`` once the TPU is reachable; green here
is the gate for flipping ModelConfig.dwconv_mlp_kernel on.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()  # fail fast if the TPU tunnel is dead

from mvlt_tpu.ops.dwconv_mlp import fused_dwconv_mlp

T = 128
STAGES = [  # (C, mlp_ratio, h, w) — pvlt_v2_tiny @ 256
    (64, 8, 64, 64),
    (128, 8, 32, 32),
    (320, 4, 16, 16),
    (512, 4, 8, 8),
]


def ref(x, g, be, w1, b1, kdw, bdw, w2, b2, hw, eps):
    h, w = hw
    bsz = x.shape[0]
    xf = x.astype(jnp.float32)
    normed = ((xf - xf.mean(-1, keepdims=True))
              * jax.lax.rsqrt(xf.var(-1, keepdims=True) + eps) * g + be
              ).astype(x.dtype)
    hid = (normed @ w1.astype(x.dtype)) + b1.astype(x.dtype)
    vis = hid[:, : h * w].reshape(bsz, h, w, -1)
    vis = jax.lax.conv_general_dilated(
        vis, kdw.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=w1.shape[1]) + bdw.astype(x.dtype)
    hid = jnp.concatenate([vis.reshape(bsz, h * w, -1), hid[:, h * w:]], axis=1)
    # module-dtype GELU, exactly like DWConvMlp (no fp32 upcast — the
    # timing baseline must be the production XLA path, not a strawman)
    act = jax.nn.gelu(hid, approximate=False)
    return x + (act @ w2.astype(x.dtype)) + b2.astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    for c, ratio, h, w in STAGES:
        hid = c * ratio
        n = h * w + T
        b = 8
        x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16)
        g = jnp.asarray(rng.normal(1, 0.1, (c,)), jnp.float32)
        be = jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
        w1 = jnp.asarray(rng.normal(0, 0.05, (c, hid)), jnp.float32)
        b1 = jnp.asarray(rng.normal(0, 0.05, (hid,)), jnp.float32)
        kdw = jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, hid)), jnp.float32)
        bdw = jnp.asarray(rng.normal(0, 0.05, (hid,)), jnp.float32)
        w2 = jnp.asarray(rng.normal(0, 0.05, (hid, c)), jnp.float32)
        b2 = jnp.asarray(rng.normal(0, 0.05, (c,)), jnp.float32)

        want = np.asarray(jax.jit(ref, static_argnames=("hw", "eps"))(
            x, g, be, w1, b1, kdw, bdw, w2, b2, hw=(h, w), eps=1e-6),
            dtype=np.float32)
        # parity at BOTH gelu forms: 'erf' (tight tolerance) and 'tanh'
        # (what serving ships by default, kernel_gelu — looser bound only
        # from the documented 4.7e-4 tanh-vs-erf divergence)
        for form, tol in (("erf", 5e-2), ("tanh", 6e-2)):
            got = np.asarray(fused_dwconv_mlp(
                x, g, be, w1, b1, kdw, bdw, w2, b2, hw=(h, w), eps=1e-6,
                gelu=form), dtype=np.float32)
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            print(f"stage C={c} hw={h}x{w} gelu={form}: rel-err {err:.2e} "
                  f"{'OK' if err < tol else 'FAIL'}", flush=True)

        # timing slope over DISTINCT staged inputs threaded through the
        # scan as xs — a loop-invariant closure would let XLA hoist the
        # body out of the loop and time nothing (CLAUDE.md methodology)
        REPS_LO, REPS_HI = 4, 12
        xs = jnp.asarray(rng.normal(size=(REPS_HI, b, n, c)), jnp.bfloat16)

        def bench(fn, reps):
            @jax.jit
            def run(xs):
                def step(acc, xx):
                    return acc + fn(xx).astype(jnp.float32).sum(), None
                return jax.lax.scan(step, jnp.float32(0.0), xs[:reps])[0]
            np.asarray(run(xs))
            dt = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(xs))
                dt = min(dt, time.perf_counter() - t0)
            return dt
        fused = lambda xx: fused_dwconv_mlp(
            xx, g, be, w1, b1, kdw, bdw, w2, b2, hw=(h, w), eps=1e-6,
            gelu="tanh")
        xla = lambda xx: ref(xx, g, be, w1, b1, kdw, bdw, w2, b2, (h, w), 1e-6)
        for name, fn in (("fused", fused), ("xla", xla)):
            ms = (bench(fn, REPS_HI) - bench(fn, REPS_LO)) / (REPS_HI - REPS_LO) * 1000
            print(f"  {name}: {ms:.3f} ms/call @B={b}", flush=True)


if __name__ == "__main__":
    main()
