"""Isolated cost of the stage-1 K/V path (XLA glue between fused blocks).

Measures _xla_kv-equivalent expression chains at stage-1 shapes under the
chained-carry scan + reps-slope harness, to size the prize for fusing the
LN -> space-to-depth -> SR contraction into a Pallas kernel.
``python -m tools.probes.bench_kv_glue``
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

B, N, C, D_PAD, H, W, SR, T = 101, 4224, 64, 128, 64, 64, 8, 128
rng = np.random.default_rng(0)
x0 = jnp.pad(jnp.asarray(rng.normal(size=(B, N, C)) * 0.1, jnp.bfloat16),
             ((0, 0), (0, 0), (0, D_PAD - C)))
g1 = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1.0, jnp.float32)
b1 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
sr_kern = jnp.asarray(rng.normal(size=(SR, SR, C, C)) * 0.02, jnp.bfloat16)
sr_bias = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.bfloat16)
wkv = jnp.asarray(rng.normal(size=(C, 2 * C)) * 0.05, jnp.bfloat16)

R_LO, R_HI = 4, 16


def ln_full(x):
    xf = x.astype(jnp.float32)
    mu = xf.sum(-1, keepdims=True) / C
    var = jnp.where(jax.lax.broadcasted_iota(jnp.int32, xf.shape, 2) < C,
                    (xf - mu) ** 2, 0.0).sum(-1, keepdims=True) / C
    g = jnp.zeros((D_PAD,), jnp.float32).at[:C].set(g1)
    bb = jnp.zeros((D_PAD,), jnp.float32).at[:C].set(b1)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + bb).astype(x.dtype)


def sr_contract(normed, slice_lanes):
    d = C if slice_lanes else D_PAD
    vis = normed[:, : H * W, :C] if slice_lanes else normed[:, : H * W, :]
    kern = sr_kern if slice_lanes else jnp.pad(
        sr_kern, ((0, 0), (0, 0), (0, D_PAD - C), (0, 0)))
    vis = vis.reshape(B, H // SR, SR, W // SR, SR, d)
    vis = vis.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, (H // SR) * (W // SR), SR * SR * d)
    out = jnp.einsum("bpk,ko->bpo", vis, kern.reshape(SR * SR * d, C),
                     preferred_element_type=jnp.float32)
    return out.astype(normed.dtype) + sr_bias


def bench(tag, body):
    def make(reps):
        @jax.jit
        def run(x):
            def step(xc, _):
                out = body(xc)
                # fold a scalar stat into the carry so no iteration is dead
                # (1e-6 scale keeps the carry numerically stable; the data
                # dependency still prevents hoisting/CSE)
                return xc + (out.astype(jnp.float32).sum()
                             * 1e-6).astype(xc.dtype), None
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
    print(f"{tag}: {dt:.3f} ms/iter", flush=True)
    return dt


def full_kv(x, slice_lanes=True, with_ln=True):
    normed = ln_full(x) if with_ln else x
    vis = sr_contract(normed, slice_lanes)
    vf = vis.astype(jnp.float32)
    vis = ((vf - vf.mean(-1, keepdims=True))
           * jax.lax.rsqrt(vf.var(-1, keepdims=True) + 1e-5)).astype(x.dtype)
    text = normed[:, H * W:, :C]
    kv_in = jnp.concatenate([vis, text, jnp.zeros((B, 64, C), x.dtype)], 1)
    kv = jnp.einsum("bmc,ck->bmk", kv_in, wkv,
                    preferred_element_type=jnp.float32)
    return kv


bench("LN only (full stream, masked stats)", lambda x: ln_full(x))
bench("s2d transpose+einsum, 128 lanes", lambda x: sr_contract(x, False))
bench("s2d transpose+einsum, :64 slice", lambda x: sr_contract(x, True))
bench("full K/V path (LN + SR + LN + proj)", lambda x: full_kv(x))
bench("full K/V path, normed given", lambda x: full_kv(x, with_ln=False))
