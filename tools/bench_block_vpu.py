"""VPU-cost ablation inside the whole-block kernel at stage-1 shapes.

Builds local kernel variants (full / GELU variants / no-softmax / no-LN /
matmuls only) to attribute the gap between the kernel's measured time and
its ~1 ms MXU roofline.  Timing: the kernel is lax.scan'ed over NBUF staged
distinct buffers inside ONE jit — a single dispatch, device-only time (the
per-dispatch variant of this probe showed a ~20 ms first-mode artifact from
lazy input materialization on the tunnel backend; the scan harness is the
only methodology this rig can't distort, CLAUDE.md).

``python -m tools.bench_block_vpu [modes...]``
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.ops.fused_mlp import _erf

B, N, D_PAD, M_PAD, HID = 101, 4224, 128, 256, 512
TILE = 1408
rng = np.random.default_rng(0)
mk16 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.bfloat16)

NBUF = 8           # distinct staged buffers scanned inside one jit
SCAN_REPS = 3      # scan passes over the buffers inside the same jit

xs = mk16(NBUF, B, N // TILE, TILE, D_PAD)
k = mk16(B, M_PAD, 128)
v = mk16(B, M_PAD, 128)
wq = mk16(D_PAD, 128)
wp = mk16(128, D_PAD)
w1 = mk16(D_PAD, HID)
w2 = mk16(HID, D_PAD)


def kernel(x_ref, k_ref, v_ref, wq_ref, wp_ref, w1_ref, w2_ref, o_ref, *,
           mode: str):
    xt = x_ref[0, 0]
    xf = xt.astype(jnp.float32)
    one_pass = mode in ("current", "folded")
    if mode == "noln":
        normed = xt
    elif one_pass:
        s1 = jnp.sum(xf, axis=-1, keepdims=True)
        s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
        mean = s1 / xf.shape[-1]
        var = s2 / xf.shape[-1] - mean * mean
        normed = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(xt.dtype)
        # 'folded' would skip the affine apply entirely (scale/bias folded
        # into wq/w1 host-side); this probe has no affine either way, so
        # the folded saving shows up as the normed cast staying the same —
        # emulate the extra affine the real kernel pays in 'current':
        if mode == "current":
            normed = (normed.astype(jnp.float32) * 1.01 + 0.01).astype(xt.dtype)
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        normed = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(xt.dtype)
    q = jax.lax.dot_general(normed, wq_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(xt.dtype)
    logits = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * 0.125
    if mode in ("exp2softmax", "current", "folded"):
        # exp2 with the log2(e) folded into the scale; skip the division by
        # scaling the output instead (denominator applied post-AV)
        row_max = jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp2((logits - row_max) * 1.4426950408889634)
        denom = jnp.sum(unnorm, axis=-1, keepdims=True)
        probs = unnorm.astype(xt.dtype)
    elif mode != "nosoftmax":
        row_max = jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp(logits - row_max)
        denom = None
        probs = (unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)).astype(xt.dtype)
    else:
        denom = None
        probs = logits.astype(xt.dtype)
    attn = jax.lax.dot_general(probs, v_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    if mode == "exp2softmax":
        attn = attn / denom
    attn = attn.astype(xt.dtype)
    y = jax.lax.dot_general(attn, wp_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    hres = xf + y
    if mode == "noln":
        normed2 = hres.astype(xt.dtype)
    elif one_pass:
        s1 = jnp.sum(hres, axis=-1, keepdims=True)
        s2 = jnp.sum(hres * hres, axis=-1, keepdims=True)
        mean2 = s1 / hres.shape[-1]
        var2 = s2 / hres.shape[-1] - mean2 * mean2
        normed2 = ((hres - mean2) * jax.lax.rsqrt(var2 + 1e-6)).astype(xt.dtype)
        if mode == "current":
            normed2 = (normed2.astype(jnp.float32) * 1.01 + 0.01).astype(xt.dtype)
    else:
        mean2 = jnp.mean(hres, axis=-1, keepdims=True)
        var2 = jnp.var(hres, axis=-1, keepdims=True)
        normed2 = ((hres - mean2) * jax.lax.rsqrt(var2 + 1e-6)).astype(xt.dtype)
    hid = jax.lax.dot_general(normed2, w1_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if mode in ("full", "exp2softmax"):
        hid = (0.5 * hid * (1.0 + _erf(hid * 0.7071067811865476))).astype(xt.dtype)
    elif mode in ("current", "folded"):
        c = 0.7978845608028654
        hid = (0.5 * hid * (1.0 + jnp.tanh(c * (hid + 0.044715 * hid ** 3)))).astype(xt.dtype)
    elif mode == "erf_noexp":
        # A&S polynomial with the exp(-x^2) factor replaced by a constant:
        # isolates whether the exp or the divide/sign plumbing costs
        a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                              -1.453152027, 1.061405429)
        p = 0.3275911
        ax = jnp.abs(hid * 0.7071067811865476)
        t = 1.0 / (1.0 + p * ax)
        poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
        e = jnp.sign(hid) * (1.0 - poly * 0.5)
        hid = (0.5 * hid * (1.0 + e)).astype(xt.dtype)
    elif mode == "exp_only":
        hid = (hid * jnp.exp(-hid * hid * 0.5)).astype(xt.dtype)
    elif mode == "tanh_gelu":
        c = 0.7978845608028654
        hid = (0.5 * hid * (1.0 + jnp.tanh(c * (hid + 0.044715 * hid ** 3)))).astype(xt.dtype)
    elif mode == "logistic_erf":
        hid = (hid * jax.nn.sigmoid(1.702 * hid)).astype(xt.dtype)
    elif mode == "relu":
        hid = jnp.maximum(hid, 0.0).astype(xt.dtype)
    else:
        hid = hid.astype(xt.dtype)
    y2 = jax.lax.dot_general(hid, w2_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0, 0] = (hres + y2).astype(o_ref.dtype)


def run(mode):
    f = pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid=(B, N // TILE),
        in_specs=[
            pl.BlockSpec((1, 1, TILE, D_PAD), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_PAD, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_PAD, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_PAD, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, D_PAD), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_PAD, HID), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, D_PAD), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TILE, D_PAD), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N // TILE, TILE, D_PAD), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )

    def make(reps):
        @jax.jit
        def scanned(xs):
            def step(acc, x):
                out = f(x, k, v, wq, wp, w1, w2)
                return acc + out[0, 0, 0, :8].astype(jnp.float32).sum(), None

            acc = jnp.float32(0.0)
            for _ in range(reps):
                acc, _ = jax.lax.scan(step, acc, xs)
            return acc

        return scanned

    # SLOPE between two in-jit repetition counts: a null scan measures
    # 40-65 ms of fixed tunnel dispatch+fetch cost per RPC on this rig,
    # which at NBUF=8 would pollute per-iter numbers by ~5-8 ms
    lo, hi = make(1), make(1 + SCAN_REPS)
    np.asarray(lo(xs))
    np.asarray(hi(xs))

    def best(fn):
        dt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(xs))
            dt = min(dt, time.perf_counter() - t0)
        return dt

    per_iter = (best(hi) - best(lo)) / (NBUF * SCAN_REPS) * 1000
    print(f"{mode:12s}: {per_iter:.3f} ms/iter (device-true slope)", flush=True)


if __name__ == "__main__":
    import sys

    modes = sys.argv[1:] or ["full", "relu", "nogelu", "tanh_gelu",
                             "logistic_erf", "erf_noexp", "exp_only",
                             "exp2softmax", "nosoftmax", "noln", "full"]
    for m in modes:
        run(m)
