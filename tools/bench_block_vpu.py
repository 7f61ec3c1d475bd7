"""VPU-cost ablation inside the whole-block kernel at stage-1 shapes.

Builds local kernel variants (full / no-GELU / no-softmax / no-LN / matmuls
only) to attribute the gap between the kernel's ~4.3 ms and its ~1 ms MXU
roofline.  ``python -m tools.bench_block_vpu``
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

# distinct input buffers cycled per dispatch: same-input pipelined timing
# can report impossible numbers on this rig (result caching in the tunnel
# path) — tools/bench_serve_ablate.py discussion, 2026-08-16
NBUF = 6
xs = [mk16(B, N // TILE, TILE, D_PAD) for _ in range(NBUF)]
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
    if mode != "noln":
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        normed = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(xt.dtype)
    else:
        normed = xt
    q = jax.lax.dot_general(normed, wq_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(xt.dtype)
    logits = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * 0.125
    if mode != "nosoftmax":
        row_max = jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp(logits - row_max)
        probs = (unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)).astype(xt.dtype)
    else:
        probs = logits.astype(xt.dtype)
    attn = jax.lax.dot_general(probs, v_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(xt.dtype)
    y = jax.lax.dot_general(attn, wp_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    hres = xf + y
    if mode != "noln":
        mean2 = jnp.mean(hres, axis=-1, keepdims=True)
        var2 = jnp.var(hres, axis=-1, keepdims=True)
        normed2 = ((hres - mean2) * jax.lax.rsqrt(var2 + 1e-6)).astype(xt.dtype)
    else:
        normed2 = hres.astype(xt.dtype)
    hid = jax.lax.dot_general(normed2, w1_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if mode == "full":
        hid = (0.5 * hid * (1.0 + _erf(hid * 0.7071067811865476))).astype(xt.dtype)
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
    fn = jax.jit(lambda *a: f(*a))
    probe = jax.jit(lambda o: o.ravel()[0])
    np.asarray(probe(fn(xs[0], k, v, wq, wp, w1, w2)))
    # NB: on this rig block_until_ready does NOT force execution of
    # standalone dispatches (lazy backend) — fetch a probe of EVERY output
    # or the loop times only host dispatch (CLAUDE.md).
    for iters in (10, 30):
        t0 = time.perf_counter()
        outs = [fn(xs[i % NBUF], k, v, wq, wp, w1, w2) for i in range(iters)]
        np.asarray(jnp.stack([probe(o) for o in outs]))
        dt = time.perf_counter() - t0
        if iters == 10:
            t10 = dt
    slope = (dt - t10) / 20 * 1000
    print(f"{mode:10s}: {dt/30*1000:.2f} ms/iter (slope {slope:.2f})", flush=True)


for m in ("full", "relu", "nogelu", "nosoftmax", "noln"):
    run(m)
