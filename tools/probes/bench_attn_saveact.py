"""VERDICT r4 #2a: would a SAVE-ACTIVATIONS fused-attention backward beat
the current recompute backward (ops/block_attention.py _bwd_kernel)?

The full save-activations schedule would persist, per block:
  * nhat / normed (bf16, one extra full-stream forward WRITE), and
  * per-head softmax probs ([B, N, M_pad] — 1.5 GB bf16 PER BLOCK at the
    B=150 stage-1 training shapes, ~3.5 ms of HBM round-trip alone, so the
    probs half is ruled out by arithmetic, not measurement).

What this probe MEASURES is the remaining half: (1) how much of the
backward kernel's time is the LN+Q recompute that saving nhat would skip —
timed by running the real backward pallas_call against a TIMING-ONLY
variant whose kernel reads nhat from the stream slot and skips the
stats/normalize chain (same HBM traffic, same matmuls, no LN recompute);
and (2) what one extra full-stream forward write costs — the block_fused
emit_next A/B at the same shapes (that's exactly one extra bf16 stream
output).  If (1) < (2), save-activations loses before the probs problem
even starts, and fused_attn_train stays OFF with numbers attached.

Timing-only: variant (1b)'s outputs are numerically wrong (identity
"normed"); only its wall time is meaningful.  Run as
``python -m tools.probes.bench_attn_saveact``.
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

from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()

from mvlt_tpu.ops import block_attention as ba
from mvlt_tpu.ops.kernel_math import LOG2E

# stage-1 training shapes @ B=150 (the 31%-of-step stage)
B, N, D, H, M = 150, 4224, 64, 1, 1088
HID = None  # attention half only
REPS_LO, REPS_HI = 2, 6


def _bwd_saved_kernel(x_ref, dy_ref, k_ref, v_ref, wq_ref, bq_ref, wp_ref,
                      g_ref, be_ref, s_ref,
                      dx_ref, dk_ref, dv_ref, dwq_ref, dbq_ref, dwp_ref,
                      dbp_ref, dg_ref, dbe_ref,
                      *, scale, eps, dim, kv_len, num_heads):
    """_bwd_kernel with the LN recompute REMOVED: the x slot is read as if
    it were the saved nhat (timing-only — same stream traffic, no stats)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        for r in (dwq_ref, dbq_ref, dwp_ref, dbp_ref, dg_ref, dbe_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    @pl.when(j == 0)
    def _():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    x = x_ref[0]
    nhat = x.astype(jnp.float32)              # "saved" nhat, no recompute
    gamma = g_ref[0].astype(jnp.float32)
    beta = be_ref[0].astype(jnp.float32)
    inv_std = 1.0                             # saved scalar in the real thing
    normed = (nhat * gamma + beta).astype(x.dtype)
    q_all = (jax.lax.dot_general(
        normed, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bq_ref[0].astype(jnp.float32)).astype(x.dtype)

    dy_out = dy_ref[0].astype(jnp.float32)
    tile_rows, dp0 = dy_out.shape
    dyb = (dy_out.reshape(8, tile_rows // 8, dp0)
           * s_ref[0, 0][:, :, None]).reshape(tile_rows, dp0)
    dyb_b = dyb.astype(x.dtype)

    dbp_ref[...] += jnp.sum(dyb, axis=0, keepdims=True).astype(dbp_ref.dtype)
    dattn = jax.lax.dot_general(
        dyb_b, wp_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_pad = k_ref.shape[2]
    attn_outs, dq_parts = [], []
    for h in range(num_heads):
        q_h = q_all[:, h * 128:(h + 1) * 128]
        k_h = k_ref[0, h]
        v_h = v_ref[0, h]
        logits = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * LOG2E)
        if kv_len < m_pad:
            colm = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(colm < kv_len, logits, -jnp.inf)
        row_max = jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp2(logits - row_max)
        p = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)
        pb = p.astype(x.dtype)
        attn_outs.append(jax.lax.dot_general(
            pb, v_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype))
        do_h = dattn[:, h * 128:(h + 1) * 128].astype(x.dtype)
        dv_ref[0, h] += jax.lax.dot_general(
            pb, do_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do_h, v_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        tmp = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - tmp) * scale).astype(x.dtype)
        dq_parts.append(jax.lax.dot_general(
            ds, k_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dk_ref[0, h] += jax.lax.dot_general(
            ds, q_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)

    attn_out = (jnp.concatenate(attn_outs, axis=-1)
                if num_heads > 1 else attn_outs[0])
    dwp_ref[...] += jax.lax.dot_general(
        attn_out, dyb_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwp_ref.dtype)
    dq_all = (jnp.concatenate(dq_parts, axis=-1)
              if num_heads > 1 else dq_parts[0])
    dbq_ref[...] += jnp.sum(dq_all, axis=0, keepdims=True).astype(dbq_ref.dtype)
    dq_b = dq_all.astype(x.dtype)
    dwq_ref[...] += jax.lax.dot_general(
        normed, dq_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwq_ref.dtype)
    dnormed = jax.lax.dot_general(
        dq_b, wq_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dg_ref[...] += jnp.sum(dnormed * nhat, axis=0, keepdims=True).astype(dg_ref.dtype)
    dbe_ref[...] += jnp.sum(dnormed, axis=0, keepdims=True).astype(dbe_ref.dtype)
    # dx via saved inv_std (the m1/m2 reductions remain — they're part of
    # the true LN backward, saved or not)
    dnhat = dnormed * gamma
    m1 = jnp.sum(dnhat, axis=-1, keepdims=True) / dim
    m2 = jnp.sum(dnhat * nhat, axis=-1, keepdims=True) / dim
    dx_ln = (dnhat - m1 - nhat * m2) * inv_std
    dx_ref[0] = (dy_out + dx_ln).astype(dx_ref.dtype)


def bwd_call(x, dy, k, v, g, be, wq, bq, wp, bp, rs, *, scale, eps, h,
             saved: bool):
    from mvlt_tpu.ops.block_attention import (_expand_row_scale, _prep,
                                              _round_up)

    b, n, d = x.shape
    m = k.shape[2]
    d_pad = _round_up(d, 128)
    hd_pad = 128
    m_pad = _round_up(m, 128)
    p = _prep(x, k, v, g, be, wq, bq, wp, bp, h, bwd=True)
    tile, n_pad = p["tile"], p["n_pad"]
    dyp = jnp.pad(dy, ((0, 0), (0, n_pad - n), (0, d_pad - d))) \
        if (n_pad != n or d_pad != d) else dy
    sf = _expand_row_scale(rs, b, n_pad, tile)
    grid = (b, n_pad // tile)
    vec = lambda width: pl.BlockSpec((1, width), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((1, tile, d_pad), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, h, m_pad, hd_pad), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    kern = _bwd_saved_kernel if saved else ba._bwd_kernel
    return pl.pallas_call(
        functools.partial(kern, scale=scale, eps=eps, dim=d,
                          kv_len=m, num_heads=h),
        grid=grid,
        in_specs=[
            stream, stream, kv_spec, kv_spec,
            pl.BlockSpec((d_pad, h * hd_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            vec(h * hd_pad),
            pl.BlockSpec((h * hd_pad, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            vec(d_pad), vec(d_pad),
            pl.BlockSpec((1, 1, 8, tile // 8), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            stream, kv_spec, kv_spec,
            pl.BlockSpec((d_pad, h * hd_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            vec(h * hd_pad),
            pl.BlockSpec((h * hd_pad, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            vec(d_pad), vec(d_pad), vec(d_pad),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, d_pad), x.dtype),
            jax.ShapeDtypeStruct((b, h, m_pad, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, h, m_pad, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((d_pad, h * hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, h * hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((h * hd_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(p["xp"], dyp, p["kp"], p["vp"], p["wq2"], p["bq2"], p["wp2"],
      p["g2"], p["be2"], sf.reshape(b, n_pad // tile, 8, tile // 8))


def slope(fn, *args):
    def scan_n(reps):
        @jax.jit
        def run(*a):
            def body(acc, _):
                outs = fn(*a)
                return acc + outs[0].astype(jnp.float32).sum(), None
            return jax.lax.scan(body, jnp.float32(0.0), None, length=reps)[0]
        return run

    lo, hi = scan_n(REPS_LO), scan_n(REPS_HI)
    for _ in range(2):
        np.asarray(lo(*args)); np.asarray(hi(*args))

    def best(f):
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            dt = min(dt, time.perf_counter() - t0)
        return dt

    return (best(hi) - best(lo)) / (REPS_HI - REPS_LO)


def main():
    rng = np.random.default_rng(0)
    dt_ = jnp.bfloat16
    hd = D // H
    x = jnp.asarray(rng.normal(size=(B, N, D)) * 0.1, dt_)
    dy = jnp.asarray(rng.normal(size=(B, N, D)) * 0.1, dt_)
    k = jnp.asarray(rng.normal(size=(B, H, M, hd)) * 0.1, dt_)
    v = jnp.asarray(rng.normal(size=(B, H, M, hd)) * 0.1, dt_)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.float32)
    bq = jnp.zeros((D,), jnp.float32)
    wp = jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.float32)
    bp = jnp.zeros((D,), jnp.float32)
    rs = jnp.ones((B,), jnp.float32)
    scale = hd ** -0.5

    t_re = slope(lambda *a: bwd_call(*a, scale=scale, eps=1e-6, h=H,
                                     saved=False),
                 x, dy, k, v, g, be, wq, bq, wp, bp, rs)
    t_sv = slope(lambda *a: bwd_call(*a, scale=scale, eps=1e-6, h=H,
                                     saved=True),
                 x, dy, k, v, g, be, wq, bq, wp, bp, rs)
    print(f"bwd recompute: {t_re * 1e3:.2f} ms   bwd saved-nhat: "
          f"{t_sv * 1e3:.2f} ms   (saving = {(t_re - t_sv) * 1e3:.2f} ms "
          f"per stage-1 block backward)", flush=True)

    # (2) the forward-side cost of EMITTING the saved stream: block_fused
    # emit_next on/off — exactly one extra bf16 full-stream output
    from mvlt_tpu.ops.block_fused import fused_block

    hid = 8 * D
    w1 = jnp.asarray(rng.normal(size=(D, hid)) * 0.05, jnp.float32)
    b1 = jnp.zeros((hid,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(hid, D)) * 0.05, jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)

    def fb(emit):
        def f(x, k, v):
            out = fused_block(
                x, k, v, g, be, wq, bq, wp, bp, g, be, w1, b1, w2, b2,
                (g, be) if emit else None,
                scale=scale, eps1=1e-6, eps2=1e-6, num_heads=H, dim=D)
            return (out[0] if emit else out,)
        return f

    t_off = slope(fb(False), x, k, v)
    t_on = slope(fb(True), x, k, v)
    print(f"fwd extra stream write (emit_next A/B): "
          f"{(t_on - t_off) * 1e3:.2f} ms per block", flush=True)
    print("verdict: save-activations wins only if the bwd saving beats the "
          "fwd write cost — and the probs half is already ruled out by the "
          "1.5 GB/block HBM arithmetic above.", flush=True)


if __name__ == "__main__":
    main()
