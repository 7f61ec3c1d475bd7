"""Fused attention half-block: LN -> Q-proj -> attention -> out-proj -> +res.

Second Pallas megakernel of the PVLT block (sibling of fused_mlp.py).  The
K/V path (strided-conv spatial reduction + LN + KV projection,
libs/pvlt.py:100-108) runs in XLA — it touches only the tiny reduced
sequence ((HW/sr^2)+T tokens).  Everything that walks the full [B, N, D]
stream is fused here, so HBM traffic per block-attention drops from ~6
full-stream tensors (normed x, q, attention out, proj in/out, residual) to
exactly one read + one write of x.

Head-stripe trick: with head_dim 64 and 128 MXU lanes, the Q projection
weight is pre-expanded so each head occupies its own 128-lane stripe
(columns [h*128, h*128+64) hold head h, the rest zeros).  One matmul then
yields all padded per-head queries; the output projection weight is expanded
with matching zero rows, so padded lanes contribute nothing.

y = x + row_scale * ( concat_h softmax(LN(x) Wq_h K_h^T * scale) V_h Wp + bp )

TRAINING: ``fused_block_attention`` carries a custom VJP whose backward is
its own Pallas kernel — per row tile it recomputes the forward chain
(one-pass LN, striped Q, per-head softmax via the shared attention-grad
recipe of ops/pallas_attention.py) and accumulates dWq/dWp/dbq/dbp/dLN
across a sequential grid, emitting dx per tile and dK/dV per batch element.
The per-sample DropPath scale folds in as ``row_scale`` exactly like
fused_mlp.py.  When the fixed VMEM blocks (weights + fp32 weight grads +
K/V + fp32 dK/dV) don't fit the scoped budget (stage 4 shapes), the
backward falls back to XLA autodiff of the reference expression.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.kernel_math import (one_pass_ln, one_pass_ln_stats,
                                      round_up as _round_up,
                                      softmax_av, softmax_av_stats)

_LOGITS_BUDGET = 4 * 1024 * 1024
# backward-kernel gate: fixed VMEM blocks (weights + fp32 weight grads +
# K/V + fp32 dK/dV) beyond this fall back to XLA autodiff (stage-4 shapes)
_BWD_FIXED_BUDGET = 8 * 1024 * 1024


def _kernel(x_ref, k_ref, v_ref, wq_ref, bq_ref, wp_ref, bp_ref, g_ref, be_ref,
            s_ref, o_ref, *, scale: float, eps: float, dim: int, kv_len: int,
            num_heads: int):
    """x_ref/o_ref: [1, TILE, D_pad]; k_ref/v_ref: [1, H, M_pad, 128];
    wq_ref: [D_pad, H*128]; wp_ref: [H*128, D_pad]; s_ref: [1, 8, TILE/8]
    per-row residual-branch scale (DropPath mask/keep; ones when off)."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)

    normed = one_pass_ln(xf, dim, eps, g_ref[0].astype(jnp.float32),
                         be_ref[0].astype(jnp.float32)).astype(x.dtype)

    q_all = (jax.lax.dot_general(
        normed, wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[0].astype(jnp.float32)).astype(x.dtype)

    outs = []
    for h in range(num_heads):
        q_h = q_all[:, h * 128:(h + 1) * 128]
        outs.append(softmax_av(q_h, k_ref[0, h], v_ref[0, h],
                               scale=scale, kv_len=kv_len, out_dtype=x.dtype))
    attn_out = jnp.concatenate(outs, axis=-1) if num_heads > 1 else outs[0]

    y = jax.lax.dot_general(
        attn_out, wp_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0].astype(jnp.float32)
    tile, dp = y.shape
    y = (y.reshape(8, tile // 8, dp) * s_ref[0, 0][:, :, None]).reshape(tile, dp)
    o_ref[0] = (xf + y).astype(o_ref.dtype)


def _kernel_stats(x_ref, k_ref, v_ref, wq_ref, bq_ref, wp_ref, bp_ref, g_ref,
                  be_ref, s_ref, o_ref, st_ref, *, scale: float, eps: float,
                  dim: int, kv_len: int, num_heads: int):
    """_kernel plus a per-row statistics side output st_ref [1, TILE, S]
    (S = round_up(2 + 2H, 8) fp32 lanes: LN mean / inv_std, then per head
    softmax row_max (exp2 units) / inv_denom).  The stats-mode backward
    (_bwd_kernel_stats) rebuilds nhat and P from these with two multiplies
    per element — no tile reductions, no fp32 divide (VERDICT r4 #2a:
    the recompute backward's forward-chain replay is what it lost on)."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)

    normed_f, mean, inv_std = one_pass_ln_stats(
        xf, dim, eps, g_ref[0].astype(jnp.float32),
        be_ref[0].astype(jnp.float32))
    normed = normed_f.astype(x.dtype)

    q_all = (jax.lax.dot_general(
        normed, wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[0].astype(jnp.float32)).astype(x.dtype)

    cols = [mean, inv_std]
    outs = []
    for h in range(num_heads):
        q_h = q_all[:, h * 128:(h + 1) * 128]
        o_h, row_max, inv_den = softmax_av_stats(
            q_h, k_ref[0, h], v_ref[0, h],
            scale=scale, kv_len=kv_len, out_dtype=x.dtype)
        outs.append(o_h)
        cols.extend([row_max, inv_den])
    attn_out = jnp.concatenate(outs, axis=-1) if num_heads > 1 else outs[0]

    y = jax.lax.dot_general(
        attn_out, wp_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0].astype(jnp.float32)
    tile, dp = y.shape
    y = (y.reshape(8, tile // 8, dp) * s_ref[0, 0][:, :, None]).reshape(tile, dp)
    o_ref[0] = (xf + y).astype(o_ref.dtype)
    s_lanes = st_ref.shape[-1]
    while len(cols) < s_lanes:
        cols.append(jnp.zeros_like(mean))
    st_ref[0] = jnp.concatenate(cols, axis=1)


def _stats_lanes(num_heads: int) -> int:
    return _round_up(2 + 2 * num_heads, 8)


def _bwd_kernel(x_ref, dy_ref, k_ref, v_ref, wq_ref, bq_ref, wp_ref, g_ref,
                be_ref, s_ref,
                dx_ref, dk_ref, dv_ref, dwq_ref, dbq_ref, dwp_ref, dbp_ref,
                dg_ref, dbe_ref,
                *, scale: float, eps: float, dim: int, kv_len: int,
                num_heads: int):
    """Backward grid step (i=batch, j=row-tile, both sequential): recompute
    the forward chain for one tile, emit dx, accumulate dK/dV per batch
    element (reset at j==0) and weight/LN grads globally (reset at step 0).
    All accumulation fp32."""
    from mvlt_tpu.ops.kernel_math import LOG2E

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
    xf = x.astype(jnp.float32)
    d_pad = x.shape[-1]
    gamma = g_ref[0].astype(jnp.float32)
    beta = be_ref[0].astype(jnp.float32)

    # --- recompute forward (one-pass LN, matching _kernel) ---
    if dim < d_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1)
        valid = col < dim
        xz = jnp.where(valid, xf, 0.0)
    else:
        valid = None
        xz = xf
    mean = jnp.sum(xz, axis=-1, keepdims=True) / dim
    var = jnp.sum(xz * xz, axis=-1, keepdims=True) / dim - mean * mean
    inv_std = jax.lax.rsqrt(var + eps)
    nhat = (xf - mean) * inv_std
    if valid is not None:
        nhat = jnp.where(valid, nhat, 0.0)
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
    # d(attn_out) = dyb @ Wp^T : contract the d_pad axis of both
    dattn = jax.lax.dot_general(
        dyb_b, wp_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [tile, H*128]

    m_pad = k_ref.shape[2]
    attn_outs = []
    dq_parts = []
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
        p = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)   # fp32 [tile, m]
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

    dq_all = jnp.concatenate(dq_parts, axis=-1) if num_heads > 1 else dq_parts[0]
    dbq_ref[...] += jnp.sum(dq_all, axis=0, keepdims=True).astype(dbq_ref.dtype)
    dq_b = dq_all.astype(x.dtype)
    dwq_ref[...] += jax.lax.dot_general(
        normed, dq_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwq_ref.dtype)
    dnormed = jax.lax.dot_general(
        dq_b, wq_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [tile, D_pad]
    if valid is not None:
        dnormed = jnp.where(valid, dnormed, 0.0)
    dg_ref[...] += jnp.sum(dnormed * nhat, axis=0, keepdims=True).astype(dg_ref.dtype)
    dbe_ref[...] += jnp.sum(dnormed, axis=0, keepdims=True).astype(dbe_ref.dtype)
    dnhat = dnormed * gamma
    m1 = jnp.sum(dnhat, axis=-1, keepdims=True) / dim
    m2 = jnp.sum(dnhat * nhat, axis=-1, keepdims=True) / dim
    dx_ln = (dnhat - m1 - nhat * m2) * inv_std
    if valid is not None:
        dx_ln = jnp.where(valid, dx_ln, 0.0)
    dx_ref[0] = (dy_out + dx_ln).astype(dx_ref.dtype)


def _bwd_kernel_stats(x_ref, dy_ref, k_ref, v_ref, wq_ref, bq_ref, wp_ref,
                      g_ref, be_ref, s_ref, st_ref,
                      dx_ref, dk_ref, dv_ref, dwq_ref, dbq_ref, dwp_ref,
                      dbp_ref, dg_ref, dbe_ref,
                      *, scale: float, eps: float, dim: int, kv_len: int,
                      num_heads: int):
    """_bwd_kernel with the forward-pass statistics SAVED by _kernel_stats
    (st_ref [1, TILE, S] fp32): nhat rebuilds as (x - mean) * inv_std and
    each head's P as exp2(logits - row_max) * inv_denom — the LN sum/sumsq
    and softmax max/sum tile reductions and the fp32 divide (the most
    expensive VPU primitive here, kernel_math module docstring) all drop
    out of the backward.  The logit/Q matmuls still replay (MXU-cheap;
    persisting P itself would stream [B,H,N,M] through HBM — hundreds of
    MB per stage-1 block at B=150)."""
    from mvlt_tpu.ops.kernel_math import LOG2E

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
    xf = x.astype(jnp.float32)
    d_pad = x.shape[-1]
    gamma = g_ref[0].astype(jnp.float32)
    beta = be_ref[0].astype(jnp.float32)
    st = st_ref[0]                        # [tile, S] fp32 forward stats

    if dim < d_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1)
        valid = col < dim
    else:
        valid = None
    mean = st[:, 0:1]
    inv_std = st[:, 1:2]
    nhat = (xf - mean) * inv_std
    if valid is not None:
        nhat = jnp.where(valid, nhat, 0.0)
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
        preferred_element_type=jnp.float32)          # [tile, H*128]

    m_pad = k_ref.shape[2]
    attn_outs = []
    dq_parts = []
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
        # saved stats: no max reduction, no sum reduction, no divide.  The
        # min-0 clamp is exact for real rows (row_max IS the row's max, so
        # the exponent is <= 0) and guards zero-padded stats rows (row_max
        # 0) from exp2 overflow -> inf * 0 NaNs poisoning dv/dk sums.
        p = jnp.exp2(jnp.minimum(logits - st[:, 2 + 2 * h:3 + 2 * h], 0.0)) \
            * st[:, 3 + 2 * h:4 + 2 * h]             # fp32 [tile, m]
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

    dq_all = jnp.concatenate(dq_parts, axis=-1) if num_heads > 1 else dq_parts[0]
    dbq_ref[...] += jnp.sum(dq_all, axis=0, keepdims=True).astype(dbq_ref.dtype)
    dq_b = dq_all.astype(x.dtype)
    dwq_ref[...] += jax.lax.dot_general(
        normed, dq_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwq_ref.dtype)
    dnormed = jax.lax.dot_general(
        dq_b, wq_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [tile, D_pad]
    if valid is not None:
        dnormed = jnp.where(valid, dnormed, 0.0)
    dg_ref[...] += jnp.sum(dnormed * nhat, axis=0, keepdims=True).astype(dg_ref.dtype)
    dbe_ref[...] += jnp.sum(dnormed, axis=0, keepdims=True).astype(dbe_ref.dtype)
    dnhat = dnormed * gamma
    m1 = jnp.sum(dnhat, axis=-1, keepdims=True) / dim
    m2 = jnp.sum(dnhat * nhat, axis=-1, keepdims=True) / dim
    dx_ln = (dnhat - m1 - nhat * m2) * inv_std
    if valid is not None:
        dx_ln = jnp.where(valid, dx_ln, 0.0)
    dx_ref[0] = (dy_out + dx_ln).astype(dx_ref.dtype)


def _prep(x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, num_heads,
          bwd: bool = False, stats: bool = False):
    """Pad params/operands into the kernel layouts; returns a dict plus the
    row-tile plan.  Shared by forward and backward (``bwd`` switches to the
    backward's much larger per-row live-set estimate — the fp32
    logits/p/dp/ds chain plus the dnormed/dx intermediates; ``stats``
    inflates the forward estimate for the stats-emitting kernel, whose
    returned row_max/inv_denom keep the fp32 logits AND unnorm tiles live
    simultaneously — measured 21.7M actual vs the plain plan's 13M at
    stage-1 shapes, a scoped-VMEM OOM at one whole-stream tile)."""
    b, n, d = x.shape
    h = num_heads
    hd = d // h
    m = k.shape[2]
    assert k.shape[1] == h and k.shape[3] == hd

    d_pad = _round_up(d, 128)
    hd_pad = 128
    m_pad = _round_up(m, 128)

    dtype = x.dtype
    # expand Wq into per-head 128-lane stripes
    wqr = wq.astype(dtype).reshape(d, h, hd)
    wq2 = jnp.zeros((d_pad, h, hd_pad), dtype)
    wq2 = wq2.at[:d, :, :hd].set(wqr)
    wq2 = wq2.reshape(d_pad, h * hd_pad)
    bq2 = jnp.zeros((h, hd_pad), jnp.float32).at[:, :hd].set(
        bq.astype(jnp.float32).reshape(h, hd)).reshape(1, h * hd_pad)
    # expand Wp with matching zero rows
    wpr = wp.astype(dtype).reshape(h, hd, d)
    wp2 = jnp.zeros((h, hd_pad, d_pad), dtype)
    wp2 = wp2.at[:, :hd, :d].set(wpr)
    wp2 = wp2.reshape(h * hd_pad, d_pad)
    bp2 = jnp.zeros((1, d_pad), jnp.float32).at[0, :d].set(bp.astype(jnp.float32))
    g2 = jnp.zeros((1, d_pad), jnp.float32).at[0, :d].set(ln_scale.astype(jnp.float32))
    be2 = jnp.zeros((1, d_pad), jnp.float32).at[0, :d].set(ln_bias.astype(jnp.float32))

    kp = k.astype(dtype)
    vp = v.astype(dtype)
    if hd_pad != hd:
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, 0), (0, hd_pad - hd)))
        vp = jnp.pad(vp, ((0, 0), (0, 0), (0, 0), (0, hd_pad - hd)))
    if m_pad != m:
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))

    # Row tiling under a VMEM budget (fp32 logits + q/out head stripes +
    # double-buffered x/out tiles).  Prefer the fewest equal tiles — grid
    # steps carry fixed overhead, so maximize per-step work.
    if bwd:
        per_row = m_pad * 16 + h * hd_pad * 10 + d_pad * 24
        fixed = (2 * d_pad * h * hd_pad * (2 + 4)
                 + 2 * h * m_pad * hd_pad * (2 + 4))
        budget = max(2 * 1024 * 1024, 13 * 1024 * 1024 - fixed)
    else:
        # dtype-dependent terms sized from itemsize (ADVICE r4): at bf16
        # (esz=2) this reproduces the measured 13 MB plan bit-for-bit; an
        # fp32 stream sees its true 2x live bytes (q/out stripes, x/out
        # tiles, K/V + weight blocks) instead of the old undercount, whose
        # overflow mode is an opaque tpu_compile_helper HTTP 500.
        esz = dtype.itemsize
        per_row = m_pad * 4 + h * hd_pad * 2 * esz + d_pad * (6 + 2 * esz)
        if stats:
            # two more live fp32 [tile, m_pad] buffers per head + the
            # [tile, S] side output
            per_row += h * m_pad * 8 + _stats_lanes(h) * 4
        fixed = (2 * d_pad * h * hd_pad + 2 * h * m_pad * hd_pad) * (esz - 2)
        budget = max(2 * 1024 * 1024, 13 * 1024 * 1024 - max(0, fixed))
    cap = max(256, budget // per_row // 8 * 8)
    num_tiles = max(1, -(-n // cap))
    tile = _round_up(-(-n // num_tiles), 128)
    n_pad = _round_up(n, tile)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, d_pad - d))) \
        if (n_pad != n or d_pad != d) else x
    return dict(b=b, n=n, d=d, h=h, hd=hd, m=m, d_pad=d_pad, hd_pad=hd_pad,
                m_pad=m_pad, tile=tile, n_pad=n_pad, xp=xp, kp=kp, vp=vp,
                wq2=wq2, bq2=bq2, wp2=wp2, bp2=bp2, g2=g2, be2=be2)


def _expand_row_scale(row_scale, b, n_pad, tile):
    """[B] per-sample scale -> [B, n_tiles, 8, tile/8] fp32 blocks (the
    sublane-major layout the kernels multiply against; see fused_mlp.py)."""
    s = jnp.broadcast_to(row_scale.astype(jnp.float32)[:, None], (b, n_pad))
    return s.reshape(b, n_pad // tile, 8, tile // 8)


def _bwd_fixed_bytes(d: int, m: int, num_heads: int) -> int:
    """Fixed VMEM blocks of the backward kernels: bf16 wq2/wp2 + fp32
    dwq/dwp + bf16 K/V + fp32 dK/dV (shared by the recompute and stats
    forms — the stats block is per-tile, not fixed)."""
    d_pad = _round_up(d, 128)
    m_pad = _round_up(m, 128)
    return (2 * d_pad * num_heads * 128 * (2 + 4)
            + 2 * num_heads * m_pad * 128 * (2 + 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def _fused_block_attention_vjp(x, k, v, ln_scale, ln_bias, wq, bq, wp, bp,
                               row_scale, scale, eps, num_heads, save_stats):
    return _fba_impl(x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, row_scale,
                     scale=scale, eps=eps, num_heads=num_heads)


def _fba_fwd(x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, row_scale,
             scale, eps, num_heads, save_stats):
    # stats only help when the kernel backward will actually run; at
    # XLA-fallback shapes (stage 4) skip the side output entirely
    if save_stats and _bwd_fixed_bytes(x.shape[2], k.shape[2],
                                       num_heads) <= _BWD_FIXED_BUDGET:
        out, stats = _fba_impl_stats(
            x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, row_scale,
            scale=scale, eps=eps, num_heads=num_heads)
        return out, (x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, row_scale,
                     stats)
    out = _fba_impl(x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, row_scale,
                    scale=scale, eps=eps, num_heads=num_heads)
    return out, (x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, row_scale, None)


def _xla_block_attention(x, k, v, ln_scale, ln_bias, wq, bq, wp, bp,
                         row_scale, scale, eps, num_heads):
    """Reference XLA expression (backward fallback when the kernel's fixed
    VMEM blocks don't fit — stage-4-class shapes)."""
    b, n, d = x.shape
    h = num_heads
    hd = d // h
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    nrm = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale.astype(jnp.float32)
           + ln_bias.astype(jnp.float32)).astype(x.dtype)
    q = (jnp.einsum("bnd,de->bne", nrm, wq.astype(x.dtype),
                    preferred_element_type=jnp.float32)
         + bq.astype(jnp.float32)).astype(x.dtype)
    q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)
    y = (jnp.einsum("bnd,de->bne", attn, wp.astype(x.dtype),
                    preferred_element_type=jnp.float32)
         + bp.astype(jnp.float32))
    return (xf + row_scale.astype(jnp.float32)[:, None, None] * y).astype(x.dtype)


def _fba_bwd(scale, eps, num_heads, save_stats, res, dy):
    x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, row_scale, stats = res
    b, n, d = x.shape
    h = num_heads
    hd = d // h
    m = k.shape[2]
    d_pad = _round_up(d, 128)
    hd_pad = 128
    m_pad = _round_up(m, 128)

    # fixed VMEM blocks: bf16 wq2/wp2 + fp32 dwq/dwp + bf16 K/V + fp32 dK/dV
    fixed = _bwd_fixed_bytes(d, m, h)
    if fixed > _BWD_FIXED_BUDGET:
        _, vjp = jax.vjp(
            lambda *a: _xla_block_attention(*a, scale, eps, num_heads),
            x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, row_scale)
        return vjp(dy)

    p = _prep(x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, h, bwd=True)
    tile, n_pad = p["tile"], p["n_pad"]
    dyp = jnp.pad(dy, ((0, 0), (0, n_pad - n), (0, d_pad - d))) \
        if (n_pad != n or d_pad != d) else dy
    sf = _expand_row_scale(row_scale, b, n_pad, tile)

    grid = (b, n_pad // tile)
    vec = lambda width: pl.BlockSpec((1, width), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((1, tile, d_pad), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, h, m_pad, hd_pad), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    if stats is not None:
        # forward stats ride in per tile; the forward's row-tile plan can
        # differ from the backward's, so re-pad to this grid's n_pad
        s_lanes = stats.shape[-1]
        stp = jnp.pad(stats, ((0, 0), (0, n_pad - n), (0, 0))) \
            if n_pad != n else stats
        kern = _bwd_kernel_stats
        extra_in = [stp]
        extra_spec = [pl.BlockSpec((1, tile, s_lanes), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM)]
    else:
        kern = _bwd_kernel
        extra_in = []
        extra_spec = []
    outs = pl.pallas_call(
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
            *extra_spec,
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
      p["g2"], p["be2"], sf.reshape(b, n_pad // tile, 8, tile // 8),
      *extra_in)

    dx_t, dk_p, dv_p, dwq2, dbq2, dwp2, dbp2, dg2, dbe2 = outs
    dx = dx_t[:, :n, :d]
    dk = dk_p[:, :, :m, :hd].astype(k.dtype)
    dv = dv_p[:, :, :m, :hd].astype(v.dtype)
    # collapse the head stripes back to the packed [d, d] layouts
    dwq = dwq2.reshape(d_pad, h, hd_pad)[:d, :, :hd].reshape(d, d).astype(wq.dtype)
    dbq = dbq2.reshape(h, hd_pad)[:, :hd].reshape(d).astype(bq.dtype)
    dwp = dwp2.reshape(h, hd_pad, d_pad)[:, :hd, :d].reshape(d, d).astype(wp.dtype)
    dbp = dbp2[0, :d].astype(bp.dtype)
    dg = dg2[0, :d].astype(ln_scale.dtype)
    dbe = dbe2[0, :d].astype(ln_bias.dtype)
    return (dx, dk, dv, dg, dbe, dwq, dbq, dwp, dbp,
            jnp.zeros_like(row_scale))


_fused_block_attention_vjp.defvjp(_fba_fwd, _fba_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "eps", "num_heads"))
def _fba_impl(x: jax.Array, k: jax.Array, v: jax.Array,
              ln_scale: jax.Array, ln_bias: jax.Array,
              wq: jax.Array, bq: jax.Array,
              wp: jax.Array, bp: jax.Array,
              row_scale: jax.Array,
              *, scale: float, eps: float, num_heads: int) -> jax.Array:
    p = _prep(x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, num_heads)
    b, n, d = p["b"], p["n"], p["d"]
    h, d_pad, hd_pad, m_pad = p["h"], p["d_pad"], p["hd_pad"], p["m_pad"]
    tile, n_pad = p["tile"], p["n_pad"]
    sf = _expand_row_scale(row_scale, b, n_pad, tile)

    grid = (b, n_pad // tile)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, eps=eps, dim=d, kv_len=p["m"],
                          num_heads=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, hd_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, hd_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, h * hd_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * hd_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h * hd_pad, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, tile // 8), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (d_pad * h * hd_pad * 2 + h * m_pad * hd_pad * 2),
            bytes_accessed=(2 * b * n_pad * d_pad
                            + b * 2 * h * m_pad * hd_pad) * x.dtype.itemsize,
            transcendentals=b * n * h * m_pad,
        ),
    )(p["xp"], p["kp"], p["vp"], p["wq2"], p["bq2"], p["wp2"], p["bp2"],
      p["g2"], p["be2"], sf)

    return out[:, :n, :d]


@functools.partial(jax.jit, static_argnames=("scale", "eps", "num_heads"))
def _fba_impl_stats(x: jax.Array, k: jax.Array, v: jax.Array,
                    ln_scale: jax.Array, ln_bias: jax.Array,
                    wq: jax.Array, bq: jax.Array,
                    wp: jax.Array, bp: jax.Array,
                    row_scale: jax.Array,
                    *, scale: float, eps: float, num_heads: int):
    """_fba_impl that ALSO returns the per-row forward statistics
    ([B, N, S] fp32, S = round_up(2+2H, 8): LN mean/inv_std + per-head
    softmax row_max/inv_denom) for the save-activations backward.  The
    side output is ~S*4 bytes/row — for stage 1 at B=150 that is ~20 MB
    vs the ~324 MB/block a persisted P would stream."""
    p = _prep(x, k, v, ln_scale, ln_bias, wq, bq, wp, bp, num_heads,
              stats=True)
    b, n, d = p["b"], p["n"], p["d"]
    h, d_pad, hd_pad, m_pad = p["h"], p["d_pad"], p["hd_pad"], p["m_pad"]
    tile, n_pad = p["tile"], p["n_pad"]
    sf = _expand_row_scale(row_scale, b, n_pad, tile)
    s_lanes = _stats_lanes(h)

    grid = (b, n_pad // tile)
    out, stats = pl.pallas_call(
        functools.partial(_kernel_stats, scale=scale, eps=eps, dim=d,
                          kv_len=p["m"], num_heads=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, hd_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, hd_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, h * hd_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * hd_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h * hd_pad, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, tile // 8), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, s_lanes), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, d_pad), x.dtype),
            jax.ShapeDtypeStruct((b, n_pad, s_lanes), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (d_pad * h * hd_pad * 2 + h * m_pad * hd_pad * 2),
            bytes_accessed=(2 * b * n_pad * d_pad
                            + b * 2 * h * m_pad * hd_pad) * x.dtype.itemsize
                           + b * n_pad * s_lanes * 4,
            transcendentals=b * n * h * m_pad,
        ),
    )(p["xp"], p["kp"], p["vp"], p["wq2"], p["bq2"], p["wp2"], p["bp2"],
      p["g2"], p["be2"], sf)

    return out[:, :n, :d], stats[:, :n]


@functools.partial(jax.jit, static_argnames=("scale", "eps", "num_heads",
                                             "dim", "kv_len"))
def fused_block_attention_padded(x: jax.Array, k: jax.Array, v: jax.Array,
                                 ln_scale: jax.Array, ln_bias: jax.Array,
                                 wq: jax.Array, bq: jax.Array,
                                 wp: jax.Array, bp: jax.Array,
                                 *, scale: float, eps: float, num_heads: int,
                                 dim: int, kv_len: int) -> jax.Array:
    """Inference attention half on an ALREADY lane-padded stage stream.

    x: [B, N, D_pad] with lanes [dim, D_pad) zero; k/v: [B, H, M_pad, 128]
    already in the kernel's padded per-head layout (as emitted by
    ops/sr_kv.fused_ln_sr_kv), kv_len = logical M.  Returns the padded
    stream with pad lanes preserved (zero) — no pad/unpad copies of the
    full stream, which is what made the 'mega' path throughput-neutral for
    PVT-v2 (models/pvlt.py round-3 note).  Serving-only: no VJP (training
    keeps fused_block_attention's unpadded custom-VJP form)."""
    b, n, d_pad = x.shape
    h = num_heads
    hd = dim // h
    hd_pad = 128
    m_pad = k.shape[2]
    assert d_pad == _round_up(dim, 128) and d_pad % 128 == 0
    assert k.shape[1] == h and k.shape[3] == hd_pad

    dtype = x.dtype
    # per-head 128-lane weight stripes from the logical [dim, dim] params
    # (same expansion as _prep, with the stream pad width)
    wq2 = jnp.zeros((d_pad, h, hd_pad), dtype).at[:dim, :, :hd].set(
        wq.astype(dtype).reshape(dim, h, hd)).reshape(d_pad, h * hd_pad)
    bq2 = jnp.zeros((h, hd_pad), jnp.float32).at[:, :hd].set(
        bq.astype(jnp.float32).reshape(h, hd)).reshape(1, h * hd_pad)
    wp2 = jnp.zeros((h, hd_pad, d_pad), dtype).at[:, :hd, :dim].set(
        wp.astype(dtype).reshape(h, hd, dim)).reshape(h * hd_pad, d_pad)
    bp2 = jnp.zeros((1, d_pad), jnp.float32).at[0, :dim].set(
        bp.astype(jnp.float32))
    g2 = jnp.zeros((1, d_pad), jnp.float32).at[0, :dim].set(
        ln_scale.astype(jnp.float32))
    be2 = jnp.zeros((1, d_pad), jnp.float32).at[0, :dim].set(
        ln_bias.astype(jnp.float32))

    # row-tile plan (same VMEM model as _prep's forward branch, dtype-sized
    # from itemsize — ADVICE r4: identical to the measured bf16 plan at
    # esz=2, true 2x live bytes for an fp32 stream)
    esz = dtype.itemsize
    per_row = m_pad * 4 + h * hd_pad * 2 * esz + d_pad * (6 + 2 * esz)
    fixed = (2 * d_pad * h * hd_pad + 2 * h * m_pad * hd_pad) * (esz - 2)
    budget = max(2 * 1024 * 1024, 13 * 1024 * 1024 - max(0, fixed))
    cap = max(256, budget // per_row // 8 * 8)
    num_tiles = max(1, -(-n // cap))
    tile = _round_up(-(-n // num_tiles), 128)
    n_pad = _round_up(n, tile)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0))) if n_pad != n else x
    sf = jnp.ones((b, n_pad // tile, 8, tile // 8), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, eps=eps, dim=dim,
                          kv_len=kv_len, num_heads=h),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, hd_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, hd_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, h * hd_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * hd_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h * hd_pad, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, tile // 8), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d_pad), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (d_pad * h * hd_pad * 2 + h * m_pad * hd_pad * 2),
            bytes_accessed=(2 * b * n_pad * d_pad
                            + b * 2 * h * m_pad * hd_pad) * dtype.itemsize,
            transcendentals=b * n * h * m_pad,
        ),
    )(xp, k.astype(dtype), v.astype(dtype), wq2, bq2, wp2, bp2, g2, be2, sf)

    return out[:, :n] if n_pad != n else out


def fused_block_attention(x: jax.Array, k: jax.Array, v: jax.Array,
                          ln_scale: jax.Array, ln_bias: jax.Array,
                          wq: jax.Array, bq: jax.Array,
                          wp: jax.Array, bp: jax.Array,
                          row_scale: jax.Array | None = None,
                          *, scale: float, eps: float, num_heads: int,
                          save_stats: bool = False) -> jax.Array:
    """x: [B, N, D]; k, v: [B, H, M, hd] (already projected, hd = D/H).

    Returns x + row_scale * proj(attention(LN(x))) with everything
    full-stream fused; row_scale [B] folds per-sample DropPath (None =
    ones).  Differentiable: the backward is its own Pallas kernel (see
    module docstring), with XLA-autodiff fallback for shapes whose fixed
    VMEM blocks don't fit.

    save_stats=True (training): the forward persists per-row LN and
    softmax statistics ([B, N, S] fp32 side output, S = round_up(2+2H, 8))
    and the backward rebuilds nhat/P from them — no LN sum/sumsq or
    softmax max/sum reductions and no fp32 divide in the backward
    (VERDICT r4 #2a).  Ignored at XLA-fallback shapes.
    """
    if row_scale is None:
        row_scale = jnp.ones((x.shape[0],), jnp.float32)
    return _fused_block_attention_vjp(x, k, v, ln_scale, ln_bias, wq, bq,
                                      wp, bp, row_scale, scale, eps,
                                      num_heads, save_stats)
