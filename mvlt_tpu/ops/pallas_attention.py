"""Fused softmax-attention Pallas kernel for PVLT's SRA attention.

Shape regime (pvlt_tiny @ 256x256, SURVEY.md §3.2): the query sequence is the
joint [H*W + T] stream (4224 / 1152 / 384 / 192 per stage) while the KV
sequence after spatial reduction is tiny and *constant* per stage:
(H/sr)(W/sr) + T = 64 + 128 = 192.  So unlike decoder flash attention the
whole K and V fit in VMEM and no online-softmax streaming is needed.

Why fusion matters here: the unfused XLA lowering materializes the
[B, heads, N, M] logits in HBM and walks it several times for the softmax —
at stage 1 (B=404) that tensor is ~1.2 GB, and measured ablation shows
stage-1 attention alone costing >50% of the forward pass.  This kernel keeps
the logits entirely in VMEM.

Grid layout (the part that makes it fast): ONE grid step per (batch, q-tile)
pair covering ALL heads — per-step work is hundreds of microseconds, so the
fixed grid-step overhead amortizes.  An earlier revision used a step per
(batch*heads) with small tiles and was *slower* than XLA (2704 vs 2867
pairs/s end-to-end); this layout is chosen from that measurement.

Head loop is a static Python unroll inside the kernel; each head's
QK^T -> mask -> softmax -> PV chain runs on MXU/VPU with float32
accumulation.  The head dim (64) is zero-padded to the 128-lane width once
at the JAX level.

Equivalence vs the einsum path is asserted in tests/test_attention.py
(interpret mode) and tools/tpu_attn_check.py (compiled, on-device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.kernel_math import LOG2E, round_up as _round_up, softmax_av

# per-step VMEM budget for the fp32 logits scratch (bytes)
_LOGITS_BUDGET = 6 * 1024 * 1024


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                 num_heads: int):
    """One (batch, q-tile) grid step over all heads.

    q_ref/o_ref: [1, H, TILE_N, D]   k_ref/v_ref: [1, H, M_pad, D]
    """
    for h in range(num_heads):
        o_ref[0, h] = softmax_av(q_ref[0, h], k_ref[0, h], v_ref[0, h],
                                 scale=scale, kv_len=kv_len,
                                 out_dtype=o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                     scale: float, kv_len: int, num_heads: int):
    """Backward grid step: recompute P, then
    dV += P^T dO;  dP = dO V^T;  dS = P*(dP - rowsum(dP*P))*scale;
    dQ = dS K;  dK += dS^T Q.
    dk/dv blocks revisit the same output slot across q-tiles (sequential
    grid) and are initialized at the first tile.
    """
    j = pl.program_id(1)
    m_pad = k_ref.shape[2]

    @pl.when(j == 0)
    def _():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    for h in range(num_heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h].astype(jnp.float32)

        # exp2 with log2(e) folded into the scale (kernel_math policy); the
        # backward needs P explicitly, so the normalizer division stays
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * LOG2E)
        if kv_len < m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < kv_len, logits, -jnp.inf)
        row_max = jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp2(logits - row_max)
        p = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)  # fp32 [tile, m]

        pb = p.astype(q.dtype)
        dob = do.astype(q.dtype)
        dv_ref[0, h] += jax.lax.dot_general(
            pb, dob, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            dob, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        tmp = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - tmp) * scale).astype(q.dtype)
        dq_ref[0, h] = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, h] += jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention_vjp(q, k, v, scale):
    return _fused_attention_impl(q, k, v, scale=scale)


def _fused_attention_fwd(q, k, v, scale):
    return _fused_attention_impl(q, k, v, scale=scale), (q, k, v)


def _fused_attention_bwd(scale, res, do):
    q, k, v = res
    b, h, n, d = q.shape
    m = k.shape[2]
    d_pad = _round_up(d, 128)
    m_pad = _round_up(m, 128)
    max_tile = max(512, _LOGITS_BUDGET // (h * m_pad * 4))
    tile_n = min(_round_up(n, 128), _round_up(max_tile, 128))
    n_pad = _round_up(n, tile_n)

    def pad4(x, n_target):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_target - x.shape[2]),
                        (0, d_pad - x.shape[3])))
        return x

    qp = pad4(q, n_pad)
    dop = pad4(do, n_pad)
    kp = pad4(k, m_pad)
    vp = pad4(v, m_pad)

    grid = (b, n_pad // tile_n)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, kv_len=m, num_heads=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, tile_n, d_pad), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, d_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, d_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, tile_n, d_pad), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, tile_n, d_pad), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, d_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, d_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, m_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b, h, m_pad, d_pad), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qp, kp, vp, dop)
    return dq[:, :, :n, :d], dk[:, :, :m, :d], dv[:, :, :m, :d]


fused_attention_vjp.defvjp(_fused_attention_fwd, _fused_attention_bwd)


@functools.partial(jax.jit, static_argnames=("scale",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float) -> jax.Array:
    """softmax(q k^T * scale) v with logits resident in VMEM; differentiable
    (custom VJP recomputes the probabilities in a backward Pallas kernel).

    Args:
      q: [B, H, N, D]; k, v: [B, H, M, D].  M (SRA-reduced KV length) must be
        small enough for K/V + one logits tile to fit VMEM (true for all
        PVLT stages).
    Returns:
      [B, H, N, D] in q.dtype.
    """
    return fused_attention_vjp(q, k, v, scale)


@functools.partial(jax.jit, static_argnames=("scale",))
def _fused_attention_impl(q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float) -> jax.Array:
    b, h, n, d = q.shape
    m = k.shape[2]

    d_pad = _round_up(d, 128)
    m_pad = _round_up(m, 128)

    # One q-tile per batch element when the fp32 logits for all heads fit
    # the VMEM budget; otherwise split N.
    max_tile = max(512, _LOGITS_BUDGET // (h * m_pad * 4))
    tile_n = min(_round_up(n, 128), _round_up(max_tile, 128))
    n_pad = _round_up(n, tile_n)

    if d_pad != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))

    grid = (b, n_pad // tile_n)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=m, num_heads=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, tile_n, d_pad), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, d_pad), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, d_pad), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, tile_n, d_pad), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * m_pad * d_pad,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=b * h * n * m_pad,
        ),
    )(q, k, v)

    return out[:, :, :n, :d]
