"""Shared in-kernel math for the Pallas kernel ladder.

Everything here is shaped by one measurement: on v5e the whole-block kernel's
gap to its matmul floor is pure VPU time, and the fp32 **divide** is the
single most expensive element-wise op (tools/bench_block_vpu.py, scan
harness, stage-1 shapes, ms/block):

    full (A&S erf GELU)     4.644      erf minus its exp     4.666 (!)
    exp alone               3.619      tanh GELU             3.604
    identity GELU           3.598      no softmax            3.294
    no LayerNorms           2.967      matmuls only          ~1.0

  * The A&S erf polynomial costs 1.05 ms/block and the cost is its
    ``1/(1+p|x|)`` divide, NOT the exp (removing the exp changes nothing;
    exp alone is free).  The tanh-form GELU measures identical to an
    identity activation, and its max error vs exact erf-GELU (4.7e-4 abs)
    is below the bf16 quantization noise the compute path already carries,
    so kernels default to it (ModelConfig.kernel_gelu; "erf" restores the
    A&S form and is what the fp32 XLA paths always use).
  * Softmax: fold log2(e) into the logit scale and use exp2; apply the
    normalizer AFTER the P@V matmul (divide [rows, 128] once instead of
    [rows, M_pad]) — 0.26 ms/block.
  * LayerNorm: one-pass sum/sum-of-squares statistics instead of
    jnp.mean + jnp.var (which walks the tile twice more).  Cancellation
    error is ~1e-7 * mean^2/var — far below bf16 output resolution for
    residual-stream magnitudes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG2E = 1.4426950408889634


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def erf(x: jax.Array) -> jax.Array:
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7) — Mosaic
    has no erf/erfc lowering; exp it does.  fp32 in/out.  NB: contains an
    fp32 divide — expensive on the VPU; kernels prefer gelu(kind='tanh')."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


_TANH_C = 0.7978845608028654  # sqrt(2/pi)
_TANH_K = 0.044715


def gelu(h: jax.Array, kind: str = "tanh") -> jax.Array:
    """GELU on fp32, selectable form (see module docstring for the policy)."""
    if kind == "tanh":
        return 0.5 * h * (1.0 + jnp.tanh(_TANH_C * (h + _TANH_K * h * h * h)))
    if kind == "erf":
        return 0.5 * h * (1.0 + erf(h * 0.7071067811865476))
    raise ValueError(f"unknown gelu kind {kind!r}")


def gelu_grad(h: jax.Array, kind: str = "tanh") -> jax.Array:
    """d gelu(h) / dh, matching the forward ``kind`` exactly."""
    if kind == "tanh":
        u = _TANH_C * (h + _TANH_K * h * h * h)
        t = jnp.tanh(u)
        du = _TANH_C * (1.0 + 3.0 * _TANH_K * h * h)
        return 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * du
    if kind == "erf":
        cdf = 0.5 * (1.0 + erf(h * 0.7071067811865476))
        pdf = 0.3989422804014327 * jnp.exp(-0.5 * h * h)
        return cdf + h * pdf
    raise ValueError(f"unknown gelu kind {kind!r}")


def one_pass_ln(xf: jax.Array, dim: int, eps: float,
                gamma: jax.Array, beta: jax.Array) -> jax.Array:
    """fp32 LayerNorm over the first ``dim`` lanes of a (possibly
    lane-padded) [rows, d_pad] tile, single-pass statistics.  Padded lanes
    produce garbage that every consumer masks via zero-padded weight rows."""
    return one_pass_ln_stats(xf, dim, eps, gamma, beta)[0]


def one_pass_ln_stats(xf: jax.Array, dim: int, eps: float,
                      gamma: jax.Array, beta: jax.Array):
    """one_pass_ln returning ``(normed, mean, inv_std)`` — the [rows, 1]
    fp32 statistics a save-activations backward persists so it can rebuild
    ``nhat`` with two multiplies instead of two tile reductions
    (ops/block_attention.py stats mode)."""
    d_pad = xf.shape[-1]
    if dim < d_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1)
        xz = jnp.where(col < dim, xf, 0.0)
    else:
        xz = xf
    s1 = jnp.sum(xz, axis=-1, keepdims=True)
    s2 = jnp.sum(xz * xz, axis=-1, keepdims=True)
    mean = s1 / dim
    var = s2 / dim - mean * mean
    inv_std = jax.lax.rsqrt(var + eps)
    return (xf - mean) * inv_std * gamma + beta, mean, inv_std


def packed_ln(xf: jax.Array, a_half: jax.Array, eps: float,
              gamma2: jax.Array, beta2: jax.Array) -> jax.Array:
    """fp32 LayerNorm on a PACKED [rows, 128] tile holding two independent
    64-lane tokens per row (ops/block_packed.py).  Per-half mean/var are
    computed by one matmul each against ``a_half`` — the [128, 128]
    block-diagonal averaging matrix blockdiag(J/64, J/64) — so the stats land
    broadcast in the right lane half straight off the (otherwise idle) MXU
    instead of via lane-masked VPU reductions.  gamma2/beta2 are the LN
    affine params duplicated across both halves."""
    mean = jax.lax.dot_general(
        xf, a_half, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    sq = jax.lax.dot_general(
        xf * xf, a_half, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    var = sq - mean * mean
    return (xf - mean) * jax.lax.rsqrt(var + eps) * gamma2 + beta2


def half_average_matrix(dim: int = 64, d_pad: int = 128) -> jax.Array:
    """blockdiag(J/dim, J/dim) in fp32 — packed_ln's stats operand."""
    i = jax.lax.broadcasted_iota(jnp.int32, (d_pad, d_pad), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (d_pad, d_pad), 1)
    return jnp.where((i // dim) == (j // dim), 1.0 / dim, 0.0).astype(jnp.float32)


def softmax_av_pair(q_p: jax.Array, k_p: jax.Array, v_p: jax.Array, *,
                    scale: float, kv_len: int, m_pad: int,
                    out_dtype) -> jax.Array:
    """Joint attention for a HEAD PAIR sharing one 128-lane stripe (head A
    in lanes 0:64, head B in lanes 64:128 — the hp2 layout,
    ops/block_fused.py).

    k_p/v_p: [2*m_pad, 128] with head A's KV rows in rows 0:m_pad (values
    in lanes 0:64, rest zero) and head B's in rows m_pad:2*m_pad (values in
    lanes 64:128).  One [rows,128]@[128,2M] matmul computes BOTH heads'
    logits side by side — for each K row only its own head's lanes are
    nonzero, so the full-lane contraction is exact — and one
    [rows,2M]@[2M,128] P@V lands each head's output in its own lane half
    (the other half's V lanes are zero).  Each half normalizes by its OWN
    softmax sum; a single global row max is used for the exp2 shift
    (softmax is shift-invariant per half, so this is exact; worst case a
    cold half loses a few mantissa bits, well under bf16 output noise).

    A dummy hi half (odd head count: K/V rows all-zero) yields uniform
    probs against all-zero V -> exact zeros in lanes 64:128; it must NOT be
    -inf-masked (an empty softmax would produce NaN via 0/0)."""
    logits = jax.lax.dot_general(
        q_p, k_p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (scale * LOG2E)                                # [rows, 2*m_pad]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    if kv_len < m_pad:
        # NB: no `col % m_pad` — integer mod by a non-power-of-2 lowers to
        # the VPU divide, the most expensive elementwise primitive here
        # (CLAUDE.md); two compares are effectively free
        keep = (col < kv_len) | ((col >= m_pad) & (col < m_pad + kv_len))
        logits = jnp.where(keep, logits, -jnp.inf)
    row_max = jnp.max(logits, axis=-1, keepdims=True)  # global (shared) max
    unnorm = jnp.exp2(logits - row_max)
    is_lo = col < m_pad
    sum_a = jnp.sum(jnp.where(is_lo, unnorm, 0.0), axis=-1, keepdims=True)
    sum_b = jnp.sum(jnp.where(is_lo, 0.0, unnorm), axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        unnorm.astype(v_p.dtype), v_p,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [rows, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    out = out / jnp.where(lane < 64, sum_a, sum_b)
    return out.astype(out_dtype)


def softmax_av(q_h: jax.Array, k_h: jax.Array, v_h: jax.Array, *,
               scale: float, kv_len: int, out_dtype) -> jax.Array:
    """softmax(q k^T * scale) @ v for one head, VPU-lean form:
    log2(e) folded into the scale, exp2, and the softmax normalizer applied
    to the [rows, hd] output of P@V instead of the [rows, M_pad] P.
    fp32 logits; P@V accumulates fp32; returns out_dtype."""
    return softmax_av_stats(q_h, k_h, v_h, scale=scale, kv_len=kv_len,
                            out_dtype=out_dtype)[0]


def softmax_av_stats(q_h: jax.Array, k_h: jax.Array, v_h: jax.Array, *,
                     scale: float, kv_len: int, out_dtype):
    """softmax_av returning ``(out, row_max, inv_denom)`` — the [rows, 1]
    fp32 softmax statistics (max in exp2 units, reciprocal normalizer) a
    save-activations backward persists so P rebuilds as
    ``exp2(logits - row_max) * inv_denom``: one matmul + one exp2, no max
    or sum reduction and no fp32 divide (ops/block_attention.py stats
    mode)."""
    m_pad = k_h.shape[0]
    logits = jax.lax.dot_general(
        q_h, k_h,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (scale * LOG2E)
    if kv_len < m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, -jnp.inf)
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp2(logits - row_max)            # exp2(-inf) == 0: mask holds
    inv_denom = 1.0 / jnp.sum(unnorm, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        unnorm.astype(v_h.dtype), v_h,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_denom
    return out.astype(out_dtype), row_max, inv_denom
