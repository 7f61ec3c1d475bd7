"""Fused softmax-attention Pallas kernel for PVLT's SRA attention.

Shape regime (pvlt_tiny @ 256x256, SURVEY.md §3.2): the query sequence is the
joint [H*W + T] stream (4224 / 1152 / 384 / 192 per stage) while the KV
sequence after spatial reduction is tiny and *constant* per stage:
(H/sr)(W/sr) + T = 64 + 128 = 192 everywhere.  So unlike a decoder flash
attention, the whole K and V comfortably fit in VMEM and no online-softmax
streaming is needed: each grid step loads one Q tile, computes
softmax(Q K^T * scale) V in one pass — never materializing the [N, M]
probability matrix in HBM, which is exactly what the unfused XLA lowering
would spill for the 4224-token stage-1 sequence.

Layout: heads are folded into the grid's first axis; the head dim (64) is
zero-padded to the 128-lane width once at the JAX level (cheap, fused) so the
MXU tiles are fully populated on the KV side.

Fuses: scale * QK^T -> row-max -> exp -> row-sum -> (P V) / sum, accumulated
in float32 (bf16-safe).

Equivalence to the reference split-downsample-concat attention
(libs/pvlt.py:95-121) is asserted in tests/test_attention.py against the
einsum path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    """One (batch*head, q-tile) grid step.

    q_ref: [1, TILE_N, D]   k_ref/v_ref: [1, M_pad, D]   o_ref: [1, TILE_N, D]
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale

    m_pad = k.shape[0]
    if kv_len < m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, -jnp.inf)

    row_max = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - row_max)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = (unnorm / denom).astype(v.dtype)

    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float) -> jax.Array:
    """softmax(q k^T * scale) v with KV resident in VMEM.

    Args:
      q: [B, H, N, D]; k, v: [B, H, M, D].  M (SRA-reduced KV length) must be
        small enough for K and V to fit VMEM (true for all PVLT stages).
    Returns:
      [B, H, N, D] in q.dtype.
    """
    b, h, n, d = q.shape
    m = k.shape[2]

    # Fold batch & heads into one grid axis; pad to hardware tiles.
    d_pad = _round_up(d, 128)
    m_pad = _round_up(m, 128 if q.dtype != jnp.bfloat16 else 128)
    tile_n = min(_round_up(n, 8), 1024)
    n_pad = _round_up(n, tile_n)

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, m, d)
    vf = v.reshape(b * h, m, d)
    if d_pad != d:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, d_pad - d)))
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, d_pad - d)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, d_pad - d)))
    if n_pad != n:
        qf = jnp.pad(qf, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        kf = jnp.pad(kf, ((0, 0), (0, m_pad - m), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, m_pad - m), (0, 0)))

    grid = (b * h, n_pad // tile_n)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * m * d * 2,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * n * m,
        ),
    )(qf, kf, vf)

    out = out[:, :n, :d].reshape(b, h, n, d)
    return out
