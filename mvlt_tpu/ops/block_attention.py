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

y = x + ( concat_h softmax(LN(x) Wq_h K_h^T * scale) V_h ) Wp + bp
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.kernel_math import (one_pass_ln, round_up as _round_up,
                                      softmax_av)

_LOGITS_BUDGET = 4 * 1024 * 1024


def _kernel(x_ref, k_ref, v_ref, wq_ref, bq_ref, wp_ref, bp_ref, g_ref, be_ref,
            o_ref, *, scale: float, eps: float, dim: int, kv_len: int,
            num_heads: int):
    """x_ref/o_ref: [1, TILE, D_pad]; k_ref/v_ref: [1, H, M_pad, 128];
    wq_ref: [D_pad, H*128]; wp_ref: [H*128, D_pad]."""
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
    o_ref[0] = (xf + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "eps", "num_heads"))
def fused_block_attention(x: jax.Array, k: jax.Array, v: jax.Array,
                          ln_scale: jax.Array, ln_bias: jax.Array,
                          wq: jax.Array, bq: jax.Array,
                          wp: jax.Array, bp: jax.Array,
                          *, scale: float, eps: float, num_heads: int) -> jax.Array:
    """x: [B, N, D]; k, v: [B, H, M, hd] (already projected, hd = D/H).

    Returns x + proj(attention(LN(x))) with everything full-stream fused.
    """
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
    wq = wq.astype(dtype).reshape(d, h, hd)
    wq2 = jnp.zeros((d_pad, h, hd_pad), dtype)
    wq2 = wq2.at[:d, :, :hd].set(wq)
    wq2 = wq2.reshape(d_pad, h * hd_pad)
    bq2 = jnp.zeros((h, hd_pad), jnp.float32).at[:, :hd].set(
        bq.astype(jnp.float32).reshape(h, hd)).reshape(1, h * hd_pad)
    # expand Wp with matching zero rows
    wp = wp.astype(dtype).reshape(h, hd, d)
    wp2 = jnp.zeros((h, hd_pad, d_pad), dtype)
    wp2 = wp2.at[:, :hd, :d].set(wp)
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
    per_row = m_pad * 4 + h * hd_pad * 4 + d_pad * 10
    cap = max(256, (13 * 1024 * 1024) // per_row // 8 * 8)
    num_tiles = max(1, -(-n // cap))
    tile = _round_up(-(-n // num_tiles), 128)
    n_pad = _round_up(n, tile)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, d_pad - d))) \
        if (n_pad != n or d_pad != d) else x

    grid = (b, n_pad // tile)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, eps=eps, dim=d, kv_len=m,
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
        ],
        out_specs=pl.BlockSpec((1, tile, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (d_pad * h * hd_pad * 2 + h * m_pad * hd_pad * 2),
            bytes_accessed=2 * b * n * d_pad * x.dtype.itemsize,
            transcendentals=b * n * h * m_pad,
        ),
    )(xp, kp, vp, wq2, bq2, wp2, bp2, g2, be2)

    return out[:, :n, :d]
