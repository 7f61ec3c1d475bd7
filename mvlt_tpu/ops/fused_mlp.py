"""Fused LayerNorm -> Dense -> GELU -> Dense -> +residual Pallas kernel.

The transformer block's MLP is the HBM-bandwidth hog of the early PVLT
stages: at stage 1 (B=404, 4224 tokens, dim 64, ratio 8) the hidden
activation is [1.7M, 512] (~1.7 GB bf16) and the unfused lowering writes and
re-reads it plus several LayerNorm/GELU passes.  This kernel streams row
tiles of x once, keeps the hidden tile entirely in VMEM, and writes only the
final residual-added output: HBM traffic drops from ~7 GB to ~0.9 GB per
stage-1 MLP.

y = x + (LN(x) @ W1 + b1 |> gelu_erf) @ W2 + b2

Weights/LN params are broadcast to every grid step (both fit VMEM: at most
[64,512]+[512,64] bf16 = 128 KB at stage 1, [512,2048] = 2 MB at stage 4).

The erf GELU matches the reference's exact form (libs/vl_heads.py:7-14).
LayerNorm statistics are computed in float32; matmuls accumulate in float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf(x: jax.Array) -> jax.Array:
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7) — Mosaic
    has no erf/erfc lowering; exp it does.  fp32 in/out."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref, o_ref,
            *, eps: float, dim: int):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    d_pad = x.shape[-1]
    if dim < d_pad:
        # masked LN statistics over the real feature width
        col = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1)
        valid = col < dim
        xz = jnp.where(valid, xf, 0.0)
        mean = jnp.sum(xz, axis=-1, keepdims=True) / dim
        var = jnp.sum(jnp.where(valid, (xf - mean) ** 2, 0.0), axis=-1,
                      keepdims=True) / dim
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    normed = normed * g_ref[0].astype(jnp.float32) + be_ref[0].astype(jnp.float32)
    normed = normed.astype(x.dtype)

    h = jax.lax.dot_general(
        normed, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    h = (0.5 * h * (1.0 + _erf(h * 0.7071067811865476))).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (xf + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_ln_mlp(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                 w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
                 *, eps: float = 1e-6) -> jax.Array:
    """x: [B, N, D] -> x + MLP(LN(x)); weights w1 [D, H], w2 [H, D].

    Inference-path kernel (no custom VJP yet): callers gate on
    ``deterministic`` so the training backward pass uses the XLA lowering.
    """
    b, n, d = x.shape
    hdim = w1.shape[1]
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1 = b1.astype(jnp.float32)
    b2 = b2.astype(jnp.float32)
    ln_scale = ln_scale.astype(jnp.float32)
    ln_bias = ln_bias.astype(jnp.float32)

    d_pad = _round_up(d, 128)
    h_pad = _round_up(hdim, 128)
    rows = b * n
    # VMEM budget: hidden tile fp32+bf16 (~6 bytes/col) + normed/x/out tiles
    # (~12 bytes of d_pad per row incl. double buffering) must fit ~10 MB.
    per_row = h_pad * 6 + d_pad * 12
    tile = max(256, min(2048, (10 * 1024 * 1024 // per_row) // 8 * 8))
    tile = min(tile, _round_up(rows, 8))
    rows_pad = _round_up(rows, tile)

    xf = x.reshape(rows, d)
    if d_pad != d:
        xf = jnp.pad(xf, ((0, 0), (0, d_pad - d)))
        w1p = jnp.pad(w1, ((0, d_pad - d), (0, h_pad - hdim)))
        w2p = jnp.pad(w2, ((0, h_pad - hdim), (0, d_pad - d)))
        gp = jnp.pad(ln_scale, (0, d_pad - d))[None, :]
        bep = jnp.pad(ln_bias, (0, d_pad - d))[None, :]
        b2p = jnp.pad(b2, (0, d_pad - d))[None, :]
    else:
        w1p = jnp.pad(w1, ((0, 0), (0, h_pad - hdim))) if h_pad != hdim else w1
        w2p = jnp.pad(w2, ((0, h_pad - hdim), (0, 0))) if h_pad != hdim else w2
        gp, bep, b2p = ln_scale[None, :], ln_bias[None, :], b2[None, :]
    b1p = (jnp.pad(b1, (0, h_pad - hdim)) if h_pad != hdim else b1)[None, :]
    if rows_pad != rows:
        xf = jnp.pad(xf, ((0, rows_pad - rows), (0, 0)))

    xf = xf.reshape(rows_pad // tile, tile, d_pad)
    grid = (rows_pad // tile,)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, dim=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, h_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad // tile, tile, d_pad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d_pad * h_pad,
            bytes_accessed=2 * rows * d_pad * x.dtype.itemsize,
            transcendentals=rows * h_pad,
        ),
    )(xf, w1p, b1p, w2p, b2p, gp, bep)

    out = out.reshape(rows_pad, d_pad)[:rows, :d]
    return out.reshape(b, n, d)
