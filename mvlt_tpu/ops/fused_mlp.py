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

from mvlt_tpu.ops.kernel_math import erf as _erf
from mvlt_tpu.ops.kernel_math import gelu as _gelu
from mvlt_tpu.ops.kernel_math import gelu_grad as _gelu_grad
from mvlt_tpu.ops.kernel_math import (half_average_matrix, packed_ln,
                                      round_up as _round_up)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref, s_ref, o_ref,
            *, eps: float, dim: int, gelu: str = "tanh", pack2: bool = False):
    """s_ref: [1, TILE] per-row residual-branch scale (DropPath mask/keep;
    all-ones when inactive).  pack2: the tile holds TWO dim-wide tokens per
    128-lane row (block_packed.py layout) — LN stats per lane half via the
    block-diagonal averaging matmul; weights arrive pre-block-diagonalized."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    d_pad = x.shape[-1]
    if pack2:
        a = half_average_matrix(dim, d_pad)
        normed = packed_ln(xf, a, eps, g_ref[0].astype(jnp.float32),
                           be_ref[0].astype(jnp.float32)).astype(x.dtype)
    else:
        if dim < d_pad:
            # masked one-pass LN statistics over the real feature width
            col = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1)
            xz = jnp.where(col < dim, xf, 0.0)
        else:
            xz = xf
        mean = jnp.sum(xz, axis=-1, keepdims=True) / dim
        var = jnp.sum(xz * xz, axis=-1, keepdims=True) / dim - mean * mean
        normed = (xf - mean) * jax.lax.rsqrt(var + eps)
        normed = (normed * g_ref[0].astype(jnp.float32)
                  + be_ref[0].astype(jnp.float32))
        normed = normed.astype(x.dtype)

    h = jax.lax.dot_general(
        normed, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    h = _gelu(h, gelu).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    # per-row scale: s block is [8, TILE/8]; reshape y's leading (sublane)
    # dim to match instead of collapsing s (Mosaic can't mix sublane->lane)
    tile, dp = y.shape
    y_scaled = (y.reshape(8, tile // 8, dp) * s_ref[0][:, :, None]).reshape(tile, dp)
    o_ref[0] = (xf + y_scaled).astype(o_ref.dtype)


def _mlp_bwd_kernel(x_ref, dy_ref, w1_ref, b1_ref, w2_ref, g_ref, be_ref, s_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbe_ref,
                    *, eps: float, dim: int, gelu: str = "tanh",
                    pack2: bool = False):
    """Backward grid step: recompute the forward chain for one row tile,
    emit dx for the tile and accumulate weight/LN grads (sequential grid,
    init at step 0).  All accumulation in fp32.

    pack2: packed two-tokens-per-row layout — LN stats (and the LN-backward
    m1/m2 reductions) broadcast per lane half via the block-diagonal
    averaging matmul; dw/db/dLN accumulators stay in the PACKED (block-diag
    / duplicated) layout and the wrapper folds the two halves after the
    grid."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in (dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbe_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    x = x_ref[0]
    dy_out = dy_ref[0].astype(jnp.float32)
    # residual-branch cotangent carries the per-row DropPath scale (see the
    # forward kernel for the [8, TILE/8] layout rationale)
    tile_rows, dp0 = dy_out.shape
    dy = (dy_out.reshape(8, tile_rows // 8, dp0)
          * s_ref[0][:, :, None]).reshape(tile_rows, dp0)
    xf = x.astype(jnp.float32)
    d_pad = x.shape[-1]
    gamma = g_ref[0].astype(jnp.float32)
    beta = be_ref[0].astype(jnp.float32)

    # --- recompute forward (one-pass LN stats, matching _kernel) ---
    if pack2:
        a_half = half_average_matrix(dim, d_pad)
        valid = None
        mean = jax.lax.dot_general(
            xf, a_half, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sq = jax.lax.dot_general(
            xf * xf, a_half, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        var = sq - mean * mean
    else:
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
    nhat = (xf - mean) * inv_std                       # [tile, D]
    if valid is not None:
        nhat = jnp.where(valid, nhat, 0.0)
    normed = (nhat * gamma + beta).astype(x.dtype)
    h1 = (jax.lax.dot_general(normed, w1_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          + b1_ref[0].astype(jnp.float32))             # [tile, H] fp32
    g_act = _gelu(h1, gelu).astype(x.dtype)

    # --- backward ---
    # y = x + g W2 + b2
    db2_ref[...] += jnp.sum(dy, axis=0, keepdims=True).astype(db2_ref.dtype)
    dw2_ref[...] += jax.lax.dot_general(
        g_act, dy.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dw2_ref.dtype)
    dg_act = jax.lax.dot_general(
        dy.astype(x.dtype), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [tile, H]
    dh1 = dg_act * _gelu_grad(h1, gelu)
    db1_ref[...] += jnp.sum(dh1, axis=0, keepdims=True).astype(db1_ref.dtype)
    dh1b = dh1.astype(x.dtype)
    dw1_ref[...] += jax.lax.dot_general(
        normed, dh1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dw1_ref.dtype)
    dnormed = jax.lax.dot_general(
        dh1b, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [tile, D]
    if valid is not None:
        dnormed = jnp.where(valid, dnormed, 0.0)
    dg_ref[...] += jnp.sum(dnormed * nhat, axis=0, keepdims=True).astype(dg_ref.dtype)
    dbe_ref[...] += jnp.sum(dnormed, axis=0, keepdims=True).astype(dbe_ref.dtype)
    # LN backward (mean/var over `dim` real features; per lane half in pack2)
    dnhat = dnormed * gamma
    if pack2:
        m1 = jax.lax.dot_general(
            dnhat, a_half, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m2 = jax.lax.dot_general(
            dnhat * nhat, a_half, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        m1 = jnp.sum(dnhat, axis=-1, keepdims=True) / dim
        m2 = jnp.sum(dnhat * nhat, axis=-1, keepdims=True) / dim
    dx_ln = (dnhat - m1 - nhat * m2) * inv_std
    if valid is not None:
        dx_ln = jnp.where(valid, dx_ln, 0.0)
    dx_ref[0] = (dy_out + dx_ln).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _fused_ln_mlp_vjp(x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale, eps,
                      gelu, pack2):
    return _fused_ln_mlp_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale,
                              eps=eps, gelu=gelu, pack2=pack2)


def _fused_ln_mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale, eps,
                      gelu, pack2):
    out = _fused_ln_mlp_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale,
                             eps=eps, gelu=gelu, pack2=pack2)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale)


def _xla_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale, eps, gelu):
    """Reference XLA expression (used for backward when the kernel's fixed
    VMEM blocks — weights + fp32 weight-grad outputs — don't fit)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    nrm = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale.astype(jnp.float32)
           + ln_bias.astype(jnp.float32)).astype(x.dtype)
    h = jax.lax.dot_general(nrm, w1.astype(x.dtype), (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h = _gelu(h, gelu).astype(x.dtype)
    y = jax.lax.dot_general(h, w2.astype(x.dtype), (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
    return (xf + row_scale.astype(jnp.float32)[:, None, None] * y).astype(x.dtype)


def _fused_ln_mlp_bwd(eps, gelu, pack2, res, dy):
    x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale = res
    b, n, d = x.shape
    hdim = w1.shape[1]
    pack = bool(pack2) and d * 2 == 128 and n % 2 == 0
    if pack:
        # packed layout: two dim-64 tokens per 128-lane row — the [rows, 64]
        # -> [rows, 128] pad/slice copies of x, dy and dx vanish (free
        # reshapes) and the kernel streams half the padded bytes.  dw/db/dLN
        # accumulate block-diagonally and fold after the grid.
        d_pad = 128
        h_pad = _round_up(hdim, 128)
        h2 = 2 * h_pad
        fixed_bytes = d_pad * h2 * (2 + 2 + 4 + 4)
    else:
        d_pad = _round_up(d, 128)
        h_pad = _round_up(hdim, 128)
        h2 = h_pad
        # fixed VMEM blocks: bf16 w1+w2 inputs + fp32 dw1+dw2 outputs
        fixed_bytes = d_pad * h_pad * (2 + 2 + 4 + 4)
    if fixed_bytes > 9 * 1024 * 1024:
        _, vjp = jax.vjp(
            lambda *a: _xla_ln_mlp(*a, eps, gelu),
            x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale)
        return vjp(dy)
    rows = b * n // (2 if pack else 1)
    # backward holds ~4 fp32 [tile, H] intermediates (h1, dg_act, dh1 + the
    # dot operands) and ~7 fp32 [tile, D] ones — budget accordingly or the
    # Mosaic scoped-VMEM allocator dies at compile time.
    per_row = h2 * 18 + d_pad * 40
    tile = max(256, min(2048, (8 * 1024 * 1024 // per_row) // 8 * 8))
    tile = min(tile, _round_up(rows, 8))
    rows_pad = _round_up(rows, tile)

    dtype = x.dtype
    if pack:
        from mvlt_tpu.ops.block_packed import _blockdiag, _dup

        xf = x.reshape(rows, d_pad)
        dyf = dy.reshape(rows, d_pad)
        if rows_pad != rows:
            xf = jnp.pad(xf, ((0, rows_pad - rows), (0, 0)))
            dyf = jnp.pad(dyf, ((0, rows_pad - rows), (0, 0)))
        w1p = _blockdiag(w1, d, h_pad, dtype)          # [128, 2*h_pad]
        w2p = _blockdiag(w2, h_pad, d, dtype)          # [2*h_pad, 128]
        b1p = _dup(b1, h_pad, hdim)
        gp = _dup(ln_scale, d, d)
        bep = _dup(ln_bias, d, d)
        sf = _expand_row_scale(row_scale, b, n // 2, rows_pad)
    else:
        xf = x.reshape(rows, d)
        dyf = dy.reshape(rows, d)
        if d_pad != d or rows_pad != rows:
            xf = jnp.pad(xf, ((0, rows_pad - rows), (0, d_pad - d)))
            dyf = jnp.pad(dyf, ((0, rows_pad - rows), (0, d_pad - d)))
        w1p = jnp.pad(w1.astype(dtype), ((0, d_pad - d), (0, h_pad - hdim)))
        w2p = jnp.pad(w2.astype(dtype), ((0, h_pad - hdim), (0, d_pad - d)))
        b1p = jnp.pad(b1.astype(jnp.float32), (0, h_pad - hdim))[None, :]
        gp = jnp.pad(ln_scale.astype(jnp.float32), (0, d_pad - d))[None, :]
        bep = jnp.pad(ln_bias.astype(jnp.float32), (0, d_pad - d))[None, :]
        sf = _expand_row_scale(row_scale, b, n, rows_pad)

    sf = sf.reshape(rows_pad // tile, 8, tile // 8)

    xf = xf.reshape(rows_pad // tile, tile, d_pad)
    dyf = dyf.reshape(rows_pad // tile, tile, d_pad)
    grid = (rows_pad // tile,)

    vec = lambda: pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps, dim=d, gelu=gelu,
                          pack2=pack),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((1, 8, tile // 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(), vec(), vec(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad // tile, tile, d_pad), x.dtype),
            jax.ShapeDtypeStruct((d_pad, h2), jnp.float32),
            jax.ShapeDtypeStruct((1, h2), jnp.float32),
            jax.ShapeDtypeStruct((h2, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(xf, dyf, w1p, b1p, w2p, gp, bep, sf)
    dx_t, dw1, db1, dw2, db2, dgamma, dbeta = outs

    if pack:
        # fold the block-diagonal / duplicated accumulators: the same param
        # served both lane halves, so its grad is the sum of both blocks
        dx = dx_t.reshape(rows_pad, d_pad)[:rows].reshape(b, n, d)
        return (
            dx,
            (dgamma[0, :d] + dgamma[0, 64:64 + d]).astype(ln_scale.dtype),
            (dbeta[0, :d] + dbeta[0, 64:64 + d]).astype(ln_bias.dtype),
            (dw1[:d, :hdim]
             + dw1[64:64 + d, h_pad:h_pad + hdim]).astype(w1.dtype),
            (db1[0, :hdim] + db1[0, h_pad:h_pad + hdim]).astype(b1.dtype),
            (dw2[:hdim, :d]
             + dw2[h_pad:h_pad + hdim, 64:64 + d]).astype(w2.dtype),
            (db2[0, :d] + db2[0, 64:64 + d]).astype(b2.dtype),
            jnp.zeros_like(row_scale),  # DropPath mask: constant
        )
    dx = dx_t.reshape(rows_pad, d_pad)[:rows, :d].reshape(b, n, d)
    return (
        dx,
        dgamma[0, :d].astype(ln_scale.dtype),
        dbeta[0, :d].astype(ln_bias.dtype),
        dw1[:d, :hdim].astype(w1.dtype),
        db1[0, :hdim].astype(b1.dtype),
        dw2[:hdim, :d].astype(w2.dtype),
        db2[0, :d].astype(b2.dtype),
        jnp.zeros_like(row_scale),  # DropPath mask: constant
    )


_fused_ln_mlp_vjp.defvjp(_fused_ln_mlp_fwd, _fused_ln_mlp_bwd)


def _expand_row_scale(row_scale, b, n, rows_pad):
    """[B] per-sample scale -> padded fp32 [rows_pad] row vector."""
    s = jnp.repeat(row_scale.astype(jnp.float32), n)
    return jnp.pad(s, (0, rows_pad - b * n), constant_values=1.0)


def fused_ln_mlp(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                 w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
                 row_scale: jax.Array | None = None, *, eps: float = 1e-6,
                 gelu: str = "tanh", pack2: bool = False) -> jax.Array:
    """x: [B, N, D] -> x + row_scale * MLP(LN(x)); weights w1 [D, H],
    w2 [H, D]; row_scale [B] folds per-sample DropPath (None = ones).
    Differentiable: the backward is its own Pallas kernel accumulating
    weight/LN grads across row tiles.  ``gelu``: 'tanh' (default; the A&S
    erf form's fp32 divide costs ~1 ms/block on v5e, ops/kernel_math.py)
    or 'erf' (exact-parity escape hatch, ModelConfig.kernel_gelu).

    pack2: at D=64 (stage 1) lay the stream as two tokens per 128-lane row
    (free reshape; block_packed.py layout) instead of lane-padding 64->128:
    the pad/slice copies of x, dy and dx vanish and both kernels stream
    half the bytes — forward AND custom-VJP backward (accumulators fold
    block-diagonally).  Ignored when D*2 != 128 or N is odd (a pair must
    never straddle samples, so the row pairing is per-sample)."""
    if row_scale is None:
        row_scale = jnp.ones((x.shape[0],), jnp.float32)
    return _fused_ln_mlp_vjp(x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale,
                             eps, gelu, pack2)


@functools.partial(jax.jit, static_argnames=("eps", "gelu", "pack2"))
def _fused_ln_mlp_impl(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                       w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
                       row_scale: jax.Array, *, eps: float = 1e-6,
                       gelu: str = "tanh", pack2: bool = False) -> jax.Array:
    b, n, d = x.shape
    hdim = w1.shape[1]
    pack = bool(pack2) and d * 2 == 128 and n % 2 == 0
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1 = b1.astype(jnp.float32)
    b2 = b2.astype(jnp.float32)
    ln_scale = ln_scale.astype(jnp.float32)
    ln_bias = ln_bias.astype(jnp.float32)

    d_pad = 128 if pack else _round_up(d, 128)
    h_pad = _round_up(hdim, 128)
    h2 = 2 * h_pad if pack else h_pad
    rows = b * n // (2 if pack else 1)
    # VMEM budget: hidden tile fp32+bf16 (~6 bytes/col) + normed/x/out tiles
    # (~12 bytes of d_pad per row incl. double buffering) must fit ~10 MB.
    per_row = h2 * 6 + d_pad * 12
    tile = max(256, min(2048, (10 * 1024 * 1024 // per_row) // 8 * 8))
    tile = min(tile, _round_up(rows, 8))
    rows_pad = _round_up(rows, tile)

    if pack:
        from mvlt_tpu.ops.block_packed import _blockdiag, _dup

        xf = x.reshape(rows, d_pad)                  # free packing reshape
        w1p = _blockdiag(w1, d, h_pad, x.dtype)      # [128, 2*h_pad]
        w2p = _blockdiag(w2, h_pad, d, x.dtype)      # [2*h_pad, 128]
        b1p = _dup(b1, h_pad, hdim)
        b2p = _dup(b2, d, d)
        gp = _dup(ln_scale, d, d)
        bep = _dup(ln_bias, d, d)
    else:
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

    sf = _expand_row_scale(row_scale, b, n // (2 if pack else 1),
                           rows_pad).reshape(rows_pad // tile, 8, tile // 8)
    xf = xf.reshape(rows_pad // tile, tile, d_pad)
    grid = (rows_pad // tile,)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, dim=d, gelu=gelu, pack2=pack),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile // 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad // tile, tile, d_pad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d_pad * h2,
            bytes_accessed=2 * rows * d_pad * x.dtype.itemsize,
            transcendentals=rows * h2,
        ),
    )(xf, w1p, b1p, w2p, b2p, gp, bep, sf)

    if pack:
        out = out.reshape(rows_pad, d_pad)[:rows]
        return out.reshape(b, n, d)
    out = out.reshape(rows_pad, d_pad)[:rows, :d]
    return out.reshape(b, n, d)
