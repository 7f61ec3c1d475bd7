"""Fused MLM cross-entropy: vocab-tiled GEMM + online logsumexp, the
[rows, 30522] logits never touch HBM.

The chunked XLA decode (train/losses.py:chunked_mlm_loss) is HBM-bound, not
FLOP-bound: each [chunk, vocab] fp32 logits tile (125-250 MB) is written and
re-read by the logsumexp, then written AGAIN by the jax.checkpoint recompute
and a third time as dlogits in the backward — ~2.5 GB of HBM traffic per
step at capacity 3072-5120 for ~0.43 TFLOP of matmul (the round-4 skeleton
ablation priced the whole MLM tail at 8.7 ms @ B=150, tools/probes/
bench_skel_ablate.py).  Here the logits tile lives only in VMEM:

  forward   grid (rows/RT, vocab/VT):  logits tile = x_tile @ E_tile^T + b;
            running (max, sum-exp2, picked-logit) carried in VMEM scratch
            across the vocab dim; per-row nll emitted on the last tile.
            HBM: rows once, table once per row-tile pass, nll out.
  backward  two kernels, both recomputing the logits tile from the saved
            per-row lse (flash-attention style):
              d_rows   grid (rows/RT, vocab/VT): dx accumulates in scratch
                       over the vocab dim   (dl = g*(softmax - onehot))
              d_table  grid (vocab/VT, rows/RT): dE/db accumulate in scratch
                       over the row dim
            Two recomputes instead of one so every accumulator only ever
            spans CONSECUTIVE grid steps (Pallas TPU revisiting an output
            block non-consecutively is not supported); the extra GEMM is
            ~0.15 TFLOP — noise next to the 2 GB of logits traffic it
            replaces.

Replaces the decode of the reference's MLM objective
(engine_grid_masking.py:81-89, libs/vl_heads.py:38-70) on the TPU training
path; the XLA chunked form stays as the reference semantics / CPU fallback.

Per-row labels/cotangents/residuals are passed lane-replicated ([R, 128])
because Mosaic cannot transpose a lane-vector into a sublane-vector inside
the kernel; the replication is ~1.5 MB, noise next to the saved traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.kernel_math import LOG2E, round_up as _round_up

# Per-kernel (row, vocab) tiles, sized from the fp32 live set against the
# 16 MB scoped-VMEM ceiling (CLAUDE.md): the fp32 logits tile + fp32
# accumulator scratch + double-buffered streaming blocks.  Fat row tiles
# preferred — the vocab table is re-read once per ROW-TILE pass in the
# forward/d_rows grids (47 MB bf16 per pass).
_FWD_RT, _FWD_VT = 1024, 512        # logits 2 MB, scratch 1.5 MB
_BWDR_RT, _BWDR_VT = 1024, 256      # + dx acc [RT, 768] fp32 3 MB
_BWDT_RT, _BWDT_VT = 512, 1024      # + dE acc [VT, 768] fp32 3 MB


def _fwd_kernel(x_ref, t_ref, b_ref, lab_ref, nll_ref, lse_ref,
                m_ref, s_ref, p_ref, *, n_vt: int, vocab: int):
    """x_ref [RT, H]; t_ref [VT, H]; b_ref [1, VT]; lab_ref [RT, 128] int32;
    outputs nll_ref/lse_ref [RT, 128] fp32 (lane-replicated scalars);
    scratch m/s/p [RT, 128] fp32 carry (row-max in base-2 logit units,
    sum-exp2, picked logit)."""
    j = pl.program_id(1)

    logits = jax.lax.dot_general(
        x_ref[...], t_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[0].astype(jnp.float32)                      # [RT, VT] fp32
    l2 = logits * LOG2E                                    # base-2 units

    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * logits.shape[1]
    # mask vocab padding (last tile): never the max, never picked
    l2 = jnp.where(col < vocab, l2, -jnp.inf)
    lab = lab_ref[:, :1]                                   # [RT, 1] int32
    match = col == lab
    picked_t = jnp.sum(jnp.where(match, logits, 0.0), axis=-1, keepdims=True)
    tile_max = jnp.max(l2, axis=-1, keepdims=True)         # [RT, 1]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.broadcast_to(tile_max, m_ref.shape)
        s_ref[...] = jnp.broadcast_to(
            jnp.sum(jnp.exp2(l2 - tile_max), axis=-1, keepdims=True), s_ref.shape)
        p_ref[...] = jnp.broadcast_to(picked_t, p_ref.shape)

    @pl.when(j > 0)
    def _update():
        m_old = m_ref[:, :1]
        m_new = jnp.maximum(m_old, tile_max)
        s_new = (s_ref[:, :1] * jnp.exp2(m_old - m_new)
                 + jnp.sum(jnp.exp2(l2 - m_new), axis=-1, keepdims=True))
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        s_ref[...] = jnp.broadcast_to(s_new, s_ref.shape)
        p_ref[...] = p_ref[...] + jnp.broadcast_to(picked_t, p_ref.shape)

    @pl.when(j == n_vt - 1)
    def _emit():
        # lse (natural units) = (m + log2(s)) / log2(e)
        lse = (m_ref[:, :1] + jnp.log2(s_ref[:, :1])) / LOG2E
        valid = lab >= 0
        nll = jnp.where(valid, lse - p_ref[:, :1], 0.0)
        nll_ref[...] = jnp.broadcast_to(nll, nll_ref.shape)
        lse_ref[...] = jnp.broadcast_to(lse, lse_ref.shape)


def _dl_tile(x, t, b, lab_col, lse_col, g_col, j, vocab):
    """Recompute one logits tile and its dlogits = g*(softmax - onehot);
    shared by both backward kernels.  Returns (dl [RT, VT] fp32)."""
    logits = jax.lax.dot_general(
        x, t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * logits.shape[1]
    prob = jnp.exp2((logits - lse_col) * LOG2E)
    prob = jnp.where(col < vocab, prob, 0.0)
    onehot = (col == lab_col).astype(jnp.float32)
    g = jnp.where(lab_col >= 0, g_col, 0.0)
    return g * (prob - onehot)


def _bwd_rows_kernel(x_ref, t_ref, b_ref, lab_ref, lse_ref, g_ref,
                     dx_ref, acc_ref, *, n_vt: int, vocab: int):
    """grid (rows/RT, vocab/VT): dx = sum_j dl_j @ E_j, fp32 scratch."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    dl = _dl_tile(x_ref[...], t_ref[...], b_ref[0], lab_ref[:, :1],
                  lse_ref[:, :1], g_ref[:, :1], j, vocab)
    acc_ref[...] += jax.lax.dot_general(
        dl.astype(x_ref.dtype), t_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_vt - 1)
    def _emit():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype)


def _bwd_table_kernel(x_ref, t_ref, b_ref, lab_ref, lse_ref, g_ref,
                      dt_ref, db_ref, acc_ref, bacc_ref,
                      *, n_rt: int, vocab: int):
    """grid (vocab/VT, rows/RT): dE = sum_i dl_i^T @ x_i, db = sum dl."""
    j = pl.program_id(0)   # vocab tile
    i = pl.program_id(1)   # row tile

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)
        bacc_ref[...] = jnp.zeros(bacc_ref.shape, jnp.float32)

    dl = _dl_tile(x_ref[...], t_ref[...], b_ref[0], lab_ref[:, :1],
                  lse_ref[:, :1], g_ref[:, :1], j, vocab)
    dlb = dl.astype(x_ref.dtype)
    acc_ref[...] += jax.lax.dot_general(
        dlb, x_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bacc_ref[...] += jnp.sum(dl, axis=0, keepdims=True)

    @pl.when(i == n_rt - 1)
    def _emit():
        dt_ref[...] = acc_ref[...]
        db_ref[...] = bacc_ref[...]


def _pad_rows(a, r_pad, fill=0):
    r = a.shape[0]
    if r == r_pad:
        return a
    pw = ((0, r_pad - r),) + ((0, 0),) * (a.ndim - 1)
    return jnp.pad(a, pw, constant_values=fill)


def _rep(a, r_pad, fill=0):
    """[R] -> [R_pad, 128] lane-replicated."""
    return jnp.broadcast_to(_pad_rows(a, r_pad, fill)[:, None], (r_pad, 128))


@functools.partial(jax.jit, static_argnames=())
def _fwd_impl(rows, table_b, bias, labels):
    r, h = rows.shape
    v = table_b.shape[0]
    rt = min(_FWD_RT, _round_up(r, 8))
    r_pad = _round_up(r, rt)
    vt = _FWD_VT
    v_pad = _round_up(v, vt)
    n_vt = v_pad // vt

    xp = _pad_rows(rows, r_pad)
    tp = jnp.pad(table_b, ((0, v_pad - v), (0, 0))) if v_pad != v else table_b
    bp = jnp.zeros((1, v_pad), jnp.float32).at[0, :v].set(
        bias.astype(jnp.float32))
    labp = _rep(labels.astype(jnp.int32), r_pad, fill=-1)

    nll, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, n_vt=n_vt, vocab=v),
        grid=(r_pad // rt, n_vt),
        in_specs=[
            pl.BlockSpec((rt, h), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vt, h), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rt, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rt, 128), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * v_pad * h,
            bytes_accessed=(r_pad * h + (r_pad // rt) * v_pad * h)
            * rows.dtype.itemsize,
            transcendentals=r_pad * v_pad,
        ),
    )(xp, tp, bp, labp)
    return nll[:r, 0], lse[:r, 0]


def _bwd_operands(rows, table_b, bias, labels, lse, g, rt, vt):
    r = rows.shape[0]
    v = table_b.shape[0]
    r_pad = _round_up(r, rt)
    v_pad = _round_up(v, vt)
    xp = _pad_rows(rows, r_pad)
    tp = jnp.pad(table_b, ((0, v_pad - v), (0, 0))) if v_pad != v else table_b
    bp = jnp.zeros((1, v_pad), jnp.float32).at[0, :v].set(
        bias.astype(jnp.float32))
    labp = _rep(labels.astype(jnp.int32), r_pad, fill=-1)
    lsep = _rep(lse, r_pad).astype(jnp.float32)
    gp = _rep(g, r_pad).astype(jnp.float32)
    return (xp, tp, bp, labp, lsep, gp), r_pad, v_pad


@functools.partial(jax.jit, static_argnames=())
def _bwd_impl(rows, table_b, bias, labels, lse, g):
    r, h = rows.shape
    v = table_b.shape[0]

    rt = min(_BWDR_RT, _round_up(r, 8))
    vt = _BWDR_VT
    common, r_pad, v_pad = _bwd_operands(rows, table_b, bias, labels, lse, g,
                                         rt, vt)
    n_vt, n_rt = v_pad // vt, r_pad // rt
    row_specs = [
        pl.BlockSpec((rt, h), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((vt, h), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, vt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((rt, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rt, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rt, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    dx = pl.pallas_call(
        functools.partial(_bwd_rows_kernel, n_vt=n_vt, vocab=v),
        grid=(n_rt, n_vt),
        in_specs=row_specs,
        out_specs=pl.BlockSpec((rt, h), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, h), rows.dtype),
        scratch_shapes=[pltpu.VMEM((rt, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * r_pad * v_pad * h,
            bytes_accessed=(r_pad * h * 4
                            + n_rt * v_pad * h * rows.dtype.itemsize),
            transcendentals=r_pad * v_pad,
        ),
    )(*common)
    dx = dx[:r]

    # vocab-major grid for dE/db (accumulators span consecutive row steps)
    rt = min(_BWDT_RT, _round_up(r, 8))
    vt = _BWDT_VT
    common, r_pad, v_pad = _bwd_operands(rows, table_b, bias, labels, lse, g,
                                         rt, vt)
    n_vt, n_rt = v_pad // vt, r_pad // rt
    col_specs = [
        pl.BlockSpec((rt, h), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((vt, h), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, vt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((rt, 128), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rt, 128), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rt, 128), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
    ]
    dt, db = pl.pallas_call(
        functools.partial(_bwd_table_kernel, n_rt=n_rt, vocab=v),
        grid=(n_vt, n_rt),
        in_specs=col_specs,
        out_specs=[
            pl.BlockSpec((vt, h), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v_pad, h), jnp.float32),
            jax.ShapeDtypeStruct((1, v_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((vt, h), jnp.float32),
                        pltpu.VMEM((1, vt), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * r_pad * v_pad * h,
            bytes_accessed=(n_vt * r_pad * h * rows.dtype.itemsize
                            + v_pad * h * (rows.dtype.itemsize + 4)),
            transcendentals=r_pad * v_pad,
        ),
    )(*common)

    return dx, dt[:v], db[0, :v]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_mlm_nll(rows: jax.Array, table_b: jax.Array, bias: jax.Array,
                  labels: jax.Array) -> jax.Array:
    """Per-row MLM negative log-likelihood, logits never materialized.

    rows: [R, H] (bf16/fp32) transformed hidden states; table_b: [V, H] in
    rows.dtype (cast the tied fp32 embedding table BEFORE calling, so the
    cast's VJP accumulates dtable in fp32 outside the kernel); bias: [V]
    fp32; labels: [R] int32, -1 = ignored (0 nll, 0 grads).
    Same value as ``logsumexp(x@E^T+b) - (x@E^T+b)[label]`` per valid row.
    """
    nll, _ = _fwd_impl(rows, table_b, bias, labels)
    return nll


def _nll_fwd(rows, table_b, bias, labels):
    nll, lse = _fwd_impl(rows, table_b, bias, labels)
    return nll, (rows, table_b, bias, labels, lse)


def _nll_bwd(res, g):
    rows, table_b, bias, labels, lse = res
    dx, dt, db = _bwd_impl(rows, table_b, bias, labels, lse, g)
    return dx, dt.astype(table_b.dtype), db.astype(bias.dtype), None


fused_mlm_nll.defvjp(_nll_fwd, _nll_bwd)


def fused_mlm_loss(hidden: jax.Array, table: jax.Array, bias: jax.Array,
                   labels: jax.Array) -> jax.Array:
    """Drop-in for train/losses.py:chunked_mlm_loss on the TPU train path:
    mean nll over valid (label != -1) rows.  hidden [B, T, H] or [R, H];
    table [V, H] (fp32 tied embeddings); labels broadcastable to [R]."""
    h = hidden.shape[-1]
    rows = hidden.reshape(-1, h)
    labs = labels.reshape(-1).astype(jnp.int32)
    nll = fused_mlm_nll(rows, table.astype(rows.dtype), bias, labs)
    count = jnp.maximum((labs >= 0).sum(), 1)
    return nll.sum() / count
