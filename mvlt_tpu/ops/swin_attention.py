"""Fused shifted-window joint attention for the Swin backbone variant.

The XLA path of SwinJointAttention (models/swin.py) materializes the
windowed logits [B, nW, nh, ws2, ws2+T] in fp32 (at stage 1: 101 x 64 x 64
x 192 x 4 B ~ 318 MB) plus the softmax's extra walks over it.  This kernel
keeps each window's logits in VMEM: one grid step covers a group of windows
x all heads for one batch element, building the joint [window-KV | text-KV]
key/value block by VMEM concatenation — the text keys are NEVER duplicated
per window in HBM (the property the XLA path preserves via its two-block
einsum, kept here).

Swin's relative-position bias, the shifted-window region mask, the padded-
cell mask and the KV-length mask are all pre-folded into ONE additive fp32
table [nW, nh, ws2, M_pad] (zeros on the text columns, -inf beyond), so the
kernel adds a single block per (window, head).

Layout: q/k/v windows arrive head-split [B, nW, nh, ws2, hd] and are
zero-padded to 128 lanes; text K/V is [B, nh, T, hd].  M_pad =
roundup(ws2 + T, 128).  The softmax uses kernel_math's exp2 + post-AV
normalizer policy.

Window-pair grouping (round-5 queue #1): with ws2 = 64 the per-(window,
head) matmul is [64, 128] x [128, M_pad] — half-height MXU tiles.  When nW
is even, adjacent windows are fused into ONE matmul: the q blocks stack to
[2*ws2, 128] (full tiles) against a joint KV of [win_a | win_b | text],
with cross-window -inf folded into the same additive table that already
carries the region/pad masks.  At the flagship shapes (ws2=64, T=128) the
padded joint KV length 2*64+128 = 256 EQUALS the single-window M_pad, so
the paired form computes identical padded logit elements in half the
dispatches.  The stacking happens by VMEM concatenation inside the kernel —
the HBM layout is unchanged.  Stage 4 (nW=1) keeps the single-window path.

Inference-path only (the swin variant trains on the XLA path).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.kernel_math import LOG2E, round_up as _round_up

_VMEM_BUDGET = 10 * 1024 * 1024


def _kernel(q_ref, kw_ref, vw_ref, kt_ref, vt_ref, add_ref, o_ref, *,
            scale: float, ws2: int, t_num: int, num_heads: int, group: int):
    """q/kw/vw_ref: [1, G, nh, ws2, 128]; kt/vt_ref: [1, nh, T_pad, 128];
    add_ref: [G, nh, ws2, M_pad]; o_ref: [1, G, nh, ws2, 128]."""
    m_pad = add_ref.shape[-1]
    t_pad = kt_ref.shape[2]
    for g in range(group):
        for h in range(num_heads):
            q = q_ref[0, g, h]                       # [ws2, 128] bf16
            # joint KV by VMEM concat: [ws2 | T_pad | pad] -> [M_pad, 128]
            parts_k = [kw_ref[0, g, h], kt_ref[0, h]]
            parts_v = [vw_ref[0, g, h], vt_ref[0, h]]
            pad_rows = m_pad - ws2 - t_pad
            if pad_rows:
                z = jnp.zeros((pad_rows, 128), q.dtype)
                parts_k.append(z)
                parts_v.append(z)
            k = jnp.concatenate(parts_k, axis=0)
            v = jnp.concatenate(parts_v, axis=0)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale * LOG2E) + add_ref[g, h]
            row_max = jnp.max(logits, axis=-1, keepdims=True)
            unnorm = jnp.exp2(logits - row_max)
            denom = jnp.sum(unnorm, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                unnorm.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / denom
            o_ref[0, g, h] = out.astype(o_ref.dtype)


def _kernel_paired(q_ref, kw_ref, vw_ref, kt_ref, vt_ref, add_ref, o_ref, *,
                   scale: float, ws2: int, num_heads: int, pairs: int):
    """q/kw/vw_ref: [1, 2*pairs, nh, ws2, 128]; kt/vt_ref: [1, nh, T_pad, 128];
    add_ref: [pairs, nh, 2*ws2, M2_pad]; o_ref: [1, 2*pairs, nh, ws2, 128].

    One matmul per (window-pair, head): q stacked [2*ws2, 128], joint KV
    [win_a | win_b | text | pad] with cross-window -inf in add_ref."""
    m2_pad = add_ref.shape[-1]
    t_pad = kt_ref.shape[2]
    for p in range(pairs):
        for h in range(num_heads):
            a, bw = 2 * p, 2 * p + 1
            q = jnp.concatenate([q_ref[0, a, h], q_ref[0, bw, h]], axis=0)
            parts_k = [kw_ref[0, a, h], kw_ref[0, bw, h], kt_ref[0, h]]
            parts_v = [vw_ref[0, a, h], vw_ref[0, bw, h], vt_ref[0, h]]
            pad_rows = m2_pad - 2 * ws2 - t_pad
            if pad_rows:
                z = jnp.zeros((pad_rows, 128), q.dtype)
                parts_k.append(z)
                parts_v.append(z)
            k = jnp.concatenate(parts_k, axis=0)
            v = jnp.concatenate(parts_v, axis=0)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale * LOG2E) + add_ref[p, h]
            row_max = jnp.max(logits, axis=-1, keepdims=True)
            unnorm = jnp.exp2(logits - row_max)
            denom = jnp.sum(unnorm, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                unnorm.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / denom
            out = out.astype(o_ref.dtype)
            o_ref[0, a, h] = out[:ws2]
            o_ref[0, bw, h] = out[ws2:]


def fused_swin_attention(q_win: jax.Array, k_win: jax.Array, v_win: jax.Array,
                         k_txt: jax.Array, v_txt: jax.Array,
                         add_table: jax.Array, *, scale: float) -> jax.Array:
    """q/k/v_win: [B, nW, nh, ws2, hd]; k/v_txt: [B, nh, T, hd];
    add_table: [nW, nh, ws2, ws2 + T] additive fp32 logit table (rel-pos
    bias on the visual block + region/pad mask; zeros on text columns).

    Returns out [B, nW, nh, ws2, hd]: softmax over the joint
    [window | text] KV, bias/mask folded in, logits VMEM-resident.
    """
    # window-pair grouping (module docstring) is a static dispatch so the
    # MVLT_SWIN_PAIR=0 A/B knob can't be fossilized into a jit trace cache
    pair = (q_win.shape[1] % 2 == 0) and _os.environ.get(
        "MVLT_SWIN_PAIR", "1") != "0"
    return _fused_swin_attention(q_win, k_win, v_win, k_txt, v_txt,
                                 add_table, scale=scale, pair=pair)


@functools.partial(jax.jit, static_argnames=("scale", "pair"))
def _fused_swin_attention(q_win: jax.Array, k_win: jax.Array, v_win: jax.Array,
                          k_txt: jax.Array, v_txt: jax.Array,
                          add_table: jax.Array, *, scale: float,
                          pair: bool) -> jax.Array:
    b, nw, nh, ws2, hd = q_win.shape
    t_num = k_txt.shape[2]
    m = ws2 + t_num
    m_pad = _round_up(m, 128)
    t_pad = _round_up(t_num, 8)
    hd_pad = 128
    dtype = q_win.dtype

    def pad_last(x, rows_to, lanes_to):
        return jnp.pad(x, ((0, 0),) * (x.ndim - 2)
                       + ((0, rows_to - x.shape[-2]), (0, lanes_to - x.shape[-1])))

    qp = pad_last(q_win, ws2, hd_pad)
    kwp = pad_last(k_win, ws2, hd_pad)
    vwp = pad_last(v_win, ws2, hd_pad)
    ktp = pad_last(k_txt.astype(dtype), t_pad, hd_pad)
    vtp = pad_last(v_txt.astype(dtype), t_pad, hd_pad)

    itemsize = jnp.dtype(dtype).itemsize

    if pair:
        pairs_total = nw // 2
        m2 = 2 * ws2 + t_num
        m2_pad = _round_up(m2, 128)
        add_a = add_table[0::2].astype(jnp.float32)   # [pairs, nh, ws2, ws2+T]
        add_b = add_table[1::2].astype(jnp.float32)
        # paired table: rows 0..ws2 are window a's queries, rows ws2.. are
        # window b's; the off-diagonal visual blocks stay -inf (a query may
        # not attend its pair partner's window), text columns shared
        addp = jnp.full((pairs_total, nh, 2 * ws2, m2_pad), -jnp.inf,
                        jnp.float32)
        addp = addp.at[:, :, :ws2, :ws2].set(add_a[..., :ws2])
        addp = addp.at[:, :, ws2:, ws2:2 * ws2].set(add_b[..., :ws2])
        addp = addp.at[:, :, :ws2, 2 * ws2:m2].set(add_a[..., ws2:])
        addp = addp.at[:, :, ws2:, 2 * ws2:m2].set(add_b[..., ws2:])
        addp = addp * LOG2E   # exp2-space units; -inf stays -inf

        per_pair = nh * (3 * 2 * ws2 * hd_pad * itemsize  # q/k/v blocks
                         + 2 * ws2 * m2_pad * 4 * 2       # logits/unnorm fp32
                         + 2 * ws2 * m2_pad * 4           # add table
                         + 2 * ws2 * hd_pad * 4)          # out
        group = max(1, min(pairs_total, _VMEM_BUDGET // per_pair))
        while pairs_total % group:
            group -= 1

        grid = (b, pairs_total // group)
        win_spec = pl.BlockSpec((1, 2 * group, nh, ws2, hd_pad),
                                lambda i, j: (i, j, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        txt_spec = pl.BlockSpec((1, nh, t_pad, hd_pad),
                                lambda i, j: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel_paired, scale=scale, ws2=ws2,
                              num_heads=nh, pairs=group),
            grid=grid,
            in_specs=[win_spec, win_spec, win_spec, txt_spec, txt_spec,
                      pl.BlockSpec((group, nh, 2 * ws2, m2_pad),
                                   lambda i, j: (j, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 2 * group, nh, ws2, hd_pad),
                                   lambda i, j: (i, j, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, nw, nh, ws2, hd_pad), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * pairs_total * nh * 2 * ws2 * m2_pad * hd_pad,
                bytes_accessed=(qp.size * 4 * itemsize + addp.size * b * 4),
                transcendentals=b * pairs_total * nh * 2 * ws2 * m2_pad,
            ),
        )(qp, kwp, vwp, ktp, vtp, addp)
        return out[..., :hd]

    # single-window path (odd nW, e.g. the whole-image stage 4)
    # fold the KV-length mask into the additive table once
    addp = jnp.full((nw, nh, ws2, m_pad), -jnp.inf, jnp.float32)
    addp = addp.at[:, :, :, :ws2].set(add_table[..., :ws2].astype(jnp.float32))
    addp = addp.at[:, :, :, ws2:ws2 + t_num].set(
        add_table[..., ws2:].astype(jnp.float32))
    # the kernel works in exp2 space (log2(e) folded into the scale), so
    # additive logit terms must be in the same units; -inf stays -inf and
    # padded text rows beyond ws2 + t_num stay masked
    addp = addp * LOG2E

    # group size: all of one batch element when it fits the VMEM budget
    per_win = nh * (3 * ws2 * hd_pad * itemsize  # q/k/v blocks
                    + ws2 * m_pad * 4 * 2       # logits/unnorm fp32
                    + ws2 * m_pad * 4           # add table
                    + ws2 * hd_pad * 4)         # out
    group = max(1, min(nw, _VMEM_BUDGET // per_win))
    while nw % group:
        group -= 1

    grid = (b, nw // group)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, ws2=ws2, t_num=t_num,
                          num_heads=nh, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, group, nh, ws2, hd_pad),
                         lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, nh, ws2, hd_pad),
                         lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, nh, ws2, hd_pad),
                         lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, t_pad, hd_pad),
                         lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, t_pad, hd_pad),
                         lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, nh, ws2, m_pad),
                         lambda i, j: (j, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, nh, ws2, hd_pad),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nw, nh, ws2, hd_pad), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            # q/k/v/out window blocks + the add table re-broadcast per batch
            flops=4 * b * nw * nh * ws2 * m_pad * hd_pad,
            bytes_accessed=(qp.size * 4 * dtype.itemsize + addp.size * b * 4),
            transcendentals=b * nw * nh * ws2 * m_pad,
        ),
    )(qp, kwp, vwp, ktp, vtp, addp)

    return out[..., :hd]
