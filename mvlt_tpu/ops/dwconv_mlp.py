"""Fused LN -> fc1 -> 3x3 depthwise conv (visual rows) -> GELU -> fc2 ->
+residual Pallas kernel: PVT-v2's DWConv MLP half in one pass.

The v2 variant's MLP differs from v1's by the depthwise 3x3 mixing of the
VISUAL tokens between fc1 and the activation (models/pvlt.py:DWConvMlp,
joint-sequence adaptation of PVT-v2).  Unfused, the ratio-8 hidden
activation makes two HBM round-trips (fc1 out -> conv in, conv out -> fc2
in) plus the reshape/concat glue re-materializing the stream; none of the
v1 kernel ladder (fused_mlp.py) applies because of the conv's spatial halo.

This kernel keeps the WHOLE image resident: the grid is (batch, hidden
chunk) and each step computes LN -> fc1 chunk -> in-VMEM 9-shift depthwise
conv (pad + 9 shifted multiply-adds — the halo never leaves VMEM) -> GELU
-> fc2 chunk, accumulating the fc2 partial products into an fp32 VMEM
scratch that is written out (residual-added) once on the last chunk.  HBM
traffic: one read of x, one write of y, one pass over the weights — the
hidden activation never exists in HBM.

Text rows bypass the conv (and its bias) exactly like the module: only
rows [0, h*w) are convolved; rows [h*w, n) flow fc1 -> GELU -> fc2.

Weight layouts (prepared by the wrapper): w1 [C_pad, Hid_pad],
kdw [16, Hid_pad] (9 taps row-padded to the sublane tile), w2
[Hid_pad, C_pad]; zero padding everywhere keeps padded lanes/channels
inert (gelu(0)=0, zero w2 rows).

Inference-path only (deterministic); training keeps the XLA lowering whose
conv fwd+bwd fusion measured well (CLAUDE.md round-3 negative results).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.kernel_math import gelu as _gelu
from mvlt_tpu.ops.kernel_math import (half_average_matrix as _half_avg,
                                      packed_ln as _packed_ln)
from mvlt_tpu.ops.kernel_math import one_pass_ln as _masked_ln
from mvlt_tpu.ops.kernel_math import round_up as _round_up

_VMEM_BUDGET = 13 * 1024 * 1024


def _kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, kdw_ref, bdw_ref,
            w2_ref, b2_ref, o_ref, acc_ref,
            *, eps: float, dim: int, h: int, w: int, n: int,
            n_chunks: int, gelu: str = "erf"):
    """x_ref/o_ref: [1, N_pad, C_pad]; acc_ref: fp32 [N_pad, C_pad] scratch
    persistent across the chunk grid dim; w1/kdw/b1/bdw enter chunk-sliced."""
    j = pl.program_id(1)
    x = x_ref[0]
    xf = x.astype(jnp.float32)

    @pl.when(j == 0)
    def _init():
        # residual + fc2 bias, added exactly once
        acc_ref[...] = xf + b2_ref[0].astype(jnp.float32)

    normed = _masked_ln(xf, dim, eps, g_ref[0].astype(jnp.float32),
                        be_ref[0].astype(jnp.float32)).astype(x.dtype)
    hid = jax.lax.dot_general(
        normed, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)                    # [N_pad, ch] fp32

    # --- depthwise 3x3 over the visual grid, in VMEM ---
    ch = hid.shape[-1]
    vis = hid[: h * w].reshape(h, w, ch).astype(x.dtype)
    pad = jnp.pad(vis, ((1, 1), (1, 1), (0, 0)))
    conv = jnp.zeros((h, w, ch), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = kdw_ref[dy * 3 + dx].astype(jnp.float32)
            conv = conv + pad[dy:dy + h, dx:dx + w, :].astype(jnp.float32) * tap
    conv = conv + bdw_ref[0].astype(jnp.float32)
    vis_act = _gelu(conv.reshape(h * w, ch), gelu).astype(x.dtype)
    text_act = _gelu(hid[h * w:], gelu).astype(x.dtype)
    act = jnp.concatenate([vis_act, text_act], axis=0)   # [N_pad, ch]

    acc_ref[...] += jax.lax.dot_general(
        act, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_chunks - 1)
    def _emit():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hw", "eps", "gelu", "dim"))
def fused_dwconv_mlp(x: jax.Array,
                     ln_scale: jax.Array, ln_bias: jax.Array,
                     w1: jax.Array, b1: jax.Array,
                     kdw: jax.Array, bdw: jax.Array,
                     w2: jax.Array, b2: jax.Array,
                     *, hw: "tuple[int, int]", eps: float,
                     gelu: str = "erf", dim: "int | None" = None) -> jax.Array:
    """x: [B, N, C] joint stream (N = h*w + text); kdw: the flax depthwise
    Conv kernel [3, 3, 1, Hid].  Returns
    x + fc2(gelu(dwconv_visual(fc1(LN(x))))) in x.dtype.

    ``dim``: logical channel width when x is an ALREADY lane-padded stage
    stream (the v2 'full' path, models/pvlt.py) — LN stats mask to ``dim``
    lanes and the zero-padded w1 rows / w2 columns keep pad lanes inert, so
    the padded stream flows through with pad lanes preserved (zero)."""
    h, w = hw
    b, n, c = x.shape
    d = dim if dim is not None else c
    hid = w1.shape[1]
    assert n >= h * w and h % 8 == 0 and w % 8 == 0 and n % 8 == 0, (
        "whole-image kernel needs 8-aligned h/w/n")
    assert d == c or c == _round_up(d, 128), (
        "lane-padded input width must be the 128-lane roundup of dim")

    c_pad = _round_up(c, 128)
    hid_pad = _round_up(hid, 128)
    dtype = x.dtype

    # chunk the hidden dim so the per-step live set fits the VMEM budget:
    # fp32 hid chunk + fp32 conv acc + padded bf16 image + bf16 act on
    # [N_pad(~h*w)] rows, plus the fp32 [N_pad, C_pad] accumulator and the
    # in/out stream blocks
    # dtype-sized from itemsize (ADVICE r4); bf16 (esz=2) plan unchanged
    esz = dtype.itemsize
    fixed = (2 * n * c_pad) * esz + n * c_pad * 4 + 2 * c_pad * hid_pad * esz
    per_ch = n * 4 + h * w * 4 + (h + 2) * (w + 2) * esz + n * esz
    ch = max(128, (_VMEM_BUDGET - fixed) // per_ch // 128 * 128)
    ch = min(ch, hid_pad)
    while hid_pad % ch:
        ch -= 128
    n_chunks = hid_pad // ch

    def padw(a, shape):
        out = jnp.zeros(shape, dtype)
        return out.at[tuple(slice(0, s) for s in a.shape)].set(a.astype(dtype))

    w1p = padw(w1, (c_pad, hid_pad))
    w2p = padw(w2, (hid_pad, c_pad))
    # 9 taps as rows, padded to a full sublane tile (Mosaic min 2nd-minor)
    kdwp = jnp.zeros((16, hid_pad), jnp.float32).at[:9, :hid].set(
        kdw.reshape(9, hid).astype(jnp.float32))

    def vec(a, width):
        out = jnp.zeros((1, width), jnp.float32)
        return out.at[0, :a.shape[0]].set(a.astype(jnp.float32))

    b1p = vec(b1, hid_pad)
    bdwp = vec(bdw, hid_pad)
    b2p = vec(b2, c_pad)
    g = vec(ln_scale, c_pad)
    be = vec(ln_bias, c_pad)

    xp = x if c == c_pad else jnp.pad(x, ((0, 0), (0, 0), (0, c_pad - c)))

    kernel_fn = functools.partial(
        _kernel, eps=eps, dim=d, h=h, w=w, n=n, n_chunks=n_chunks, gelu=gelu)
    out = pl.pallas_call(
        kernel_fn,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, n, c_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, ch), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, ch), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c_pad), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c_pad), dtype),
        scratch_shapes=[pltpu.VMEM((n, c_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (2 * c_pad * hid_pad) + b * h * w * hid_pad * 9 * 2,
            bytes_accessed=(2 * b * n * c_pad * dtype.itemsize
                            + (2 * c_pad * hid_pad) * dtype.itemsize * b),
            transcendentals=b * n * hid_pad,
        ),
    )(xp, g, be, w1p, b1p, kdwp, bdwp, w2p, b2p)

    return out if c == c_pad else out[:, :, :c]


def _kernel_p2(x_ref, a_ref, g_ref, be_ref, w1_ref, b1_ref, kdw_ref, bdw_ref,
               w2_ref, b2_ref, o_ref, acc_ref,
               *, eps: float, h: int, wc: int, hw2: int, n_chunks: int,
               gelu: str):
    """fused_dwconv_mlp on a PACKED stream (ops/block_packed.py layout: two
    64-dim tokens per 128-lane row, x-adjacent pixel pairs).  x_ref/o_ref:
    [1, N2, 128]; w1 enters chunk-interleave-block-diagonalized so the fc1
    output carries the even token's hidden chunk in lanes [0, ch) and the
    odd token's in [ch, 2ch).  The depthwise 3x3 becomes 18 shifted
    multiply-adds on the [h, w/2, ch] half-grids: an even pixel's left
    neighbor is the PREVIOUS packed column's odd half, an odd pixel's right
    neighbor is the NEXT column's even half — the halo crosses the lane
    halves, never HBM."""
    j = pl.program_id(1)
    x = x_ref[0]
    xf = x.astype(jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = xf + b2_ref[0].astype(jnp.float32)

    normed = _packed_ln(xf, a_ref[...], eps, g_ref[0].astype(jnp.float32),
                        be_ref[0].astype(jnp.float32)).astype(x.dtype)
    hid = jax.lax.dot_general(
        normed, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)                 # [N2, 2ch] fp32
    ch = hid.shape[-1] // 2

    # visual half-grids (packed row y*wc + x' holds pixels (y,2x'), (y,2x'+1))
    dt = x.dtype
    pe = jnp.pad(hid[:hw2, :ch].reshape(h, wc, ch).astype(dt),
                 ((1, 1), (1, 1), (0, 0)))
    po = jnp.pad(hid[:hw2, ch:].reshape(h, wc, ch).astype(dt),
                 ((1, 1), (1, 1), (0, 0)))
    conv_e = jnp.zeros((h, wc, ch), jnp.float32)
    conv_o = jnp.zeros((h, wc, ch), jnp.float32)
    for dy in range(3):
        t0 = kdw_ref[dy * 3 + 0].astype(jnp.float32)   # tap at dx = -1
        t1 = kdw_ref[dy * 3 + 1].astype(jnp.float32)   # dx = 0
        t2 = kdw_ref[dy * 3 + 2].astype(jnp.float32)   # dx = +1
        e_c = pe[dy:dy + h, 1:1 + wc].astype(jnp.float32)   # even, same col
        o_c = po[dy:dy + h, 1:1 + wc].astype(jnp.float32)   # odd, same col
        conv_e = conv_e + (t1 * e_c + t2 * o_c
                           + t0 * po[dy:dy + h, 0:wc].astype(jnp.float32))
        conv_o = conv_o + (t1 * o_c + t0 * e_c
                           + t2 * pe[dy:dy + h, 2:2 + wc].astype(jnp.float32))
    bdw = bdw_ref[0].astype(jnp.float32)
    act_e = _gelu(conv_e.reshape(hw2, ch) + bdw, gelu).astype(dt)
    act_o = _gelu(conv_o.reshape(hw2, ch) + bdw, gelu).astype(dt)
    act_txt = _gelu(hid[hw2:], gelu).astype(dt)        # text bypasses the conv
    act = jnp.concatenate(
        [jnp.concatenate([act_e, act_o], axis=-1), act_txt], axis=0)

    acc_ref[...] += jax.lax.dot_general(
        act, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_chunks - 1)
    def _emit():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hw", "eps", "gelu", "dim"))
def fused_dwconv_mlp_p2(x: jax.Array,
                        ln_scale: jax.Array, ln_bias: jax.Array,
                        w1: jax.Array, b1: jax.Array,
                        kdw: jax.Array, bdw: jax.Array,
                        w2: jax.Array, b2: jax.Array,
                        *, hw: "tuple[int, int]", eps: float,
                        gelu: str = "tanh", dim: int = 64) -> jax.Array:
    """fused_dwconv_mlp on a PACKED [B, (h*w+t)/2, 128] stream (dim*2 must
    be 128; w even so pixel pairs are x-adjacent).  Returns the packed
    x + fc2(gelu(dwconv_visual(fc1(LN(x))))) stream."""
    h, w = hw
    b, n2, d_in = x.shape
    if d_in != 2 * dim or d_in != 128:
        raise ValueError(f"pack2 DWConv-MLP needs a [B, N/2, 128] stream, "
                         f"dim=64 (got width {d_in}, dim {dim})")
    if w % 2:
        raise ValueError(f"pack2 DWConv-MLP needs even w (hw={hw})")
    wc = w // 2
    hw2 = h * w // 2
    if not (h % 8 == 0 and wc % 8 == 0 and n2 % 8 == 0 and n2 > hw2):
        raise ValueError(f"pack2 DWConv-MLP needs 8-aligned h/w2/n2 and a "
                         f"text tail (hw={hw}, n2={n2})")
    hid = w1.shape[1]
    hid_pad = _round_up(hid, 128)
    dtype = x.dtype
    esz = dtype.itemsize

    # hidden chunk sizing: element counts per original hidden lane match the
    # unpacked kernel exactly (packing halves rows but doubles live columns)
    n = 2 * n2
    fixed = 2 * n2 * 128 * esz + n2 * 128 * 4 + 2 * 128 * 128 * esz
    per_ch = n * 4 + h * w * 4 + (h + 2) * (w + 4) * esz + n * esz \
        + 2 * 128 * 2 * esz                       # w1/w2 chunk columns
    ch = max(128, (_VMEM_BUDGET - fixed) // per_ch // 128 * 128)
    ch = min(ch, hid_pad)
    while hid_pad % ch:
        ch -= 128
    n_chunks = hid_pad // ch

    # chunk-interleaved block-diagonal weights: kernel chunk j reads columns
    # [j*2ch, (j+1)*2ch) = [[w1_j, 0], [0, w1_j]]
    w1r = jnp.zeros((dim, hid_pad), dtype).at[:, :hid].set(
        w1.astype(dtype)).reshape(dim, n_chunks, ch)
    w1p = jnp.zeros((128, n_chunks, 2, ch), dtype)
    w1p = w1p.at[:dim, :, 0].set(w1r).at[dim:2 * dim, :, 1].set(w1r)
    w1p = w1p.reshape(128, n_chunks * 2 * ch)
    w2r = jnp.zeros((hid_pad, dim), dtype).at[:hid].set(
        w2.astype(dtype)).reshape(n_chunks, ch, dim)
    w2p = jnp.zeros((n_chunks, 2, ch, 128), dtype)
    w2p = w2p.at[:, 0, :, :dim].set(w2r).at[:, 1, :, dim:2 * dim].set(w2r)
    w2p = w2p.reshape(n_chunks * 2 * ch, 128)
    b1r = jnp.zeros((hid_pad,), jnp.float32).at[:hid].set(
        b1.astype(jnp.float32)).reshape(n_chunks, ch)
    b1p = jnp.stack([b1r, b1r], axis=1).reshape(1, n_chunks * 2 * ch)
    kdwp = jnp.zeros((16, hid_pad), jnp.float32).at[:9, :hid].set(
        kdw.reshape(9, hid).astype(jnp.float32))
    bdwp = jnp.zeros((1, hid_pad), jnp.float32).at[0, :hid].set(
        bdw.astype(jnp.float32))
    b2p = jnp.zeros((1, 128), jnp.float32)
    b2f = b2.astype(jnp.float32)
    b2p = b2p.at[0, :dim].set(b2f).at[0, dim:2 * dim].set(b2f)

    def dup(a):
        out = jnp.zeros((1, 128), jnp.float32)
        v = a.astype(jnp.float32)
        return out.at[0, :dim].set(v).at[0, dim:2 * dim].set(v)

    a_half = _half_avg(dim, 128)

    kernel_fn = functools.partial(
        _kernel_p2, eps=eps, h=h, wc=wc, hw2=hw2, n_chunks=n_chunks,
        gelu=gelu)
    out = pl.pallas_call(
        kernel_fn,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, n2, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 2 * ch), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * ch), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, ch), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * ch, 128), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n2, 128), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n2, 128), dtype),
        scratch_shapes=[pltpu.VMEM((n2, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (2 * dim * hid_pad) + b * h * w * hid_pad * 9 * 2,
            bytes_accessed=(2 * b * n2 * 128 * esz
                            + 2 * b * 128 * (n_chunks * 2 * ch) * esz),
            transcendentals=b * n * hid_pad,
        ),
    )(x, a_half, dup(ln_scale), dup(ln_bias), w1p, b1p, kdwp, bdwp, w2p, b2p)
    return out
