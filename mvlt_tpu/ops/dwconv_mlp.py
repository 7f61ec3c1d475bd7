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
    fixed = (2 * n * c_pad) * 2 + n * c_pad * 4 + 2 * c_pad * hid_pad * 2
    per_ch = n * 4 + h * w * 4 + (h + 2) * (w + 2) * 2 + n * 2
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
