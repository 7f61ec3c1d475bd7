"""pack2: the stage-1 serving path with TWO 64-dim tokens per 128-lane row.

Stage 1 of every shipped v1 config has dim=64, so the lane-padded stream the
whole-block megakernel rides ([B, N, 128] with lanes 64: zero,
ops/block_fused.py) carries 2x the HBM bytes and 2x the VPU element count the
math needs — and stage 1 is ~46% of the serving batch
(tools/bench_serve_ablate.py).  This module re-lays the stage-1 stream as
[B, N/2, 128] with tokens 2r and 2r+1 side by side in one row ("packed"),
which the XLA boundary produces/consumes as a free contiguous reshape of the
unpadded [B, N, 64] stream.  Reference semantics unchanged
(libs/pvlt.py:60-140); this is purely a layout for the Pallas kernels.

Why every op of the block survives packing (dim=64, heads=1 — stage 1):

  - LayerNorm: per-half stats via one matmul against blockdiag(J/64, J/64)
    on the otherwise idle MXU (kernel_math.packed_ln).
  - Q / out / MLP projections: block-diagonal duplicated weights
    ([[W, 0], [0, W]]) keep inputs AND outputs packed.  MXU work doubles on
    paper but the unpacked path already paid the same FLOPs multiplying
    zero-padded lanes.
  - Attention: K/V lanes >= 64 are zero in the producer's layout, so a
    packed-Q contraction over all 128 lanes against K yields the EVEN
    token's logits exactly; against a copy of K shifted into lanes 64:128 it
    yields the ODD token's.  P_even @ V (V in lanes 0:64) lands the even
    output in lanes 0:64; P_odd @ V_shifted lands the odd output in lanes
    64:128 — their sum is the packed attention output.  Two softmax_av
    calls, same total matmul FLOPs as the unpacked stream.
  - K/V row ORDER is free: softmax(QK^T)V is invariant under any shared
    permutation of K/V rows, which lets the packed SR-KV front end emit text
    rows even-tokens-first instead of interleaved (no sublane shuffles).

The SR-KV front end (fused_ln_sr_kv_p2) consumes the packed stream directly:
packed pixel pairs are x-adjacent, so with an even sr ratio a pair never
straddles a space-to-depth group — the SR GEMM reads the packed rows with a
statically re-ordered weight (pixel (r, 2s+half) at packed chunk (r, s) lane
half).  The text tail is un-packed with two 0/1 extraction matmuls (Mosaic
cannot cross the lane<->sublane boundary with a reshape; the MXU can).

Inference-path only, like block_fused.py.  Gated by ModelConfig.pack_stage1
+ dim*2 == 128, heads == 1, even sr/w/t (mvlt_tpu/models/pvlt.py stage
loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.kernel_math import (gelu as _gelu, half_average_matrix,
                                      one_pass_ln, packed_ln,
                                      round_up as _round_up, softmax_av)

_VMEM_BUDGET = 13 * 1024 * 1024  # same budget policy as block_fused.py


def _block_kernel_p2(x_ref, klo_ref, khi_ref, vlo_ref, vhi_ref, a_ref,
                     wq_ref, bq_ref, wp_ref, bp_ref,
                     g1_ref, be1_ref, g2_ref, be2_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                     *, scale: float, eps1: float, eps2: float,
                     kv_len: int, gelu: str):
    """One full transformer block on a packed [tile, 128] stream (two 64-dim
    tokens per row).  k/v lo: values in lanes 0:64; hi: the same values in
    lanes 64:128.  All weights arrive pre-block-diagonalized / duplicated."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    a = a_ref[...]

    normed = packed_ln(xf, a, eps1, g1_ref[0].astype(jnp.float32),
                       be1_ref[0].astype(jnp.float32)).astype(x.dtype)
    q = (jax.lax.dot_general(
        normed, wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[0].astype(jnp.float32)).astype(x.dtype)

    # even tokens: K/V live in lanes 0:64, so q's odd half contracts against
    # zeros; odd tokens symmetrically via the lane-shifted K/V copies.
    o_even = softmax_av(q, klo_ref[0, 0], vlo_ref[0, 0],
                        scale=scale, kv_len=kv_len, out_dtype=jnp.float32)
    o_odd = softmax_av(q, khi_ref[0, 0], vhi_ref[0, 0],
                       scale=scale, kv_len=kv_len, out_dtype=jnp.float32)
    attn = (o_even + o_odd).astype(x.dtype)

    y = jax.lax.dot_general(
        attn, wp_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0].astype(jnp.float32)
    hres = xf + y

    normed2 = packed_ln(hres, a, eps2, g2_ref[0].astype(jnp.float32),
                        be2_ref[0].astype(jnp.float32)).astype(x.dtype)
    hid = jax.lax.dot_general(
        normed2, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    hid = _gelu(hid, gelu).astype(x.dtype)
    y2 = jax.lax.dot_general(
        hid, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (hres + y2).astype(o_ref.dtype)


def _dup(vec1d, width: int, dim: int):
    """[1, 2*width] fp32 with ``vec1d`` in both halves' first ``dim`` lanes."""
    out = jnp.zeros((1, 2 * width), jnp.float32)
    v = vec1d.astype(jnp.float32)
    return out.at[0, :dim].set(v).at[0, width:width + dim].set(v)


def _blockdiag(w, rows: int, cols: int, dtype):
    """[[w, 0], [0, w]] on a [2*rows, 2*cols] zero canvas (w is [d_in, d_out]
    with d_in <= rows, d_out <= cols — the pads absorb lane round-up)."""
    d_in, d_out = w.shape
    out = jnp.zeros((2 * rows, 2 * cols), dtype)
    wd = w.astype(dtype)
    return out.at[:d_in, :d_out].set(wd).at[rows:rows + d_in,
                                            cols:cols + d_out].set(wd)


@functools.partial(jax.jit, static_argnames=("scale", "eps1", "eps2",
                                              "dim", "kv_len", "gelu"))
def fused_block_p2(x: jax.Array, k: jax.Array, v: jax.Array,
                   ln1_scale, ln1_bias, wq, bq, wp, bp,
                   ln2_scale, ln2_bias, w1, b1, w2, b2,
                   *, scale: float, eps1: float, eps2: float,
                   dim: int, kv_len: int, gelu: str = "tanh"):
    """One transformer block on a PACKED stream x: [B, N2, 2*dim] holding
    tokens (2r, 2r+1) in row r (dim*2 must be 128).  k, v: [B, 1, M_pad, 128]
    in the SR-KV producer layout (values in lanes 0:dim, pad rows masked by
    ``kv_len``).  Params are the plain unpacked flax arrays.  Returns the
    packed block output [B, N2, 2*dim]."""
    b, n2, d_in = x.shape
    if d_in != 2 * dim or d_in != 128:
        raise ValueError(f"pack2 requires a [B, N/2, 128] stream with "
                         f"dim=64 (got width {d_in}, dim {dim})")
    m_pad = k.shape[2]
    if k.shape[1] != 1 or k.shape[3] != 128:
        raise ValueError(f"pack2 needs single-head padded K/V, got {k.shape}")
    hidden = w1.shape[1]
    hid_pad = _round_up(hidden, 128)
    dtype = x.dtype

    # lane-lo/hi K/V copies (tiny: [B, 1, M_pad, 128]).  Lanes outside the
    # value half are rebuilt as zeros — the packed Q contracts over all 128
    # lanes, so a nonzero stray lane would cross-pollute the other parity.
    zeros_hd = jnp.zeros_like(k[..., :dim])
    k_hi = jnp.concatenate([zeros_hd, k[..., :dim]], axis=-1).astype(dtype)
    v_hi = jnp.concatenate([zeros_hd, v[..., :dim]], axis=-1).astype(dtype)
    klo = jnp.concatenate([k[..., :dim], zeros_hd], axis=-1).astype(dtype)
    vlo = jnp.concatenate([v[..., :dim], zeros_hd], axis=-1).astype(dtype)

    a = half_average_matrix(dim, 128)
    wq2 = _blockdiag(wq, dim, dim, dtype)                  # [128, 128]
    bq2 = _dup(bq, dim, dim)
    wp2 = _blockdiag(wp, dim, dim, dtype)
    bp2 = _dup(bp, dim, dim)
    g1 = _dup(ln1_scale, dim, dim)
    be1 = _dup(ln1_bias, dim, dim)
    g2 = _dup(ln2_scale, dim, dim)
    be2 = _dup(ln2_bias, dim, dim)
    w1p = _blockdiag(w1, dim, hid_pad, dtype)              # [128, 2*hid_pad]
    b1p = _dup(b1, hid_pad, hidden)
    w2p = _blockdiag(w2, hid_pad, dim, dtype)              # [2*hid_pad, 128]
    b2p = _dup(b2, dim, dim)

    # Tile sizing under the scoped-VMEM budget (block_fused.py policy).
    # Per packed row: TWO fp32 logit rows (m_pad each), q/stream fp32+bf16
    # live set on 128 lanes, fp32+bf16 hidden on 2*hid_pad lanes.
    # Element size from the actual stream dtype (serving runs bf16, but a
    # fp32 stream must not undercount live VMEM by 2x — the overflow mode is
    # an opaque tpu_compile_helper HTTP 500).  The fp32 logit rows and the
    # fp32 halves of the live set stay 4-byte regardless.
    esz = x.dtype.itemsize
    fixed = (4 * m_pad * 128 + 2 * 128 * 128 + 2 * 128 * 2 * hid_pad) * esz \
        + 128 * 128 * 4
    per_row = 2 * m_pad * 4 + 128 * (26 + 2 * esz) + 2 * hid_pad * (4 + esz)
    cap = max(64, (_VMEM_BUDGET - fixed) // per_row // 16 * 16)
    num_tiles = max(1, -(-n2 // cap))
    tile = 0
    for nt in range(num_tiles, num_tiles + 8):
        if n2 % nt == 0 and (n2 // nt) % 16 == 0 and n2 // nt <= cap:
            tile = n2 // nt
            break
    if not tile:
        tile = _round_up(-(-n2 // num_tiles), 16)
    n_pad = _round_up(n2, tile)
    xp = x if n_pad == n2 else jnp.pad(x, ((0, 0), (0, n_pad - n2), (0, 0)))

    stream_spec = pl.BlockSpec((1, tile, 128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, m_pad, 128), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    def fix(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_block_kernel_p2, scale=scale, eps1=eps1,
                          eps2=eps2, kv_len=kv_len, gelu=gelu),
        grid=(b, n_pad // tile),
        in_specs=[
            stream_spec, kv_spec, kv_spec, kv_spec, kv_spec,
            fix((128, 128)),
            fix((128, 128)), fix((1, 128)), fix((128, 128)), fix((1, 128)),
            fix((1, 128)), fix((1, 128)), fix((1, 128)), fix((1, 128)),
            fix((128, 2 * hid_pad)), fix((1, 2 * hid_pad)),
            fix((2 * hid_pad, 128)), fix((1, 128)),
        ],
        out_specs=stream_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, 128), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n2 * (2 * 128 * 128 * 2       # q + out proj
                                + 2 * m_pad * 128 * 2   # logits + P@V
                                + 2 * 128 * 2 * hid_pad * 2),
            bytes_accessed=(2 * b * n2 * 128 * dtype.itemsize
                            + b * 4 * m_pad * 128 * dtype.itemsize
                            + (2 * 128 * 128 + 2 * 128 * 2 * hid_pad)
                            * dtype.itemsize),
            transcendentals=b * n2 * (2 * m_pad + 2 * hid_pad),
        ),
    )(xp, klo, k_hi, vlo, v_hi, a, wq2, bq2, wp2, bp2,
      g1, be1, g2, be2, w1p, b1p, w2p, b2p)
    return out if n_pad == n2 else out[:, :n2]


def _attn_kernel_p2(x_ref, klo_ref, khi_ref, vlo_ref, vhi_ref, a_ref,
                    g_ref, be_ref, wq_ref, bq_ref, wp_ref, bp_ref, o_ref,
                    *, scale: float, eps: float, kv_len: int):
    """Attention HALF of _block_kernel_p2 (LN1 -> q -> even/odd softmax_av ->
    out proj -> +residual) on a packed [tile, 128] stream — the v2 serving
    block needs the halves separate (the DWConv MLP has its own whole-image
    kernel, ops/dwconv_mlp.py:fused_dwconv_mlp_p2)."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    normed = packed_ln(xf, a_ref[...], eps, g_ref[0].astype(jnp.float32),
                       be_ref[0].astype(jnp.float32)).astype(x.dtype)
    q = (jax.lax.dot_general(
        normed, wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[0].astype(jnp.float32)).astype(x.dtype)
    o_even = softmax_av(q, klo_ref[0, 0], vlo_ref[0, 0],
                        scale=scale, kv_len=kv_len, out_dtype=jnp.float32)
    o_odd = softmax_av(q, khi_ref[0, 0], vhi_ref[0, 0],
                       scale=scale, kv_len=kv_len, out_dtype=jnp.float32)
    attn = (o_even + o_odd).astype(x.dtype)
    y = jax.lax.dot_general(
        attn, wp_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0].astype(jnp.float32)
    o_ref[0] = (xf + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "eps", "dim", "kv_len"))
def fused_attention_p2(x: jax.Array, k: jax.Array, v: jax.Array,
                       ln_scale, ln_bias, wq, bq, wp, bp,
                       *, scale: float, eps: float, dim: int, kv_len: int):
    """Attention half-block on a PACKED stream x: [B, N2, 2*dim] (dim*2 ==
    128, single head).  k, v: [B, 1, M_pad, 128] from fused_ln_sr_kv_p2.
    Returns x + proj(attn(LN1(x))) packed — the v2 serving path's first
    half (the whole-block form is fused_block_p2)."""
    b, n2, d_in = x.shape
    if d_in != 2 * dim or d_in != 128:
        raise ValueError(f"pack2 requires a [B, N/2, 128] stream with "
                         f"dim=64 (got width {d_in}, dim {dim})")
    m_pad = k.shape[2]
    if k.shape[1] != 1 or k.shape[3] != 128:
        raise ValueError(f"pack2 needs single-head padded K/V, got {k.shape}")
    dtype = x.dtype

    zeros_hd = jnp.zeros_like(k[..., :dim])
    k_hi = jnp.concatenate([zeros_hd, k[..., :dim]], axis=-1).astype(dtype)
    v_hi = jnp.concatenate([zeros_hd, v[..., :dim]], axis=-1).astype(dtype)
    klo = jnp.concatenate([k[..., :dim], zeros_hd], axis=-1).astype(dtype)
    vlo = jnp.concatenate([v[..., :dim], zeros_hd], axis=-1).astype(dtype)

    a = half_average_matrix(dim, 128)
    wq2 = _blockdiag(wq, dim, dim, dtype)
    bq2 = _dup(bq, dim, dim)
    wp2 = _blockdiag(wp, dim, dim, dtype)
    bp2 = _dup(bp, dim, dim)
    g1 = _dup(ln_scale, dim, dim)
    be1 = _dup(ln_bias, dim, dim)

    # tile sizing: the fused_block_p2 model minus the MLP terms
    esz = x.dtype.itemsize
    fixed = (4 * m_pad * 128 + 2 * 128 * 128) * esz + 128 * 128 * 4
    per_row = 2 * m_pad * 4 + 128 * (26 + 2 * esz)
    cap = max(64, (_VMEM_BUDGET - fixed) // per_row // 16 * 16)
    num_tiles = max(1, -(-n2 // cap))
    tile = 0
    for nt in range(num_tiles, num_tiles + 8):
        if n2 % nt == 0 and (n2 // nt) % 16 == 0 and n2 // nt <= cap:
            tile = n2 // nt
            break
    if not tile:
        tile = _round_up(-(-n2 // num_tiles), 16)
    n_pad = _round_up(n2, tile)
    xp = x if n_pad == n2 else jnp.pad(x, ((0, 0), (0, n_pad - n2), (0, 0)))

    stream_spec = pl.BlockSpec((1, tile, 128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, m_pad, 128), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    def fix(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_kernel_p2, scale=scale, eps=eps,
                          kv_len=kv_len),
        grid=(b, n_pad // tile),
        in_specs=[
            stream_spec, kv_spec, kv_spec, kv_spec, kv_spec,
            fix((128, 128)),
            fix((1, 128)), fix((1, 128)),
            fix((128, 128)), fix((1, 128)), fix((128, 128)), fix((1, 128)),
        ],
        out_specs=stream_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, 128), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n2 * (2 * 128 * 128 * 2 + 2 * m_pad * 128 * 2),
            bytes_accessed=(2 * b * n2 * 128 * dtype.itemsize
                            + b * 4 * m_pad * 128 * dtype.itemsize
                            + 2 * 128 * 128 * dtype.itemsize),
            transcendentals=b * n2 * 2 * m_pad,
        ),
    )(xp, klo, k_hi, vlo, v_hi, a, g1, be1, wq2, bq2, wp2, bp2)
    return out if n_pad == n2 else out[:, :n2]


def _kv_kernel_p2(x_ref, a_ref, g1_ref, b1_ref, w_ref, bs_ref, gs_ref,
                  bsn_ref, ulo_ref, uhi_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                  k_ref, v_ref, lhs_ref, kv_ref,
                  *, dim: int, hw: tuple, t: int, sr: int, heads: int,
                  eps1: float, eps_sr: float):
    """sr_kv.py's _kv_kernel on a PACKED stream: packed LN1, space-to-depth
    staged from packed rows (weight statically re-ordered to the packed pixel
    order), text tail un-packed via 0/1 extraction matmuls — emitted
    even-tokens-first (K/V row order is softmax-invariant)."""
    h, w = hw
    d_pad = 2 * dim
    m_pad = k_ref.shape[2]
    dtype = k_ref.dtype

    xf = x_ref[0].astype(jnp.float32)               # ((h*w + t)//2, 128)
    normed = packed_ln(xf, a_ref[...], eps1,
                       g1_ref[0].astype(jnp.float32),
                       b1_ref[0].astype(jnp.float32))
    hw2 = h * w // 2
    ph, pw = h // sr, w // sr
    p = ph * pw
    # packed visual row y*(w//2)+x' holds pixels (y, 2x'), (y, 2x'+1);
    # group (R, S) = packed rows (R*sr + r, S*(sr//2) + s)
    n5 = normed[:hw2].reshape(ph, sr, pw, sr // 2, d_pad)
    for r in range(sr):
        for s in range(sr // 2):
            idx = (r * (sr // 2) + s) * d_pad
            lhs_ref[:, idx:idx + d_pad] = (
                n5[:, r, :, s, :].reshape(p, d_pad).astype(lhs_ref.dtype))
    vis = jax.lax.dot_general(
        lhs_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bs_ref[0].astype(jnp.float32)
    vis = one_pass_ln(vis, dim, eps_sr,
                      gs_ref[0].astype(jnp.float32),
                      bsn_ref[0].astype(jnp.float32))
    kv_ref[:p] = vis.astype(dtype)
    # text tail: extract even tokens (lanes 0:64) and odd tokens (lanes
    # 64:128 -> 0:64) with 0/1 matmuls; row order even-first is fine (the
    # attention consumer is permutation-invariant over K/V rows)
    nt = normed[hw2:].astype(dtype)                # (t//2, 128)
    kv_ref[p:p + t // 2] = jax.lax.dot_general(
        nt, ulo_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    kv_ref[p + t // 2:p + t] = jax.lax.dot_general(
        nt, uhi_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    m = p + t
    if m_pad != m:
        kv_ref[m:] = jnp.zeros((m_pad - m, d_pad), dtype)

    kf = jax.lax.dot_general(
        kv_ref[...], wk_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bk_ref[0].astype(jnp.float32)
    vf = jax.lax.dot_general(
        kv_ref[...], wv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bv_ref[0].astype(jnp.float32)
    # pad ROWS land at bias value — consumers must mask at col >= kv_len
    for hh in range(heads):
        k_ref[0, hh] = kf[:, hh * 128:(hh + 1) * 128].astype(dtype)
        v_ref[0, hh] = vf[:, hh * 128:(hh + 1) * 128].astype(dtype)


def fused_ln_sr_kv_p2(x: jax.Array, ln1_scale, ln1_bias,
                      sr_kernel, sr_bias, srn_scale, srn_bias,
                      kv_kernel: jax.Array, kv_bias,
                      *, dim: int, hw: tuple, t: int, sr: int, heads: int,
                      eps1: float, eps_sr: float):
    """fused_ln_sr_kv on a PACKED [B, (h*w+t)//2, 2*dim] stream (dim*2 must
    be 128; sr, w, t even so packed pairs never straddle an s2d group or the
    visual/text boundary).  Returns (k, v, kv_len) in the standard padded
    K/V layout — identical rows to the unpacked kernel except the text tail
    is even-tokens-first (a shared K/V permutation, invisible to attention).
    """
    b, n2, d_in = x.shape
    h, w = hw
    if d_in != 2 * dim or d_in != 128:
        raise ValueError(f"pack2 SR-KV needs a [B, N/2, 128] stream, dim=64 "
                         f"(got width {d_in}, dim {dim})")
    if sr < 2 or sr % 2 or w % 2 or t < 2 or t % 2 or (h * w) % 2:
        raise ValueError(f"pack2 SR-KV needs even sr/w/t (sr={sr}, hw={hw}, "
                         f"t={t})")
    if n2 != (h * w + t) // 2:
        raise ValueError(f"stream rows {n2} != (h*w + t)/2 for hw={hw}, t={t}")
    d_pad = 128
    hd = dim // heads
    p = (h // sr) * (w // sr)
    m = p + t
    m_pad = _round_up(m, 128)
    dtype = x.dtype

    # SR weight re-ordered to the packed pixel order: packed chunk (r, s)
    # lane half ``half`` is pixel (r, 2s+half) — a pure reshape of HWIO
    wf = jnp.zeros((sr, sr // 2, 2, d_pad // 2, dim), dtype)
    wf = wf.at[:, :, :, :dim, :].set(
        sr_kernel.astype(dtype).reshape(sr, sr // 2, 2, dim, dim))
    wf = wf.reshape(sr * sr * (d_pad // 2), dim)
    wf = jnp.pad(wf, ((0, 0), (0, d_pad - dim)))
    # NB: with dim == 64 == d_pad//2 the lane halves are exactly dim wide, so
    # no zero weight rows interleave (unlike the unpacked kernel's d_pad pad)

    def stripes(wm):
        out = jnp.zeros((d_pad, heads, 128), dtype)
        return out.at[:dim, :, :hd].set(
            wm.astype(dtype).reshape(dim, heads, hd)).reshape(d_pad,
                                                              heads * 128)

    wk = stripes(kv_kernel[:, :dim])
    wv = stripes(kv_kernel[:, dim:])
    if kv_bias is not None:
        def bstripe(bm):
            out = jnp.zeros((1, heads, 128), jnp.float32)
            return out.at[0, :, :hd].set(
                bm.astype(jnp.float32).reshape(heads, hd)).reshape(
                    1, heads * 128)
        bk, bv = bstripe(kv_bias[:dim]), bstripe(kv_bias[dim:])
    else:
        bk = bv = jnp.zeros((1, heads * 128), jnp.float32)

    a = half_average_matrix(dim, d_pad)
    eye = jnp.eye(dim, dtype=dtype)
    ulo = jnp.zeros((d_pad, d_pad), dtype).at[:dim, :dim].set(eye)
    uhi = jnp.zeros((d_pad, d_pad), dtype).at[dim:, :dim].set(eye)

    def vec2(s1d):
        out = jnp.zeros((1, d_pad), jnp.float32)
        v32 = s1d.astype(jnp.float32)
        return out.at[0, :dim].set(v32).at[0, dim:2 * dim].set(v32)

    def vec1(s1d):
        out = jnp.zeros((1, d_pad), jnp.float32)
        return out.at[0, :s1d.shape[0]].set(s1d.astype(jnp.float32))

    vspec = pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, heads * 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    def fix(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    kv_shape = jax.ShapeDtypeStruct((b, heads, m_pad, 128), dtype)
    k, v = pl.pallas_call(
        functools.partial(_kv_kernel_p2, dim=dim, hw=hw, t=t, sr=sr,
                          heads=heads, eps1=eps1, eps_sr=eps_sr),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n2, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            fix((d_pad, d_pad)),
            vspec, vspec,
            fix(wf.shape),
            vspec, vspec, vspec,
            fix((d_pad, d_pad)), fix((d_pad, d_pad)),
            fix((d_pad, heads * 128)), hspec,
            fix((d_pad, heads * 128)), hspec,
        ],
        out_specs=[
            pl.BlockSpec((1, heads, m_pad, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, m_pad, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[kv_shape, kv_shape],
        scratch_shapes=[
            pltpu.VMEM((p, sr * sr * (d_pad // 2)), dtype),
            pltpu.VMEM((m_pad, d_pad), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * sr * sr * dim * dim
            + 2 * 2 * b * m_pad * d_pad * heads * 128,
            bytes_accessed=(b * n2 * d_pad * x.dtype.itemsize
                            + 2 * b * heads * m_pad * 128 * x.dtype.itemsize
                            + (wf.size + 2 * d_pad * heads * 128)
                            * x.dtype.itemsize),
            transcendentals=0,
        ),
    )(x, a, vec2(ln1_scale), vec2(ln1_bias), wf, vec1(sr_bias),
      vec1(srn_scale), vec1(srn_bias), ulo, uhi, wk, bk, wv, bv)
    return k, v, m
