"""The whole K/V path of a block as ONE Pallas kernel: LN1 over the joint
stream -> space-to-depth -> SR contraction -> SR-LN -> text re-concat ->
per-head-striped K/V projections, one read of the residual stream and zero
XLA glue between block megakernels.

Replaces mvlt_tpu/models/pvlt.py _xla_kv on the 'full' inference path
(reference semantics libs/pvlt.py:100-108).  Measured on v5e at stage-1
shapes (tools/probes/bench_kv_glue.py, chained-scan slope harness) the XLA
chain costs 1.08 ms/block — dominated by the fp32 LN pass (0.59 ms) and the
space-to-depth transpose+einsum (0.66-0.80 ms), each of which re-streams the
[B, 4224, 128] residual through HBM.  This kernel reads the stream once
(~0.14 ms roofline) and does everything else in VMEM:

  - LN1 inline over ALL rows at once (one-pass masked stats,
    kernel_math.one_pass_ln) — visual and text rows share the same LN, so
    no separate text-tail LN or inter-block ln_next handoff
    (ops/block_fused.py) is needed at any sr ratio.
  - space-to-depth without an HBM transpose: the (hw, d_pad) tile reshapes
    to (h/sr, sr, w/sr, sr, d_pad) (leading-dim split — Mosaic cannot cross
    the sublane->lane boundary, CLAUDE.md), and the sr*sr strided slices are
    staged into the [P, sr*sr*d_pad] GEMM operand via VMEM-scratch stores
    (a direct lane-concat trips Mosaic's sublane-offset check).
  - the k=sr, stride=sr "conv" as one fat GEMM against the zero-padded
    flattened kernel (pad lanes of the stream hit zero weight rows).
  - the post-SR LayerNorm (attn.norm, eps 1e-5) inline on the [P, dim] tile.
  - the SR output and the normed text tail re-concatenated by sublane
    stores into a [M_pad, d_pad] scratch (alignment: the row counts P and T
    are sublane multiples at every shipped config), then projected to K and
    V with per-head 128-lane weight stripes, landing directly in the
    whole-block kernel's [B, H, M_pad, 128] layout.

sr == 1 (stage 4) skips the SR contraction and projects LN1(stream)
directly — the same kernel retires that stage's XLA K/V glue too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.kernel_math import one_pass_ln, round_up


def _kv_kernel(x_ref, g1_ref, b1_ref, w_ref, bs_ref, gs_ref, bsn_ref,
               wk_ref, bk_ref, wv_ref, bv_ref, k_ref, v_ref,
               lhs_ref, kv_ref, *, dim: int, hw: tuple, t: int, sr: int,
               heads: int, eps1: float, eps_sr: float,
               head_pair: bool = False):
    """The ENTIRE K/V path of one block in one grid step: LN1 over the full
    joint stream (visual + text rows at once), space-to-depth + SR GEMM +
    SR-LN on the visual rows (sr > 1), VMEM re-concat with the text tail,
    and the K/V projections emitted per-head-stripe in the whole-block
    kernel's [H, M_pad, 128] layout.  sr == 1 skips the SR contraction and
    projects the normed stream directly (stage 4).

    head_pair: emit the hp2 PAIRED layout [ceil(H/2), 2*M_pad, 128] instead
    (ops/kernel_math.softmax_av_pair): stripe s rows 0:M_pad carry head 2s
    in lanes 0:hd, rows M_pad:2*M_pad carry head 2s+1 in lanes 64:64+hd.
    wk/wv arrive pre-paired [d_pad, 2*P*128] (lo stripes then hi stripes) so
    the SAME two GEMMs produce both sections — zero downstream re-layout
    glue (the XLA-side pairing copies measured a 10% serving LOSS before
    this; tools/tpu_hp2_check.py)."""
    h, w = hw
    d_pad = x_ref.shape[-1]
    m_pad = k_ref.shape[2] // 2 if head_pair else k_ref.shape[2]
    dtype = k_ref.dtype

    xf = x_ref[0].astype(jnp.float32)                       # (h*w + t, d_pad)
    normed = one_pass_ln(xf, dim, eps1,
                         g1_ref[0].astype(jnp.float32),
                         b1_ref[0].astype(jnp.float32))
    if sr > 1:
        ph, pw = h // sr, w // sr
        p = ph * pw
        n5 = normed[: h * w].reshape(ph, sr, pw, sr, d_pad)
        for r in range(sr):
            for s in range(sr):
                idx = (r * sr + s) * d_pad
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
        kv_ref[p:p + t] = normed[h * w:].astype(dtype)
        m = p + t
    else:
        m = h * w + t
        kv_ref[:m] = normed.astype(dtype)
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
    # NB: the zeroed pad ROWS of kv_ref land at bias value after + bk/bv —
    # consumers must mask logits at col >= kv_len (always true on this path)
    if head_pair:
        n_str = (heads + 1) // 2
        for s in range(n_str):
            k_ref[0, s, :m_pad] = kf[:, s * 128:(s + 1) * 128].astype(dtype)
            k_ref[0, s, m_pad:] = kf[:, (n_str + s) * 128:
                                     (n_str + s + 1) * 128].astype(dtype)
            v_ref[0, s, :m_pad] = vf[:, s * 128:(s + 1) * 128].astype(dtype)
            v_ref[0, s, m_pad:] = vf[:, (n_str + s) * 128:
                                     (n_str + s + 1) * 128].astype(dtype)
    else:
        for hh in range(heads):
            k_ref[0, hh] = kf[:, hh * 128:(hh + 1) * 128].astype(dtype)
            v_ref[0, hh] = vf[:, hh * 128:(hh + 1) * 128].astype(dtype)


def fused_ln_sr_kv(x: jax.Array,
                   ln1_scale: jax.Array, ln1_bias: jax.Array,
                   sr_kernel, sr_bias, srn_scale, srn_bias,
                   kv_kernel: jax.Array, kv_bias,
                   *, dim: int, hw: tuple, t: int, sr: int, heads: int,
                   eps1: float, eps_sr: float, head_pair: bool = False):
    """K and V for one block straight from the raw lane-padded stream:
    LN1 + (space-to-depth + SR contraction + SR-LN, when sr > 1) + text-tail
    re-concat + K/V projections, all in one Pallas kernel.  Returns
    (k, v, kv_len) with k/v in the whole-block kernel's padded layout
    [B, heads, round_up(M, 128), 128] (pad rows bias-valued — downstream
    must mask at col >= kv_len; pad head-dim lanes zero); with head_pair,
    the hp2 paired layout [B, ceil(heads/2), 2*round_up(M, 128), 128]
    consumed by fused_block(head_pair=True, kv_paired=True).

    x: [B, h*w + t, d_pad] lane-padded joint stream (pad lanes zero).
    sr_kernel: [sr, sr, dim, dim] HWIO (None when sr == 1).
    kv_kernel: [dim, 2*dim] (flax Dense layout); kv_bias: [2*dim] or None.
    """
    b, n, d_in = x.shape
    h, w = hw
    assert n == h * w + t, (n, hw, t)
    d_pad = round_up(dim, 128)
    assert d_in == d_pad, (d_in, d_pad)
    hd = dim // heads
    p = (h // sr) * (w // sr) if sr > 1 else h * w
    m = p + t if sr > 1 else n
    m_pad = round_up(m, 128)
    dtype = x.dtype

    if sr > 1:
        wf = jnp.zeros((sr, sr, d_pad, d_pad), dtype)
        wf = wf.at[:, :, :dim, :dim].set(sr_kernel.astype(dtype))
        wf = wf.reshape(sr * sr * d_pad, d_pad)
    else:
        # dummies keep the kernel signature static; never read when sr == 1
        wf = jnp.zeros((1, d_pad), dtype)
        sr_bias = jnp.zeros((dim,), jnp.float32)
        srn_scale = jnp.ones((dim,), jnp.float32)
        srn_bias = jnp.zeros((dim,), jnp.float32)

    n_str = (heads + 1) // 2 if head_pair else heads
    w_cols = (2 * n_str if head_pair else heads) * 128

    if head_pair:
        # hp2 pre-paired weights [d_pad, 2*P*128]: columns [0, P*128) are
        # the LO stripes (head 2s at lanes 0:hd of stripe s) and columns
        # [P*128, 2*P*128) the HI stripes (head 2s+1 at lanes 64:64+hd) —
        # the kernel writes lo stripes to rows 0:M_pad and hi stripes to
        # rows M_pad:2*M_pad of the paired output
        def stripes(wm):
            wm = wm.astype(dtype).reshape(dim, heads, hd)
            out = jnp.zeros((d_pad, 2 * n_str, 128), dtype)
            out = out.at[:dim, :n_str, :hd].set(wm[:, 0::2])
            out = out.at[:dim, n_str:n_str + heads // 2, 64:64 + hd].set(
                wm[:, 1::2])
            return out.reshape(d_pad, w_cols)

        def bstripe(bm):
            bm = bm.astype(jnp.float32).reshape(heads, hd)
            out = jnp.zeros((1, 2 * n_str, 128), jnp.float32)
            out = out.at[0, :n_str, :hd].set(bm[0::2])
            out = out.at[0, n_str:n_str + heads // 2, 64:64 + hd].set(bm[1::2])
            return out.reshape(1, w_cols)
    else:
        # per-head 128-lane stripes with zero-padded input rows (stream pad
        # lanes) and zero-padded head-dim columns (pvlt.py _xla_kv padded_out)
        def stripes(wm):                               # [dim, dim] -> padded
            out = jnp.zeros((d_pad, heads, 128), dtype)
            return out.at[:dim, :, :hd].set(
                wm.astype(dtype).reshape(dim, heads, hd)).reshape(d_pad,
                                                                  heads * 128)

        def bstripe(bm):
            out = jnp.zeros((1, heads, 128), jnp.float32)
            return out.at[0, :, :hd].set(
                bm.astype(jnp.float32).reshape(heads, hd)).reshape(
                    1, heads * 128)

    wk = stripes(kv_kernel[:, :dim])
    wv = stripes(kv_kernel[:, dim:])
    if kv_bias is not None:
        bk, bv = bstripe(kv_bias[:dim]), bstripe(kv_bias[dim:])
    else:
        bk = bv = jnp.zeros((1, w_cols), jnp.float32)

    def vec(a):
        out = jnp.zeros((1, d_pad), jnp.float32)
        return out.at[0, :a.shape[0]].set(a.astype(jnp.float32))

    out_rows = 2 * m_pad if head_pair else m_pad
    vspec = pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, w_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    kv_shape = jax.ShapeDtypeStruct((b, n_str, out_rows, 128), dtype)
    k, v = pl.pallas_call(
        functools.partial(_kv_kernel, dim=dim, hw=hw, t=t, sr=sr,
                          heads=heads, eps1=eps1, eps_sr=eps_sr,
                          head_pair=head_pair),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec, vspec,
            pl.BlockSpec(wf.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            vspec, vspec, vspec,
            pl.BlockSpec((d_pad, w_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            hspec,
            pl.BlockSpec((d_pad, w_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            hspec,
        ],
        out_specs=[
            pl.BlockSpec((1, n_str, out_rows, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_str, out_rows, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[kv_shape, kv_shape],
        scratch_shapes=[
            pltpu.VMEM((p, sr * sr * d_pad) if sr > 1 else (8, d_pad), dtype),
            pltpu.VMEM((m_pad, d_pad), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * b * p * sr * sr * d_pad * d_pad if sr > 1 else 0)
            + 2 * 2 * b * m_pad * d_pad * w_cols,
            bytes_accessed=(b * n * d_pad * x.dtype.itemsize
                            + 2 * b * n_str * out_rows * 128 * x.dtype.itemsize
                            + (wf.size + 2 * d_pad * w_cols)
                            * x.dtype.itemsize),
            transcendentals=0,
        ),
    )(x, vec(ln1_scale), vec(ln1_bias), wf, vec(sr_bias),
      vec(srn_scale), vec(srn_bias), wk, bk, wv, bv)
    return k, v, m
