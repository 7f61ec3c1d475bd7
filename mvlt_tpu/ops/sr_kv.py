"""Fused K/V-path front end: LN1 -> space-to-depth -> SR contraction -> SR-LN
as one Pallas kernel, one read of the residual stream.

Replaces the XLA glue between whole-block megakernels (mvlt_tpu/models/pvlt.py
_xla_kv, reference semantics libs/pvlt.py:100-108).  Measured on v5e at
stage-1 shapes (tools/probes/bench_kv_glue.py, chained-scan slope harness)
that glue costs 1.08 ms with the full-stream LayerNorm and 0.80 ms with
``normed`` handed off — dominated by the fp32 LN pass (0.59 ms) and the
space-to-depth transpose+einsum (0.66-0.80 ms), each of which re-streams the
[B, 4224, 128] residual through HBM.  This kernel reads the stream once
(~0.14 ms roofline) and does everything else in VMEM:

  - LN1 inline (one-pass masked stats, kernel_math.one_pass_ln) — which also
    makes the inter-block ln_next handoff (ops/block_fused.py) unnecessary
    for sr>1 stages: the whole-block kernel no longer pays the extra
    full-stream write of LN(out).
  - space-to-depth without an HBM transpose: the (hw, d_pad) tile reshapes to
    (h/sr, sr, w/sr, sr, d_pad) (leading-dim split — Mosaic cannot cross the
    sublane->lane boundary, CLAUDE.md), and the sr*sr strided slices are
    lane-concatenated into the [P, sr*sr*d_pad] GEMM operand in VMEM.
  - the k=sr, stride=sr "conv" as one fat GEMM against the zero-padded
    flattened kernel (pad lanes of the stream hit zero weight rows).
  - the post-SR LayerNorm (attn.norm, eps 1e-5) inline on the [P, dim] tile.

Output: [B, (h/sr)*(w/sr), round_up(dim, 128)] in x.dtype, padded lanes
zero — ready for the padded KV projection (pvlt.py _xla_kv padded_out
layout) without any lane slice of the stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.kernel_math import one_pass_ln, round_up


def _kernel(x_ref, g1_ref, b1_ref, w_ref, bs_ref, gs_ref, bsn_ref, o_ref,
            lhs_ref, *, dim: int, hw: tuple, sr: int, eps1: float,
            eps_sr: float):
    h, w = hw
    d_pad = x_ref.shape[-1]
    ph, pw = h // sr, w // sr

    xf = x_ref[0].astype(jnp.float32)                       # (h*w, d_pad)
    normed = one_pass_ln(xf, dim, eps1,
                         g1_ref[0].astype(jnp.float32),
                         b1_ref[0].astype(jnp.float32))
    # (h*w, d_pad) -> (ph, sr, pw, sr, d_pad): pure leading-dim split
    n5 = normed.reshape(ph, sr, pw, sr, d_pad)
    # gather the sr*sr strided slices into the GEMM operand's lane slices,
    # staging through VMEM scratch: the slices carry sublane offsets r that
    # Mosaic's lane-concat refuses to mix ("offset mismatch on non-concat
    # dimension"); stores realign each piece to offset 0.  Lane order
    # (r, t, d) matches the flattened weight layout.
    for r in range(sr):
        for t in range(sr):
            idx = (r * sr + t) * d_pad
            lhs_ref[:, idx:idx + d_pad] = (
                n5[:, r, :, t, :].reshape(ph * pw, d_pad).astype(lhs_ref.dtype))
    out = jax.lax.dot_general(
        lhs_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bs_ref[0].astype(jnp.float32)
    out = one_pass_ln(out, dim, eps_sr,
                      gs_ref[0].astype(jnp.float32),
                      bsn_ref[0].astype(jnp.float32))
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dim", "hw", "sr",
                                             "eps1", "eps_sr"))
def fused_ln_sr(x: jax.Array,
                ln1_scale: jax.Array, ln1_bias: jax.Array,
                sr_kernel: jax.Array, sr_bias: jax.Array,
                srn_scale: jax.Array, srn_bias: jax.Array,
                *, dim: int, hw: tuple, sr: int,
                eps1: float, eps_sr: float) -> jax.Array:
    """LN1 + sr-stride-sr patch contraction + SR-LN over the visual rows of a
    (possibly lane-padded) stream.

    x: [B, N, d_pad] with h*w visual rows first (N may exceed h*w — text
    rows are ignored), true feature width ``dim``, padded lanes zero.
    sr_kernel: [sr, sr, dim, dim] (HWIO, as stored by the flax conv).
    Returns [B, (h/sr)*(w/sr), round_up(dim, 128)] in x.dtype, padded lanes
    zero (zero-padded output columns of the GEMM + zero-padded LN gamma/beta).
    """
    b, n, d_in = x.shape
    h, w = hw
    assert h % sr == 0 and w % sr == 0 and n >= h * w
    d_pad = round_up(dim, 128)
    assert d_in == d_pad, (d_in, d_pad)
    p = (h // sr) * (w // sr)
    dtype = x.dtype

    # flatten the conv kernel to the lane-concat order (r, t, d_pad) and
    # zero-pad: input rows beyond dim meet the stream's zero pad lanes,
    # output columns beyond dim keep the result's pad lanes zero
    wf = jnp.zeros((sr, sr, d_pad, d_pad), dtype)
    wf = wf.at[:, :, :dim, :dim].set(sr_kernel.astype(dtype))
    wf = wf.reshape(sr * sr * d_pad, d_pad)

    def vec(a):
        out = jnp.zeros((1, d_pad), jnp.float32)
        return out.at[0, :a.shape[0]].set(a.astype(jnp.float32))

    vspec = pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, dim=dim, hw=hw, sr=sr,
                          eps1=eps1, eps_sr=eps_sr),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec, vspec,
            pl.BlockSpec((sr * sr * d_pad, d_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vspec, vspec, vspec,
        ],
        out_specs=pl.BlockSpec((1, p, d_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p, d_pad), dtype),
        scratch_shapes=[pltpu.VMEM((p, sr * sr * d_pad), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * sr * sr * d_pad * d_pad,
            bytes_accessed=(b * h * w * d_pad * x.dtype.itemsize
                            + b * p * d_pad * x.dtype.itemsize
                            + sr * sr * d_pad * d_pad * x.dtype.itemsize),
            transcendentals=0,
        ),
    )(x, vec(ln1_scale), vec(ln1_bias), wf, vec(sr_bias),
      vec(srn_scale), vec(srn_bias))
    return out
