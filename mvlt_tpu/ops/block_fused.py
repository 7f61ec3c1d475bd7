"""Whole-block Pallas megakernel: LN1 -> Q -> attn -> proj -> +res -> LN2 ->
MLP -> +res, one read and one write of the residual stream per block.

Third iteration of the block-fusion ladder (fused_mlp.py fused the MLP half,
block_attention.py fused the attention half).  Fusing BOTH halves into one
kernel removes, per block: the intermediate full-stream write+read between
the halves, and one pair of pad/unpad copies (each `jnp.pad`/slice around a
pallas_call materializes the whole stream — at stage 1 the d=64 -> 128 lane
padding makes those copies cost more HBM traffic than the kernel body).

Measured on v5e under the scan serving harness (the only timing this rig
cannot distort — CLAUDE.md): 25.0 ms/batch vs 25.8 for the modular pair at
B=101 (tools/bench_scan_sweep.py), so 'full' is the default
ModelConfig.block_attn_kernel.  Inference-path only; training keeps the
modular kernels with their custom VJPs.

As in block_attention.py, the K/V path (LN1 -> SR conv -> LN -> KV proj,
libs/pvlt.py:100-108) stays in XLA: it reduces over the image grid and its
output [(H/sr)(W/sr)+T, D] is tiny and VMEM-resident here.

Head-stripe trick for the Q/out projections (head_dim 64 on 128 MXU lanes)
is inherited from block_attention.py.

Inference-path only (no dropout, no DropPath); the training path keeps the
modular kernels with their custom VJPs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.kernel_math import (gelu as _gelu, one_pass_ln as _masked_ln,
                                      round_up as _round_up, softmax_av,
                                      softmax_av_pair)


# scoped-VMEM budget for tile sizing (bytes); module-level so benches can
# sweep it (tools/bench_block_tile.py)
_VMEM_BUDGET = 13 * 1024 * 1024


def _kernel(x_ref, k_ref, v_ref, wq_ref, bq_ref, wp_ref, bp_ref,
            g1_ref, be1_ref, g2_ref, be2_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, gn_ref, ben_ref,
            o_ref, on_ref,
            *, scale: float, eps1: float, eps2: float, dim: int,
            kv_len: int, num_heads: int, emit_next: bool,
            eps_next: float = 0.0, gelu: str = "tanh",
            head_pair: bool = False, kv_rows: int = 0):
    """x_ref/o_ref: [1, TILE, D_pad]; k_ref/v_ref: [1, H, M_pad, 128];
    wq_ref: [D_pad, H*128]; wp_ref: [H*128, D_pad]; w1_ref: [D_pad, Hid_pad];
    w2_ref: [Hid_pad, D_pad].  With emit_next, on_ref additionally receives
    LN(out) under (gn, ben) — the NEXT block's norm1 — so its XLA K/V path
    skips the full-stream LayerNorm (PVLT threads it through the stage).

    head_pair (hp2): TWO 64-wide heads share each 128-lane stripe — k_ref/
    v_ref become [1, ceil(H/2), 2*M_pad, 128] (kv_rows = 2*M_pad) in the
    softmax_av_pair layout, and wq/wp carry ceil(H/2) stripes.  Halves the
    Q/out-projection MXU work and the q/attn VPU element count at every
    hd<=64 multi-head stage (stages 2-4 of every shipped v1 config)."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)

    # ---- attention half ----
    normed = _masked_ln(xf, dim, eps1, g1_ref[0].astype(jnp.float32),
                        be1_ref[0].astype(jnp.float32)).astype(x.dtype)
    q_all = (jax.lax.dot_general(
        normed, wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[0].astype(jnp.float32)).astype(x.dtype)

    outs = []
    if head_pair:
        n_str = (num_heads + 1) // 2
        for s in range(n_str):
            q_s = q_all[:, s * 128:(s + 1) * 128]
            outs.append(softmax_av_pair(
                q_s, k_ref[0, s], v_ref[0, s], scale=scale, kv_len=kv_len,
                m_pad=kv_rows // 2, out_dtype=x.dtype))
    else:
        n_str = num_heads
        for h in range(num_heads):
            q_h = q_all[:, h * 128:(h + 1) * 128]
            outs.append(softmax_av(q_h, k_ref[0, h], v_ref[0, h],
                                   scale=scale, kv_len=kv_len,
                                   out_dtype=x.dtype))
    attn_out = jnp.concatenate(outs, axis=-1) if n_str > 1 else outs[0]

    y = jax.lax.dot_general(
        attn_out, wp_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0].astype(jnp.float32)
    hres = xf + y                                   # fp32 [tile, D_pad]
    # zero-padded wp columns + zero bq/bp pads keep padded lanes of y at 0,
    # so hres padded lanes equal xf's (zeros when the stream enters padded).

    # ---- MLP half ----
    normed2 = _masked_ln(hres, dim, eps2, g2_ref[0].astype(jnp.float32),
                         be2_ref[0].astype(jnp.float32)).astype(x.dtype)
    hid = jax.lax.dot_general(
        normed2, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    hid = _gelu(hid, gelu).astype(x.dtype)
    y2 = jax.lax.dot_general(
        hid, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    out = hres + y2
    o_ref[0] = out.astype(o_ref.dtype)
    if emit_next:
        on_ref[0] = _masked_ln(
            out, dim, eps_next, gn_ref[0].astype(jnp.float32),
            ben_ref[0].astype(jnp.float32)).astype(on_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "eps1", "eps2",
                                              "num_heads", "dim", "kv_len",
                                              "eps_next", "gelu",
                                              "head_pair", "kv_paired"))
def fused_block(x: jax.Array, k: jax.Array, v: jax.Array,
                ln1_scale: jax.Array, ln1_bias: jax.Array,
                wq: jax.Array, bq: jax.Array,
                wp: jax.Array, bp: jax.Array,
                ln2_scale: jax.Array, ln2_bias: jax.Array,
                w1: jax.Array, b1: jax.Array,
                w2: jax.Array, b2: jax.Array,
                ln_next: "tuple[jax.Array, jax.Array] | None" = None,
                *, scale: float, eps1: float, eps2: float,
                num_heads: int, dim: int | None = None,
                kv_len: int | None = None,
                eps_next: float | None = None, gelu: str = "tanh",
                head_pair: bool = False, kv_paired: bool = False):
    """One full transformer block on a (possibly lane-padded) stream.

    x: [B, N, D_any] with true feature width `dim` (default D_any) — pass a
    lane-padded stream (D_any = roundup(dim, 128), zero-filled) to skip the
    pad/unpad copies entirely; padded lanes are preserved as zeros.
    k, v: [B, H, M, hd] already projected (hd = dim/H) — or already in the
    kernel's padded layout [B, H, M_pad(128-mult), 128] with the true KV
    length given as ``kv_len`` (the producer folds the pads into its own
    einsum/concat; mvlt_tpu/models/pvlt.py _xla_kv padded_out path).
    Returns [B, N, D_any] = block(x) with residuals, in x.dtype; with
    ln_next=(scale, bias) returns (out, LN_next(out)) so the next block's
    K/V path skips its full-stream LayerNorm.
    """
    b, n, d_in = x.shape
    if dim is None:
        dim = d_in
    h = num_heads
    hd = dim // h
    m = kv_len if kv_len is not None else k.shape[2]
    if not kv_paired:
        assert k.shape[1] == h and k.shape[3] in (hd, 128)

    d_pad = _round_up(dim, 128)
    hd_pad = 128
    m_pad = _round_up(m, 128)
    assert k.shape[2] in ((2 * m_pad,) if kv_paired else (m, m_pad))
    hidden = w1.shape[1]
    hid_pad = _round_up(hidden, 128)

    dtype = x.dtype
    if head_pair and (hd > 64 or h < 2):
        raise ValueError(f"head_pair needs head_dim <= 64 and >= 2 heads "
                         f"(got hd={hd}, heads={h})")
    n_str = (h + 1) // 2 if head_pair else h   # 128-lane stripes
    if head_pair:
        # hp2: heads 2s and 2s+1 share stripe s — head A in lanes [0, hd),
        # head B in [64, 64+hd).  The Q GEMM and out-proj GEMM then run on
        # ceil(H/2)*128 lanes instead of H*128 (half the MXU work at hd=64).
        wq = wq.astype(dtype).reshape(dim, h, hd)
        wq2 = jnp.zeros((d_pad, n_str, 128), dtype)
        wq2 = wq2.at[:dim, :, :hd].set(wq[:, 0::2])
        wq2 = wq2.at[:dim, :h // 2, 64:64 + hd].set(wq[:, 1::2])
        wq2 = wq2.reshape(d_pad, n_str * 128)
        bqh = bq.astype(jnp.float32).reshape(h, hd)
        bq2 = jnp.zeros((n_str, 128), jnp.float32)
        bq2 = bq2.at[:, :hd].set(bqh[0::2])
        bq2 = bq2.at[:h // 2, 64:64 + hd].set(bqh[1::2])
        bq2 = bq2.reshape(1, n_str * 128)
        wp = wp.astype(dtype).reshape(h, hd, dim)
        wp2 = jnp.zeros((n_str, 128, d_pad), dtype)
        wp2 = wp2.at[:, :hd, :dim].set(wp[0::2])
        wp2 = wp2.at[:h // 2, 64:64 + hd, :dim].set(wp[1::2])
        wp2 = wp2.reshape(n_str * 128, d_pad)
    else:
        # expand Wq into per-head 128-lane stripes
        wq = wq.astype(dtype).reshape(dim, h, hd)
        wq2 = jnp.zeros((d_pad, h, hd_pad), dtype)
        wq2 = wq2.at[:dim, :, :hd].set(wq)
        wq2 = wq2.reshape(d_pad, h * hd_pad)
        bq2 = jnp.zeros((h, hd_pad), jnp.float32).at[:, :hd].set(
            bq.astype(jnp.float32).reshape(h, hd)).reshape(1, h * hd_pad)
        # expand Wp with matching zero rows (zero columns beyond dim keep the
        # padded lanes of the residual at 0)
        wp = wp.astype(dtype).reshape(h, hd, dim)
        wp2 = jnp.zeros((h, hd_pad, d_pad), dtype)
        wp2 = wp2.at[:, :hd, :dim].set(wp)
        wp2 = wp2.reshape(h * hd_pad, d_pad)

    def vec(a, width):
        out = jnp.zeros((1, width), jnp.float32)
        return out.at[0, :a.shape[0]].set(a.astype(jnp.float32))

    bp2 = vec(bp, d_pad)
    g1 = vec(ln1_scale, d_pad)
    be1 = vec(ln1_bias, d_pad)
    g2 = vec(ln2_scale, d_pad)
    be2 = vec(ln2_bias, d_pad)
    w1p = jnp.zeros((d_pad, hid_pad), dtype).at[:dim, :hidden].set(w1.astype(dtype))
    b1p = vec(b1, hid_pad)
    w2p = jnp.zeros((hid_pad, d_pad), dtype).at[:hidden, :dim].set(w2.astype(dtype))
    b2p = vec(b2, d_pad)

    kp = k.astype(dtype)
    vp = v.astype(dtype)
    kv_rows = 2 * m_pad if head_pair else m_pad
    if kv_paired:
        # producer (ops/sr_kv.py head_pair=True) already emitted the paired
        # layout — zero re-layout glue on this path
        assert head_pair, "kv_paired layout requires head_pair"
        assert kp.shape == (b, n_str, kv_rows, 128), (kp.shape, n_str, kv_rows)
    else:
        if k.shape[3] != hd_pad:
            kp = jnp.pad(kp, ((0, 0), (0, 0), (0, 0), (0, hd_pad - hd)))
            vp = jnp.pad(vp, ((0, 0), (0, 0), (0, 0), (0, hd_pad - hd)))
        if kp.shape[2] != m_pad:
            kp = jnp.pad(kp, ((0, 0), (0, 0), (0, m_pad - kp.shape[2]), (0, 0)))
            vp = jnp.pad(vp, ((0, 0), (0, 0), (0, m_pad - vp.shape[2]), (0, 0)))

        if head_pair:
            # pair K/V in XLA: stripe s = [head 2s rows (lanes 0:hd) ; head
            # 2s+1 rows shifted to lanes 64:64+hd].  NB: these per-block
            # copies measured a 10% serving LOSS at B=101 (tools/
            # tpu_hp2_check.py) — production rides the kv_paired producer
            # path; this branch exists for parity tests / ad-hoc K/V.
            def _pair(a):
                if h % 2:
                    a = jnp.pad(a, ((0, 0), (0, 1), (0, 0), (0, 0)))
                lo = a[:, 0::2]
                hi = a[:, 1::2, :, :64]
                hi = jnp.concatenate([jnp.zeros_like(hi), hi], axis=-1)
                return jnp.concatenate([lo, hi], axis=2)

            kp, vp = _pair(kp), _pair(vp)

    # Row tiling under the scoped-VMEM budget.  Fixed blocks (weights + KV,
    # broadcast to every step) come off the top; per-row fp32/bf16 live set:
    # x/xf/normed/q/attn-out/hres/normed2/y2/out on d_pad lanes (~26 B/lane
    # incl. double-buffered in/out tiles), fp32 logits on m_pad, fp32+bf16
    # hidden on hid_pad.
    emit_next = ln_next is not None
    fixed = (2 * d_pad * n_str * 128 + 2 * d_pad * hid_pad
             + 2 * n_str * kv_rows * 128) * 2
    per_row = kv_rows * 4 + n_str * 128 * 4 + d_pad * 26 + hid_pad * 6
    if emit_next:
        per_row += d_pad * 4  # second (double-buffered bf16) output tile
    cap = max(64, (_VMEM_BUDGET - fixed) // per_row // 16 * 16)
    num_tiles = max(1, -(-n // cap))
    # prefer a tile that divides n exactly on a 16-row (sublane) boundary so
    # the stream needs no token padding (pad/slice copies are what this
    # kernel exists to avoid)
    tile = 0
    for nt in range(num_tiles, num_tiles + 8):
        if n % nt == 0 and (n // nt) % 16 == 0 and n // nt <= cap:
            tile = n // nt
            break
    if not tile:
        tile = _round_up(-(-n // num_tiles), 16)
    n_pad = _round_up(n, tile)
    xp = x
    if d_in != d_pad or n_pad != n:
        assert d_in <= d_pad
        xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, d_pad - d_in)))

    if emit_next:
        gn = vec(ln_next[0], d_pad)
        ben = vec(ln_next[1], d_pad)
        kernel_fn = functools.partial(
            _kernel, scale=scale, eps1=eps1, eps2=eps2,
            dim=dim, kv_len=m, num_heads=h, emit_next=True, gelu=gelu,
            head_pair=head_pair, kv_rows=kv_rows,
            # the NEXT block's LN1 epsilon — defaults to this block's eps1
            # but is passed explicitly by PVLT so per-block eps divergence
            # can't silently corrupt the handoff
            eps_next=eps_next if eps_next is not None else eps1)
    else:
        gn = jnp.zeros((1, d_pad), jnp.float32)
        ben = jnp.zeros((1, d_pad), jnp.float32)

        def kernel_fn(*refs):
            # single output: pad the missing on_ref slot
            _kernel(*refs, None, scale=scale, eps1=eps1, eps2=eps2,
                    dim=dim, kv_len=m, num_heads=h, emit_next=False,
                    gelu=gelu, head_pair=head_pair, kv_rows=kv_rows)

    stream_spec = pl.BlockSpec((1, tile, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
    grid = (b, n_pad // tile)
    out = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_str, kv_rows, hd_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_str, kv_rows, hd_pad), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, n_str * 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_str * 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_str * 128, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, hid_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid_pad, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[stream_spec, stream_spec] if emit_next else stream_spec,
        out_shape=(
            [jax.ShapeDtypeStruct((b, n_pad, d_pad), x.dtype)] * 2
            if emit_next else jax.ShapeDtypeStruct((b, n_pad, d_pad), x.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (d_pad * n_str * 128 * 2
                               + n_str * kv_rows * 128 * 2
                               + d_pad * hid_pad * 2),
            # residual-stream read+write(s) + per-batch K/V broadcast (the
            # K/V block re-DMAs when the grid's batch index advances; it
            # dominates at small tiles) + one pass over the weight blocks
            bytes_accessed=(
                (3 if emit_next else 2) * b * n_pad * d_pad * x.dtype.itemsize
                + b * 2 * n_str * kv_rows * 128 * x.dtype.itemsize
                + (2 * d_pad * n_str * 128 + 2 * d_pad * hid_pad) * x.dtype.itemsize),
            transcendentals=b * n * (n_str * kv_rows + hid_pad),
        ),
    )(xp, kp, vp, wq2, bq2, wp2, bp2, g1, be1, g2, be2, w1p, b1p, w2p, b2p,
      gn, ben)

    if emit_next:
        out, out_next = out
        if d_in != d_pad or n_pad != n:
            out = out[:, :n, :d_in]
            out_next = out_next[:, :n, :d_in]
        return out, out_next
    if d_in == d_pad and n_pad == n:
        return out
    return out[:, :n, :d_in]
