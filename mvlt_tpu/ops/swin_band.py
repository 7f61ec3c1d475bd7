"""Whole-block Pallas kernel for the Swin variant's serving path: one
horizontal BAND of windows per grid step, with the window partition folded
into the mask instead of into HBM layout.

Why: the Swin serving gap vs v1 is glue, not matmuls (round-5 queue #1
measured the window-pair kernel neutral).  The XLA path spends ~a dozen
full-stream HBM walks per block on `windows()` partition/reverse
transposes, per-head splits, lane pads and q/kv projections around the
windowed attention (models/swin.py:109-172).  This kernel removes ALL of
them by exploiting one fact: a row of windows (`ws` consecutive grid rows)
is a CONTIGUOUS span of the token stream, so a BlockSpec can hand the
kernel whole window-bands with zero data movement.  Inside the band the
window structure is enforced by a precomputed additive mask: logits are
computed densely [band, band+text] on the MXU (where the extra FLOPs are
nearly free at these shapes) and non-window pairs get -inf.  One band step
then runs the ENTIRE block: LN1 -> q/k/v -> masked joint window+text
attention -> proj -> +res -> LN2 -> MLP -> +res (block_fused.py's
structure), one read and one write of the visual stream per block.

Swin's cyclic shift decomposes: the HORIZONTAL half needs no roll at all —
shifted windows (including the wrap window whose two pieces sit at the
band's x-edges) are just a different column grouping, folded into the same
mask that already carries Swin's region ids and the relative-position bias
(all computed in rolled coordinates, matching models/swin.py semantics
exactly).  The VERTICAL half is one cheap jnp.roll of the visual stream by
`shift` grid rows (contiguous copy), done by the caller; only the LAST band
then contains the y-wrap, so shifted blocks carry two mask kinds and the
mask BlockSpec selects by band index (the table stays VMEM-resident across
the inner batch grid dimension).

The text-query half of the joint attention (pooled visual KV + text KV,
models/swin.py:174-188) stays in XLA — it is [B, T, C]-sized — but needs
pooled LN1(x) of the full visual grid, so the kernel emits a second tiny
output: the band's LN1 rows average-pooled over x-window groups (an MXU
matmul against a constant pooling operand — no in-kernel reshapes).  The
caller finishes the y-pooling (and the un-roll for shifted blocks) on the
16x-reduced tensor.

Inference-path only (the swin variant trains on the XLA path).
Reference being served: the shifted-window attention semantics of
models/swin.py (itself the MVLT joint-stream analogue of Swin; reference
registry rows at /root/reference/libs/pvlt.py:415-483 are the capability
slot this variant fills).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.kernel_math import (LOG2E, gelu as _gelu,
                                      one_pass_ln as _masked_ln,
                                      round_up as _round_up)

# scoped-VMEM ceiling for the pre-flight estimate (a silent overflow
# surfaces as an opaque tpu_compile_helper HTTP 500 — CLAUDE.md)
_VMEM_LIMIT = 14 * 1024 * 1024


def swin_band_vmem_est(*, hw: tuple, ws: int, win: int, dim: int,
                       num_heads: int, hidden: int, t_num: int,
                       itemsize: int) -> int:
    """Scoped-VMEM byte estimate for one fused_swin_band_block grid step.

    Shared between the kernel's pre-flight check and PVLT's swin_full_stage
    gate (ADVICE r4: the gate must route oversized shapes to the XLA path
    instead of letting the kernel raise at trace time).  Must mirror the
    block/scratch plan in fused_swin_band_block exactly."""
    h, w = hw
    d_pad = _round_up(dim, 128)
    nh = num_heads
    big_l = ws * w
    t_pad = _round_up(t_num, 16)   # the caller's stripe_seq pad rule
    m_pad = _round_up(big_l + t_pad, 128)
    hid_pad = _round_up(hidden, 128)
    p_rows = ws * (w // win)
    fixed = ((3 * d_pad * nh * 128 + nh * 128 * d_pad
              + d_pad * hid_pad + hid_pad * d_pad) * itemsize
             + nh * big_l * m_pad * 4          # mask block
             + 2 * 2 * t_pad * nh * 128 * itemsize
             + p_rows * big_l * 4)
    per_row = (m_pad * 8                       # fp32 logits + unnorm
               + nh * 128 * 3 * itemsize       # q/k/v stripes
               + d_pad * (8 + 4 * itemsize)    # xf/hres fp32 + x/out tiles
               + hid_pad * (4 + itemsize))
    return fixed + big_l * per_row + p_rows * d_pad * 4


def swin_band_vmem_ok(**kw) -> bool:
    """True if the band kernel's per-step live set fits scoped VMEM."""
    return swin_band_vmem_est(**kw) <= _VMEM_LIMIT


@functools.lru_cache(maxsize=None)
def _band_layout(h: int, w: int, ws: int, shift: bool):
    """numpy window/region/bias layout for one band of windows.

    Returns (kinds, bands, L) where kinds is a list of (allow, bidx):
    allow [L, L] bool — may band-row q attend band-row k; bidx [L, L]
    int32 — index into the (2ws-1)^2 relative-position-bias table (valid
    where allow).  Band rows are (y-in-band, x) row-major with x in
    ORIGINAL (un-rolled) order; y is in ROLLED order (the caller rolls the
    stream vertically for shifted blocks).  kinds[0] = interior band,
    kinds[1] (shifted, >1 band) = the last band, which holds the y-wrap."""
    s = ws // 2 if shift else 0
    bands = h // ws
    big_l = ws * w

    x = np.arange(w)
    xr = (x - s) % w                       # x in rolled coordinates
    xwin = xr // ws                        # window id along x
    regx = np.zeros(w, np.int64)           # Swin region id along x
    if s:
        regx[xr >= w - ws] = 1
        regx[xr >= w - s] = 2

    rr = np.repeat(np.arange(ws), w)       # band-row y of each band token
    xx = np.tile(xr, ws)                   # rolled x of each band token

    def one(last_band: bool):
        regy = np.zeros(ws, np.int64)
        if s and last_band:
            # last band = rolled rows [h-ws, h): Swin region(n) ids 1 / 2
            regy[:] = 1
            regy[np.arange(ws) >= ws - s] = 2
        reg = (regy[:, None] * 3 + regx[None, :]).reshape(-1)      # [L]
        wid = np.broadcast_to(xwin[None, :], (ws, w)).reshape(-1)  # [L]
        allow = (wid[:, None] == wid[None, :]) & (reg[:, None] == reg[None, :])
        dy = rr[:, None] - rr[None, :]
        dx = xx[:, None] - xx[None, :]     # rolled coords, as Swin's bias uses
        bidx = (dy + ws - 1) * (2 * ws - 1) + (dx + ws - 1)
        bidx = np.where(allow, bidx, 0).astype(np.int32)
        return allow, bidx

    if not shift:
        kinds = [one(False)]
    elif bands == 1:
        kinds = [one(True)]                # the single band IS the wrap band
    else:
        kinds = [one(False), one(True)]
    return kinds, bands, big_l


@functools.lru_cache(maxsize=None)
def _pool_matrix(w: int, ws: int, win: int) -> np.ndarray:
    """[ws*(w//win), ws*w] fp32 operand P with P @ band_rows = the band's
    LN rows average-pooled over x-window groups of ``win`` (y unpooled —
    the caller pools y across bands, which keeps shifted-block pooling
    exact after the un-roll).  Pooling by matmul keeps the kernel free of
    sublane reshapes (Mosaic restriction, CLAUDE.md)."""
    p_rows = ws * (w // win)
    pm = np.zeros((p_rows, ws * w), np.float32)
    p = np.arange(p_rows)
    py, pg = p // (w // win), p % (w // win)
    l = np.arange(ws * w)
    ly, lx = l // w, l % w
    pm[(py[:, None] == ly[None, :]) & (pg[:, None] == (lx // win)[None, :])] \
        = 1.0 / win
    return pm


def swin_band_add_tables(rel_table: jax.Array, *, h: int, w: int, ws: int,
                         shift: bool, t_num: int, t_pad: int) -> jax.Array:
    """[kinds, nh, L, M_pad] fp32 additive logit tables in exp2 units:
    relative-position bias on allowed visual pairs, -inf on cross-window /
    cross-region pairs, 0 on the t_num text columns, -inf beyond.
    ``rel_table``: the learned [(2ws-1)^2, nh] bias param."""
    kinds, _, big_l = _band_layout(h, w, ws, shift)
    m_pad = _round_up(big_l + t_pad, 128)
    tab = rel_table.astype(jnp.float32)
    out = []
    for allow, bidx in kinds:
        vis = jnp.moveaxis(tab[jnp.asarray(bidx)], -1, 0)      # [nh, L, L]
        vis = jnp.where(jnp.asarray(allow)[None], vis, -jnp.inf)
        add = jnp.full((tab.shape[-1], big_l, m_pad), -jnp.inf, jnp.float32)
        add = add.at[:, :, :big_l].set(vis)
        add = add.at[:, :, big_l:big_l + t_num].set(0.0)
        out.append(add)
    return jnp.stack(out) * LOG2E          # exp2-space; -inf stays -inf


def _kernel(x_ref, kt_ref, vt_ref, add_ref, pm_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wp_ref, bp_ref,
            g1_ref, be1_ref, g2_ref, be2_ref,
            w1_ref, b1_ref, w2_ref, b2_ref,
            o_ref, po_ref, *, scale: float, eps1: float, eps2: float,
            dim: int, num_heads: int, gelu: str):
    """x_ref/o_ref: [1, L, D_pad]; kt/vt_ref: [1, T_pad, H*128] (striped);
    add_ref: [1, H, L, M_pad]; pm_ref: [P, L]; po_ref: [1, P, D_pad];
    weights striped/padded as in ops/block_fused.py."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)

    normed_f = _masked_ln(xf, dim, eps1, g1_ref[0].astype(jnp.float32),
                          be1_ref[0].astype(jnp.float32))
    # x-pooled LN rows for the XLA text-query path (zero-padded lanes of
    # normed_f are exact zeros: vec() zero-pads gamma/beta)
    po_ref[0] = jax.lax.dot_general(
        pm_ref[:], normed_f, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(po_ref.dtype)
    normed = normed_f.astype(x.dtype)

    def proj(w_ref, b_ref):
        return (jax.lax.dot_general(
            normed, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0].astype(jnp.float32)).astype(x.dtype)

    q_all = proj(wq_ref, bq_ref)           # [L, H*128]
    k_band = proj(wk_ref, bk_ref)
    v_band = proj(wv_ref, bv_ref)

    m_pad = add_ref.shape[-1]
    t_pad = kt_ref.shape[1]
    big_l = x.shape[0]
    pad_rows = m_pad - big_l - t_pad
    outs = []
    for hh in range(num_heads):
        sl = slice(hh * 128, (hh + 1) * 128)
        parts_k = [k_band[:, sl], kt_ref[0, :, sl]]
        parts_v = [v_band[:, sl], vt_ref[0, :, sl]]
        if pad_rows:
            z = jnp.zeros((pad_rows, 128), x.dtype)
            parts_k.append(z)
            parts_v.append(z)
        k_h = jnp.concatenate(parts_k, axis=0)     # [M_pad, 128] VMEM concat
        v_h = jnp.concatenate(parts_v, axis=0)
        logits = jax.lax.dot_general(
            q_all[:, sl], k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E) + add_ref[0, hh]
        row_max = jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp2(logits - row_max)        # exp2(-inf)=0: mask holds
        denom = jnp.sum(unnorm, axis=-1, keepdims=True)
        out_h = jax.lax.dot_general(
            unnorm.astype(x.dtype), v_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom                                   # normalizer after P@V
        outs.append(out_h.astype(x.dtype))
    attn = jnp.concatenate(outs, axis=-1) if num_heads > 1 else outs[0]

    y = jax.lax.dot_general(
        attn, wp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0].astype(jnp.float32)
    hres = xf + y                                   # padded lanes stay 0

    normed2 = _masked_ln(hres, dim, eps2, g2_ref[0].astype(jnp.float32),
                         be2_ref[0].astype(jnp.float32)).astype(x.dtype)
    hid = jax.lax.dot_general(
        normed2, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    hid = _gelu(hid, gelu).astype(x.dtype)
    y2 = jax.lax.dot_general(
        hid, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (hres + y2).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "hw", "ws", "win", "dim", "num_heads", "scale", "eps1", "eps2", "gelu"))
def fused_swin_band_block(x: jax.Array, kt: jax.Array, vt: jax.Array,
                          add: jax.Array,
                          ln1_scale: jax.Array, ln1_bias: jax.Array,
                          wq: jax.Array, bq: jax.Array,
                          wk: jax.Array, bk: jax.Array,
                          wv: jax.Array, bv: jax.Array,
                          wp: jax.Array, bp: jax.Array,
                          ln2_scale: jax.Array, ln2_bias: jax.Array,
                          w1: jax.Array, b1: jax.Array,
                          w2: jax.Array, b2: jax.Array, *,
                          hw: tuple, ws: int, win: int, dim: int,
                          num_heads: int, scale: float,
                          eps1: float, eps2: float, gelu: str = "tanh"):
    """One Swin block (both halves) on the VISUAL half of a lane-padded
    stream, one band of windows per grid step.

    x: [B, h*w, D_pad] (rolled by -shift grid rows for shifted blocks —
    the caller owns the roll/unroll pair); kt/vt: [B, T_pad, H*128] text
    K/V in the striped layout (bias included); add: swin_band_add_tables
    output.  Returns (out [B, h*w, D_pad], pooled [B, (h//ws)*P, D_pad])
    with P = ws*(w//win) x-pooled LN1 rows per band, y-unpooled.
    """
    h, w = hw
    b, n_vis, d_pad = x.shape
    assert n_vis == h * w and d_pad == _round_up(dim, 128)
    nh = num_heads
    hd = dim // nh
    bands = h // ws
    big_l = ws * w
    t_pad = kt.shape[1]
    m_pad = _round_up(big_l + t_pad, 128)
    assert add.shape[1:] == (nh, big_l, m_pad), (add.shape, nh, big_l, m_pad)
    hidden = w1.shape[1]
    hid_pad = _round_up(hidden, 128)
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize

    # striped weights (head_dim on 128 MXU lanes; ops/block_fused.py trick)
    def stripe_in(wm, bm):                 # [dim, dim] -> [D_pad, H*128]
        wm = wm.astype(dtype).reshape(dim, nh, hd)
        w2_ = jnp.zeros((d_pad, nh, 128), dtype).at[:dim, :, :hd].set(wm)
        b2_ = jnp.zeros((nh, 128), jnp.float32).at[:, :hd].set(
            bm.astype(jnp.float32).reshape(nh, hd))
        return w2_.reshape(d_pad, nh * 128), b2_.reshape(1, nh * 128)

    wq2, bq2 = stripe_in(wq, bq)
    wk2, bk2 = stripe_in(wk, bk)
    wv2, bv2 = stripe_in(wv, bv)
    wpm = wp.astype(dtype).reshape(nh, hd, dim)
    wp2 = jnp.zeros((nh, 128, d_pad), dtype).at[:, :hd, :dim].set(wpm)
    wp2 = wp2.reshape(nh * 128, d_pad)

    def vec(a, width):
        out = jnp.zeros((1, width), jnp.float32)
        return out.at[0, :a.shape[0]].set(a.astype(jnp.float32))

    bp2 = vec(bp, d_pad)
    g1 = vec(ln1_scale, d_pad)
    be1 = vec(ln1_bias, d_pad)
    g2 = vec(ln2_scale, d_pad)
    be2 = vec(ln2_bias, d_pad)
    w1p = jnp.zeros((d_pad, hid_pad), dtype).at[:dim, :hidden].set(
        w1.astype(dtype))
    b1p = vec(b1, hid_pad)
    w2p = jnp.zeros((hid_pad, d_pad), dtype).at[:hidden, :dim].set(
        w2.astype(dtype))
    b2p = vec(b2, d_pad)

    pm = jnp.asarray(_pool_matrix(w, ws, win))
    p_rows = pm.shape[0]

    # pre-flight scoped-VMEM estimate (sized from itemsize — ADVICE r3;
    # shared with PVLT's stage gate via swin_band_vmem_est so oversized
    # shapes route to the XLA path instead of raising here — ADVICE r4)
    est = swin_band_vmem_est(hw=hw, ws=ws, win=win, dim=dim,
                             num_heads=nh, hidden=hidden, t_num=t_pad,
                             itemsize=itemsize)
    if est > _VMEM_LIMIT:
        raise ValueError(
            f"fused_swin_band_block VMEM estimate {est / 2**20:.1f} MiB > "
            f"{_VMEM_LIMIT / 2**20:.0f} MiB at hw={hw}, ws={ws}, dim={dim}, "
            f"heads={nh}, hidden={hidden} — fall back to the XLA path")

    kinds = add.shape[0]
    if kinds == 1:
        add_map = lambda i, j: (0, 0, 0, 0)  # noqa: E731
    else:
        # interior bands -> kind 0; the last band (y-wrap) -> kind 1
        add_map = lambda i, j: ((i + 1) // bands, 0, 0, 0)  # noqa: E731

    stream_spec = pl.BlockSpec((1, big_l, d_pad), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM)
    txt_spec = pl.BlockSpec((1, t_pad, nh * 128), lambda i, j: (j, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, j: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out, pooled = pl.pallas_call(
        functools.partial(_kernel, scale=scale, eps1=eps1, eps2=eps2,
                          dim=dim, num_heads=nh, gelu=gelu),
        grid=(bands, b),                   # batch innermost: the mask block
        in_specs=[                         # stays VMEM-resident across it
            stream_spec,
            txt_spec, txt_spec,
            pl.BlockSpec((1, nh, big_l, m_pad), add_map,
                         memory_space=pltpu.VMEM),
            const((p_rows, big_l)),
            const((d_pad, nh * 128)), const((1, nh * 128)),
            const((d_pad, nh * 128)), const((1, nh * 128)),
            const((d_pad, nh * 128)), const((1, nh * 128)),
            const((nh * 128, d_pad)), const((1, d_pad)),
            const((1, d_pad)), const((1, d_pad)),
            const((1, d_pad)), const((1, d_pad)),
            const((d_pad, hid_pad)), const((1, hid_pad)),
            const((hid_pad, d_pad)), const((1, d_pad)),
        ],
        out_specs=[
            stream_spec,
            pl.BlockSpec((1, p_rows, d_pad), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_vis, d_pad), dtype),
            jax.ShapeDtypeStruct((b, bands * p_rows, d_pad), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_vis * (4 * d_pad * nh * 128
                                   + 2 * nh * m_pad * 128
                                   + 2 * d_pad * hid_pad),
            bytes_accessed=(2 * b * n_vis * d_pad * itemsize
                            + b * bands * 2 * t_pad * nh * 128 * itemsize
                            + kinds * nh * big_l * m_pad * 4
                            + b * bands * p_rows * d_pad * itemsize),
            transcendentals=b * n_vis * (nh * m_pad + hid_pad),
        ),
    )(x, kt, vt, add, pm, wq2, bq2, wk2, bk2, wv2, bv2, wp2, bp2,
      g1, be1, g2, be2, w1p, b1p, w2p, b2p)
    return out, pooled
