"""Swin-style joint image+text transformer block.

The BASELINE.json stretch row asks for "PVT-v2 / Swin variants" of the PVLT
backbone (reference registry pattern: libs/pvlt.py:415-483).  This block
swaps PVLT's global SRA attention for Swin's shifted-window attention while
keeping MVLT's defining property — text tokens are jointly attended at
every stage:

  * visual queries attend within (optionally shifted) windows, with Swin's
    learned relative-position bias on the visual-visual logits, PLUS all
    text tokens as extra KV columns.  The text keys are shared across
    windows (computed once, attached via a second logit block — no
    [B, nW, T, C] duplication is materialized).
  * text queries attend over an average-pooled visual grid (linear-SRA
    style, so cost is O(T * (P^2 + T))) plus the text tokens.

TPU-first details: window size defaults to 8 (lane-friendly, divides the
256-input stage grids exactly); grids that don't divide are zero-padded and
the padded cells masked via the same static region-id mask that implements
Swin's shifted-window masking (computed in numpy at trace time — no dynamic
shapes).  Padded windows can't NaN: the text KV columns are never masked.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)

NEG_INF = -1e9


def _pad_to(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def window_masks(h: int, w: int, wsize: int, shift: int) -> np.ndarray:
    """[nW, wsize^2, wsize^2] additive mask implementing Swin's shifted-window
    region masking AND padding masking in one static table."""
    hp, wp = _pad_to(h, wsize), _pad_to(w, wsize)
    rows = np.arange(hp)
    cols = np.arange(wp)

    # padding flags move with the cyclic shift exactly like the tokens do
    pad = ((rows >= h)[:, None] | (cols >= w)[None, :]).astype(np.int64)
    pad = np.roll(pad, (-shift, -shift), axis=(0, 1))

    def region(n: int) -> np.ndarray:
        r = np.zeros(n, np.int64)
        if shift:
            r[n - wsize:] = 1
            r[n - shift:] = 2
        return r

    ids = region(hp)[:, None] * 3 + region(wp)[None, :] + 9 * pad

    nh, nw = hp // wsize, wp // wsize
    win_ids = ids.reshape(nh, wsize, nw, wsize).transpose(0, 2, 1, 3)
    win_ids = win_ids.reshape(nh * nw, wsize * wsize)
    same = win_ids[:, :, None] == win_ids[:, None, :]
    return np.where(same, 0.0, NEG_INF).astype(np.float32)


def relative_position_index(wsize: int) -> np.ndarray:
    """[wsize^2, wsize^2] index into the (2w-1)^2 relative-bias table."""
    coords = np.stack(np.meshgrid(np.arange(wsize), np.arange(wsize),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :] + (wsize - 1)
    return (rel[0] * (2 * wsize - 1) + rel[1]).astype(np.int32)


# text-query pooling divisor: pooled-KV window = max(1, h // TEXT_POOL).
# Single source of truth — PVLT's swin stage gate and the fused band path
# derive their pooling window from this too (ADVICE r4: a config change
# here must not silently desync the band kernel's pooled KV).
TEXT_POOL = 8


class SwinJointAttention(nn.Module):
    """Windowed visual attention with global text KV + pooled-KV text queries."""

    dim: int
    num_heads: int
    window_size: int = 8
    shift: bool = False
    qkv_bias: bool = True
    proj_drop: float = 0.0
    text_pool: int = TEXT_POOL
    use_pallas: bool = False   # fused windowed-attention kernel (serving)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int], t_num: int, *,
                 deterministic: bool = True) -> jnp.ndarray:
        b, n, c = x.shape
        h, w = hw
        nh, hd = self.num_heads, c // self.num_heads
        ws = min(self.window_size, h, w)
        s = ws // 2 if self.shift else 0
        scale = hd ** -0.5

        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=_trunc02, name="q")(x)
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                      kernel_init=_trunc02, name="kv")(x)
        k_all, v_all = kv[..., :c], kv[..., c:]

        def heads_of(t):   # [..., L, C] -> [..., nh, L, hd]
            return jnp.moveaxis(t.reshape(t.shape[:-1] + (nh, hd)), -2, -3)

        # --- visual queries: shifted-window attention + text KV ------------
        hp, wp = _pad_to(h, ws), _pad_to(w, ws)
        nwin = (hp // ws) * (wp // ws)

        def windows(t):    # [B, H*W(+T), C] visual part -> [B, nW, ws*ws, C]
            g = t[:, : h * w, :].reshape(b, h, w, c)
            g = jnp.pad(g, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
            if s:
                g = jnp.roll(g, (-s, -s), axis=(1, 2))
            g = g.reshape(b, hp // ws, ws, wp // ws, ws, c)
            return g.transpose(0, 1, 3, 2, 4, 5).reshape(b, nwin, ws * ws, c)

        q_win = heads_of(windows(q))                      # [B, nW, nh, ws2, hd]
        k_win = heads_of(windows(k_all))
        v_win = heads_of(windows(v_all))
        k_txt = heads_of(k_all[:, h * w:, :])             # [B, nh, T, hd]
        v_txt = heads_of(v_all[:, h * w:, :])

        # Swin relative-position bias on the visual-visual block
        table = self.param("rel_pos_bias",
                           _trunc02, ((2 * ws - 1) ** 2, nh), jnp.float32)
        idx = jnp.asarray(relative_position_index(ws))
        bias = jnp.moveaxis(table[idx], -1, 0)            # [nh, ws2, ws2]
        mask = jnp.asarray(window_masks(h, w, ws, s))     # [nW, ws2, ws2]

        use_kernel = (
            self.use_pallas and deterministic and not self.is_initializing()
            and jax.default_backend() == "tpu"
        )
        if use_kernel:
            # fused path: bias + region/pad mask pre-folded into one
            # additive table; logits never touch HBM
            # (mvlt_tpu/ops/swin_attention.py)
            from mvlt_tpu.ops.swin_attention import fused_swin_attention

            add = bias[None] + mask[:, None]              # [nW, nh, ws2, ws2]
            add_table = jnp.concatenate(
                [add, jnp.zeros((nwin, nh, ws * ws, t_num), jnp.float32)],
                axis=-1)
            out_win = fused_swin_attention(
                q_win, k_win, v_win, k_txt, v_txt, add_table, scale=scale)
        else:
            logits_vv = jnp.einsum("bnhqd,bnhkd->bnhqk", q_win, k_win,
                                   preferred_element_type=jnp.float32) * scale
            logits_vv = logits_vv + bias[None, None]
            logits_vv = logits_vv + mask[None, :, None]
            logits_vt = jnp.einsum("bnhqd,bhtd->bnhqt", q_win, k_txt,
                                   preferred_element_type=jnp.float32) * scale

            logits = jnp.concatenate([logits_vv, logits_vt], axis=-1)
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            p_vv, p_vt = probs[..., : ws * ws], probs[..., ws * ws:]
            out_win = (jnp.einsum("bnhqk,bnhkd->bnhqd", p_vv, v_win,
                                  preferred_element_type=jnp.float32)
                       + jnp.einsum("bnhqt,bhtd->bnhqd", p_vt, v_txt,
                                    preferred_element_type=jnp.float32)).astype(x.dtype)

        # reverse: windows -> padded grid -> unshift -> crop -> tokens
        g = jnp.moveaxis(out_win, 2, -2).reshape(
            b, hp // ws, wp // ws, ws, ws, nh * hd)
        g = g.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if s:
            g = jnp.roll(g, (s, s), axis=(1, 2))
        out_vis = g[:, :h, :w, :].reshape(b, h * w, c)

        # --- text queries: pooled visual KV + text KV -----------------------
        q_txt = heads_of(q[:, h * w:, :])                 # [B, nh, T, hd]
        win = max(1, h // self.text_pool)
        k_vis = k_all[:, : h * w, :].reshape(b, h, w, c)
        v_vis = v_all[:, : h * w, :].reshape(b, h, w, c)
        k_pool = nn.avg_pool(k_vis, (win, win), (win, win)).reshape(b, -1, c)
        v_pool = nn.avg_pool(v_vis, (win, win), (win, win)).reshape(b, -1, c)
        k_t = jnp.concatenate([heads_of(k_pool), k_txt], axis=-2)
        v_t = jnp.concatenate([heads_of(v_pool), v_txt], axis=-2)
        t_logits = jnp.einsum("bhqd,bhkd->bhqk", q_txt, k_t,
                              preferred_element_type=jnp.float32) * scale
        t_probs = jax.nn.softmax(t_logits, axis=-1).astype(x.dtype)
        out_txt = jnp.einsum("bhqk,bhkd->bhqd", t_probs, v_t,
                             preferred_element_type=jnp.float32).astype(x.dtype)
        out_txt = jnp.moveaxis(out_txt, 1, 2).reshape(b, t_num, c)

        out = jnp.concatenate([out_vis, out_txt], axis=1)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=_trunc02, name="proj")(out)
        if self.proj_drop:
            out = nn.Dropout(rate=self.proj_drop)(out, deterministic=deterministic)
        return out
