"""PVLT: Pyramid Vision-Language Transformer, TPU-native.

Rebuild of the reference model (libs/pvlt.py:175-401): a 4-stage PVT pyramid
where BERT-embedded text tokens are re-projected and concatenated with image
patch tokens at every stage, jointly attended with spatial-reduction
attention (SRA) applied to the visual tokens only, then split back.

TPU-first design choices (vs. the torch reference):
  * NHWC image layout end to end — XLA's native conv layout on TPU.
  * All matmuls (patch-embed conv, QKV, MLP, heads) run in a configurable
    compute dtype (bf16 by default) with float32 parameters and float32
    softmax/logit accumulation.
  * The attention core dispatches to a fused Pallas kernel on TPU
    (mvlt_tpu/ops/pallas_attention.py); QKV projections and the SR conv are
    left to XLA, which fuses them onto the MXU.
  * Static shapes everywhere; the per-stage loop is a Python loop over a
    static stage count, so the whole forward traces to one XLA graph.

Reference quirks reproduced (see SURVEY.md §7 "Hard parts" item 4):
  * stage-4 positional embedding allocates num_patches+1 slots (PVT
    cls-token compat) and drops slot 0 at use (libs/pvlt.py:209, 341-342);
  * positional embeddings are bilinearly resized (align_corners=False, no
    antialias) when the runtime grid differs from the configured grid
    (libs/pvlt.py:291-297).  The reference gates the resize on a comparison
    with *stage-1's* patch count; that gate only ever differs from a plain
    same-shape check in configurations that crash the reference, so the
    clean check is used here.
"""

from __future__ import annotations

import os as _os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mvlt_tpu.config import ModelConfig
from mvlt_tpu.models.bert_embeddings import BertEmbeddings
from mvlt_tpu.models.heads import CLSHead, ITGHead, ITMHead, MLMHead, erf_gelu
from mvlt_tpu.ops.attention import multi_head_attention

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def fused_block_env_ok(*, use_pallas: bool, variant: str, linear_sr: bool,
                       deterministic: bool, drop: float, attn_drop: float,
                       is_initializing: bool) -> bool:
    """Single source of truth for "may a fused Pallas block kernel run here":
    shared by PVLT's stage-level lane-padding decision and Block's dispatch
    so the two can't drift (a padded stream must never reach a non-'full'
    path)."""
    return (use_pallas and variant == "v1" and not linear_sr
            and deterministic and not drop and not attn_drop
            and not is_initializing and jax.default_backend() == "tpu")


def v2_full_block_env_ok(*, use_pallas: bool, variant: str, linear_sr: bool,
                         deterministic: bool, drop: float, attn_drop: float,
                         dwconv_kernel: bool, is_initializing: bool) -> bool:
    """v2 analogue of fused_block_env_ok: may the PVT-v2 whole-stage fused
    serving path run (lane-padded stream -> SR-KV kernel + padded attention
    half + padded DWConv-MLP kernel)?  Shared by PVLT's stage padding gate
    and Block's dispatch.  Conv-SR only: the linear-SRA front end has no
    fused K/V kernel (it stays on the modular path)."""
    return (use_pallas and variant == "v2" and not linear_sr
            and dwconv_kernel and deterministic and not drop and not attn_drop
            and not is_initializing and jax.default_backend() == "tpu")


def swin_full_block_env_ok(*, use_pallas: bool, variant: str,
                           deterministic: bool, drop: float, attn_drop: float,
                           is_initializing: bool) -> bool:
    """Swin analogue of fused_block_env_ok: may the whole-block band kernel
    (ops/swin_band.py — split visual/text stage stream, lane-padded visual
    half) run?  Shared by PVLT's stage gate and Block's dispatch.
    MVLT_SWIN_FULL=0 is the measurement A/B knob (read at trace time, like
    MVLT_SWIN_PAIR).  Default ON by measurement (tools/tpu_swin_full_check.py
    2026-08-19: itm-logit rel-err 9.7e-3 bf16-tolerance parity, 3376 -> 6859
    pairs/s @ B=101 on v5e — the windowing glue WAS the swin serving gap)."""
    return (use_pallas and variant == "swin" and deterministic
            and not drop and not attn_drop and not is_initializing
            and jax.default_backend() == "tpu"
            and _os.environ.get("MVLT_SWIN_FULL", "1") != "0")


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath, used at libs/pvlt.py:135)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class PatchEmbed(nn.Module):
    """Strided-conv patch embedding + LayerNorm (libs/pvlt.py:147-172).

    Input  [B, H, W, C_in] -> tokens [B, (H/p)(W/p), embed_dim], (H/p, W/p).
    """

    patch_size: int
    embed_dim: int
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, h, w, _ = x.shape
        p = self.patch_size
        if h % p or w % p:
            raise ValueError(f"input {h}x{w} not divisible by patch size {p}")
        x = nn.Conv(
            self.embed_dim, kernel_size=(p, p), strides=(p, p),
            dtype=self.dtype, kernel_init=_trunc02, name="proj",
        )(x)
        gh, gw = h // p, w // p
        x = x.reshape(b, gh * gw, self.embed_dim)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x)
        return x, (gh, gw)


class OverlapPatchEmbed(nn.Module):
    """PVT-v2 overlapping patch embedding: conv with kernel > stride and
    'same'-style padding (k=7,s=4 for stage 1; k=3,s=2 after) + LayerNorm.
    Backbone-variant extension (BASELINE.json stretch config: PVT-v2 swap)."""

    patch_size: int        # kernel
    stride: int
    embed_dim: int
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, h, w, _ = x.shape
        pad = self.patch_size // 2
        x = nn.Conv(
            self.embed_dim, kernel_size=(self.patch_size, self.patch_size),
            strides=(self.stride, self.stride), padding=pad,
            dtype=self.dtype, kernel_init=_trunc02, name="proj",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.embed_dim)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x)
        return x, (gh, gw)


class JointSRAttention(nn.Module):
    """Joint image+text attention with SRA on the visual KV path
    (libs/pvlt.py:74-121).

    Queries come from the full [H*W + T] joint sequence.  When sr_ratio > 1
    the visual tokens are downsampled by a (sr x sr) strided conv + LN before
    the KV projection and re-concatenated with the (full-length) text tokens,
    giving an asymmetric KV of length (H/sr)(W/sr) + T.

    ``linear_sr`` swaps the strided conv for PVT-v2's linear SRA: average
    pool the visual tokens to a fixed 7x7 grid, 1x1 conv, LN, GELU — KV
    length becomes 49+T at every stage regardless of resolution.
    """

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    ln_eps: float = 1e-5
    use_pallas: bool = True
    linear_sr: bool = False
    linear_sr_pool: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: tuple, t_num: int, *,
                 deterministic: bool = True) -> jnp.ndarray:
        b, n, c = x.shape
        h, w = hw
        nh = self.num_heads
        hd = c // nh
        scale = hd ** -0.5

        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=_trunc02, name="q")(x)
        q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)

        if self.linear_sr:
            # PVT-v2 linear SRA: avg-pool visual grid to a fixed size, 1x1
            # conv, LN, GELU.  O(N) in image tokens.
            p = min(self.linear_sr_pool, h, w)
            win = (max(1, h // p), max(1, w // p))
            x_vis = x[:, : h * w, :].reshape(b, h, w, c)
            x_vis = nn.avg_pool(x_vis, window_shape=win, strides=win)
            x_vis = nn.Conv(c, kernel_size=(1, 1), dtype=self.dtype,
                            kernel_init=_trunc02, name="sr")(x_vis)
            x_vis = x_vis.reshape(b, -1, c)
            x_vis = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x_vis)
            x_vis = nn.gelu(x_vis, approximate=False)
            kv_in = jnp.concatenate([x_vis, x[:, h * w :, :]], axis=1)
        elif self.sr_ratio > 1:
            sr = self.sr_ratio
            x_vis = x[:, : h * w, :].reshape(b, h, w, c)
            x_vis = nn.Conv(c, kernel_size=(sr, sr), strides=(sr, sr),
                            dtype=self.dtype, kernel_init=_trunc02, name="sr")(x_vis)
            x_vis = x_vis.reshape(b, (h // sr) * (w // sr), c)
            x_vis = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x_vis)
            kv_in = jnp.concatenate([x_vis, x[:, h * w :, :]], axis=1)
        else:
            kv_in = x

        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                      kernel_init=_trunc02, name="kv")(kv_in)
        m = kv_in.shape[1]
        kv = kv.reshape(b, m, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        if self.attn_drop and not deterministic:
            # attention-prob dropout (libs/pvlt.py:88, 96): the probs must be
            # materialized, so this runs the explicit XLA einsum path (fp32
            # softmax like _attention_xla).  The fused Pallas kernels never
            # see a non-deterministic pass with attn_drop > 0 — Block's
            # dispatch predicates all require `not attn_drop` — and at eval
            # dropout is the identity, so every other path stays unchanged.
            logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(logits, axis=-1)
            probs = nn.Dropout(rate=self.attn_drop)(probs, deterministic=False)
            out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
                             preferred_element_type=jnp.float32).astype(q.dtype)
        else:
            out = multi_head_attention(q, k, v, scale=scale,
                                       use_pallas=self.use_pallas)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=_trunc02, name="proj")(out)
        if self.proj_drop:
            out = nn.Dropout(rate=self.proj_drop)(out, deterministic=deterministic)
        return out


class DWConvMlp(nn.Module):
    """PVT-v2 MLP: fc1 -> 3x3 depthwise conv over the *visual* tokens (text
    tokens pass through) -> GELU -> fc2.  Joint-sequence adaptation of
    PVT-v2's DWConv MLP for the v2 backbone variant."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: tuple, *, deterministic: bool = True) -> jnp.ndarray:
        h, w = hw
        b, n, _ = x.shape
        x = nn.Dense(self.hidden_features, dtype=self.dtype, kernel_init=_trunc02, name="fc1")(x)
        vis = x[:, : h * w, :].reshape(b, h, w, self.hidden_features)
        vis = nn.Conv(self.hidden_features, kernel_size=(3, 3), padding=1,
                      feature_group_count=self.hidden_features,
                      dtype=self.dtype, name="dwconv")(vis)
        x = jnp.concatenate([vis.reshape(b, h * w, -1), x[:, h * w :, :]], axis=1)
        x = nn.gelu(x, approximate=False)
        if self.drop:
            x = nn.Dropout(rate=self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=self.dtype, kernel_init=_trunc02, name="fc2")(x)
        if self.drop:
            x = nn.Dropout(rate=self.drop)(x, deterministic=deterministic)
        return x


class Mlp(nn.Module):
    """Dense -> GELU(erf) -> drop -> Dense -> drop (libs/pvlt.py:55-71)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden_features, dtype=self.dtype, kernel_init=_trunc02, name="fc1")(x)
        x = erf_gelu(x)
        if self.drop:
            x = nn.Dropout(rate=self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=self.dtype, kernel_init=_trunc02, name="fc2")(x)
        if self.drop:
            x = nn.Dropout(rate=self.drop)(x, deterministic=deterministic)
        return x


class Block(nn.Module):
    """Pre-LN transformer block with stochastic depth (libs/pvlt.py:124-144)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    sr_ratio: int
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path: float
    ln_eps: float = 1e-6
    sr_ln_eps: float = 1e-5
    use_pallas: bool = True
    variant: str = "v1"        # 'v1' | 'v2' | 'swin'
    linear_sr: bool = False
    block_attn: str = "none"   # ModelConfig.block_attn_kernel: none|mega|auto|full
    fused_mlp_train: bool = False  # ModelConfig.fused_mlp_train
    fused_attn_train: bool = False  # ModelConfig.fused_attn_train
    fused_attn_stats: bool = False  # ModelConfig.fused_attn_stats: saved-stats VJP
    kernel_gelu: str = "tanh"  # ModelConfig.kernel_gelu: tanh|erf (kernels only)
    head_pair: bool = False    # ModelConfig.head_pair_attn: hp2 stripes ('full')
    pack2_mlp: bool = False    # ModelConfig.pack_mlp_train: packed fused-MLP
    dwconv_kernel: bool = False  # ModelConfig.dwconv_mlp_kernel (v2 serving)
    pack2: bool = False        # ModelConfig.pack_stage1: stream packed 2 tokens/row
    v2_full: bool = False      # v2 whole-stage fused serving (lane-padded stream)
    swin_full: bool = False    # swin whole-block band kernel (split stream)
    window_size: int = 8       # swin variant: attention window
    shift: bool = False        # swin variant: shifted window (odd blocks)
    dtype: jnp.dtype = jnp.float32

    def _xla_kv(self, x: jnp.ndarray, hw: tuple,
                normed: Optional[jnp.ndarray] = None,
                padded_out: bool = False):
        """K/V for the fused block kernels, computed in XLA: LN1 -> SR conv
        -> LN -> KV proj (libs/pvlt.py:100-108) over the reduced sequence.

        Accepts a lane-padded stream (x wider than self.dim, zero-filled):
        LN statistics mask to the true width and the SR-conv kernel gains
        zero input-channel rows, so no lane slice of the full stream is
        materialized.  ``normed`` skips the full-stream LayerNorm when the
        previous block's kernel already emitted LN1(x) (the ln_next
        handoff, ops/block_fused.py).  Returns (k, v, kv_len): [B, H, M, hd],
        or with ``padded_out`` the fused kernel's layout
        [B, H, roundup(M,128), 128] (pads folded into the concat/einsum)."""
        p = self.variables["params"]
        h, w = hw
        b, n, d_in = x.shape
        c = self.dim
        nh = self.num_heads
        hd = c // nh
        dtype = x.dtype

        if normed is None:
            # LN1 in XLA (consumed only by the KV path)
            xf = x.astype(jnp.float32)
            if d_in > c:
                mu = xf.sum(-1, keepdims=True) / c
                var = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, xf.shape, 2) < c,
                    (xf - mu) ** 2, 0.0).sum(-1, keepdims=True) / c
                # padded lanes of `normed` are garbage; every consumer below
                # masks them via zero-padded weight rows or a tiny text slice
            else:
                mu = xf.mean(-1, keepdims=True)
                var = xf.var(-1, keepdims=True)
            g1 = jnp.zeros((d_in,), jnp.float32).at[:c].set(
                p["norm1"]["scale"].astype(jnp.float32)) if d_in > c else \
                p["norm1"]["scale"].astype(jnp.float32)
            b1 = jnp.zeros((d_in,), jnp.float32).at[:c].set(
                p["norm1"]["bias"].astype(jnp.float32)) if d_in > c else \
                p["norm1"]["bias"].astype(jnp.float32)
            normed = ((xf - mu) * jax.lax.rsqrt(var + self.ln_eps) * g1 + b1).astype(dtype)

        ap = p["attn"]
        if self.linear_sr:
            # PVT-v2 linear SRA front end (mirrors JointSRAttention's
            # linear_sr branch exactly: avg-pool to <=7x7, 1x1 conv, LN,
            # erf-GELU) — lets the v2 variant feed the fused attention-half
            # kernel.  Never reached with a lane-padded stream (the 'full'
            # stage padding is v1-only, fused_block_env_ok).
            if d_in != c:
                raise ValueError(
                    f"linear_sr K/V path expects an unpadded stream "
                    f"(got width {d_in} != dim {c}); the 'full' stage "
                    f"padding is v1-only (fused_block_env_ok)")
            pool = min(7, h, w)
            win = (max(1, h // pool), max(1, w // pool))
            vis = normed[:, : h * w, :].reshape(b, h, w, c)
            vis = nn.avg_pool(vis, window_shape=win, strides=win)
            vis = jnp.einsum(
                "bhwc,co->bhwo", vis,
                ap["sr"]["kernel"][0, 0].astype(dtype),
                preferred_element_type=jnp.float32,
            ).astype(dtype) + ap["sr"]["bias"].astype(dtype)
            vis = vis.reshape(b, -1, c)
            vf = vis.astype(jnp.float32)
            vis = ((vf - vf.mean(-1, keepdims=True))
                   * jax.lax.rsqrt(vf.var(-1, keepdims=True) + self.sr_ln_eps)
                   * ap["norm"]["scale"].astype(jnp.float32)
                   + ap["norm"]["bias"].astype(jnp.float32))
            vis = jax.nn.gelu(vis, approximate=False).astype(dtype)
            text = normed[:, h * w :, :c]
            m = vis.shape[1] + text.shape[1]
            m_pad = -(-m // 128) * 128 if padded_out else m
            parts = [vis, text]
            if m_pad != m:
                parts.append(jnp.zeros((b, m_pad - m, c), dtype))
            kv_in = jnp.concatenate(parts, axis=1)
        elif self.sr_ratio > 1:
            sr = self.sr_ratio
            vis = normed[:, : h * w, :].reshape(b, h, w, d_in)
            kern = ap["sr"]["kernel"].astype(dtype)
            if d_in > c:
                kern = jnp.pad(kern, ((0, 0), (0, 0), (0, d_in - c), (0, 0)))
            # the k=sr, stride=sr "conv" is a non-overlapping patch
            # contraction; expressed as space-to-depth + one fat GEMM it
            # runs ~MXU-shaped, where XLA's conv lowering for this kernel
            # shape measured several ms slower across the 6 SRA blocks
            vis = vis.reshape(b, h // sr, sr, w // sr, sr, d_in)
            vis = vis.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, (h // sr) * (w // sr), sr * sr * d_in)
            vis = jnp.einsum(
                "bpk,ko->bpo", vis, kern.reshape(sr * sr * d_in, c),
                preferred_element_type=jnp.float32,
            ).astype(dtype) + ap["sr"]["bias"].astype(dtype)
            vf = vis.astype(jnp.float32)
            vmu = vf.mean(-1, keepdims=True)
            vvar = vf.var(-1, keepdims=True)
            vis = ((vf - vmu) * jax.lax.rsqrt(vvar + self.sr_ln_eps)
                   * ap["norm"]["scale"].astype(jnp.float32)
                   + ap["norm"]["bias"].astype(jnp.float32)).astype(dtype)
            text = normed[:, h * w :, :c]
            m = vis.shape[1] + text.shape[1]
            m_pad = -(-m // 128) * 128 if padded_out else m
            parts = [vis, text]
            if m_pad != m:
                # fold the kernel's KV-length pad into this same concat
                parts.append(jnp.zeros((b, m_pad - m, c), dtype))
            kv_in = jnp.concatenate(parts, axis=1)
        else:
            kv_in = normed[..., :c] if d_in > c else normed
            m = kv_in.shape[1]
            m_pad = -(-m // 128) * 128 if padded_out else m
            if m_pad != m:
                kv_in = jnp.concatenate(
                    [kv_in, jnp.zeros((b, m_pad - m, c), dtype)], axis=1)

        wkv = ap["kv"]["kernel"].astype(dtype)          # [c, 2c]
        bkv = ap["kv"].get("bias")
        if padded_out:
            # emit k/v directly in the fused kernel's padded layout
            # [B, H, M_pad, 128]: zero-padded per-head weight columns skip
            # the reshape/transpose/pad glue ops entirely
            hd_pad = 128
            wk = jnp.zeros((c, nh, hd_pad), dtype).at[:, :, :hd].set(
                wkv[:, :c].reshape(c, nh, hd))
            wv = jnp.zeros((c, nh, hd_pad), dtype).at[:, :, :hd].set(
                wkv[:, c:].reshape(c, nh, hd))
            k = jnp.einsum("bmc,chd->bhmd", kv_in, wk,
                           preferred_element_type=jnp.float32)
            v = jnp.einsum("bmc,chd->bhmd", kv_in, wv,
                           preferred_element_type=jnp.float32)
            if bkv is not None:
                bk = jnp.zeros((nh, hd_pad), jnp.float32).at[:, :hd].set(
                    bkv[:c].astype(jnp.float32).reshape(nh, hd))
                bv = jnp.zeros((nh, hd_pad), jnp.float32).at[:, :hd].set(
                    bkv[c:].astype(jnp.float32).reshape(nh, hd))
                # NB: the bias lands on the zero-padded KV-LENGTH rows too
                # (rows >= m are bias-valued, not zero) — consumers MUST mask
                # logits at col >= kv_len; never feed this layout to a kernel
                # with kv_len=None
                k = k + bk[None, :, None, :]
                v = v + bv[None, :, None, :]
            return k.astype(dtype), v.astype(dtype), m

        kv = jnp.einsum("bmc,ck->bmk", kv_in, wkv,
                        preferred_element_type=jnp.float32)
        if bkv is not None:
            kv = kv + bkv.astype(jnp.float32)
        kv = kv.astype(dtype).reshape(b, m, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        return kv[0], kv[1], m

    def _fused_attention_half(self, x: jnp.ndarray, hw: tuple,
                              row_scale: Optional[jnp.ndarray] = None,
                              save_stats: bool = False) -> jnp.ndarray:
        """LN1 -> Q-proj -> attention -> out-proj -> +res as one Pallas
        megakernel (mvlt_tpu/ops/block_attention.py).  Differentiable (custom
        VJP) — used by the 'mega' inference mode AND the training path, where
        ``row_scale`` folds the per-sample DropPath and ``save_stats``
        selects the saved-statistics backward (ModelConfig.fused_attn_stats)."""
        from mvlt_tpu.ops.block_attention import fused_block_attention

        p = self.variables["params"]
        c = self.dim
        nh = self.num_heads
        k, v, _ = self._xla_kv(x, hw)
        ap = p["attn"]
        return fused_block_attention(
            x, k, v,
            p["norm1"]["scale"], p["norm1"]["bias"],
            ap["q"]["kernel"], ap["q"].get("bias", jnp.zeros((c,), jnp.float32)),
            ap["proj"]["kernel"], ap["proj"]["bias"],
            row_scale,
            scale=(c // nh) ** -0.5, eps=self.ln_eps, num_heads=nh,
            save_stats=save_stats,
        )

    def _drop_path_row_scale(self, x: jnp.ndarray) -> Optional[jnp.ndarray]:
        """Per-sample stochastic-depth mask as a kernel row scale (same
        semantics as DropPath; drawn from Block-scope make_rng('dropout') —
        see the kernel_gelu/fused_mlp_train RNG-stream note in config.py)."""
        if self.drop_path == 0.0:
            return None
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (x.shape[0],))
        return mask.astype(jnp.float32) / keep

    def _sr_kv_p2(self, x: jnp.ndarray, hw: tuple, t_num: int):
        """_sr_kv on a PACKED [B, (h*w+t)/2, 128] stream
        (ops/block_packed.py): same fused K/V path, packed LN1 + packed
        space-to-depth staging; K/V rows come back in the standard layout
        (text tail even-tokens-first — softmax-invariant)."""
        from mvlt_tpu.ops.block_packed import fused_ln_sr_kv_p2

        p = self.variables["params"]
        ap = p["attn"]
        return fused_ln_sr_kv_p2(
            x, p["norm1"]["scale"], p["norm1"]["bias"],
            ap["sr"]["kernel"], ap["sr"]["bias"],
            ap["norm"]["scale"], ap["norm"]["bias"],
            ap["kv"]["kernel"], ap["kv"].get("bias"),
            dim=self.dim, hw=hw, t=t_num, sr=self.sr_ratio,
            heads=self.num_heads, eps1=self.ln_eps, eps_sr=self.sr_ln_eps,
        )

    def _fused_full_block_p2(self, x: jnp.ndarray, hw: tuple, t_num: int):
        """The whole block on the packed stage-1 stream: packed SR-KV front
        end + packed whole-block megakernel (ops/block_packed.py) — half the
        stream HBM bytes and half the per-element VPU work of the
        lane-padded path at dim=64."""
        from mvlt_tpu.ops.block_packed import fused_block_p2

        p = self.variables["params"]
        c = self.dim
        k, v, kv_len = self._sr_kv_p2(x, hw, t_num)
        ap = p["attn"]
        mp = p["mlp"]
        return fused_block_p2(
            x, k, v,
            p["norm1"]["scale"], p["norm1"]["bias"],
            ap["q"]["kernel"], ap["q"].get("bias", jnp.zeros((c,), jnp.float32)),
            ap["proj"]["kernel"], ap["proj"]["bias"],
            p["norm2"]["scale"], p["norm2"]["bias"],
            mp["fc1"]["kernel"], mp["fc1"]["bias"],
            mp["fc2"]["kernel"], mp["fc2"]["bias"],
            scale=(c // self.num_heads) ** -0.5, eps1=self.ln_eps,
            eps2=self.ln_eps, dim=c, kv_len=kv_len, gelu=self.kernel_gelu,
        )

    def _sr_kv(self, x: jnp.ndarray, hw: tuple, head_pair: bool = False):
        """K/V for the whole-block kernel with the ENTIRE K/V path fused into
        one Pallas kernel (mvlt_tpu/ops/sr_kv.py): LN1 over the joint stream,
        space-to-depth + SR contraction + SR-LN (sr > 1), text re-concat, and
        the per-head-striped K/V projections — one read of the residual
        stream, zero XLA glue (the unfused chain cost 1.08 ms/block at
        stage-1 shapes, tools/probes/bench_kv_glue.py).  Returns (k, v,
        kv_len) in the kernel's padded layout, like
        _xla_kv(padded_out=True)."""
        from mvlt_tpu.ops.sr_kv import fused_ln_sr_kv

        p = self.variables["params"]
        ap = p["attn"]
        h, w = hw
        sr1 = self.sr_ratio == 1
        return fused_ln_sr_kv(
            x, p["norm1"]["scale"], p["norm1"]["bias"],
            None if sr1 else ap["sr"]["kernel"],
            None if sr1 else ap["sr"]["bias"],
            None if sr1 else ap["norm"]["scale"],
            None if sr1 else ap["norm"]["bias"],
            ap["kv"]["kernel"], ap["kv"].get("bias"),
            dim=self.dim, hw=hw, t=x.shape[1] - h * w, sr=self.sr_ratio,
            heads=self.num_heads, eps1=self.ln_eps, eps_sr=self.sr_ln_eps,
            head_pair=head_pair,
        )

    def _fused_full_block(self, x: jnp.ndarray, hw: tuple,
                          kv_normed: Optional[jnp.ndarray] = None,
                          ln_next: Optional[tuple] = None):
        """Inference path: the WHOLE block (both halves) as one Pallas
        megakernel (mvlt_tpu/ops/block_fused.py) — one read + one write of
        the residual stream per block.  Accepts and returns a lane-padded
        stream (PVLT pads once per stage; see the stage loop).

        The K/V path runs entirely inside the fused SR-KV kernel (_sr_kv) at
        every sr ratio, so no handoff is needed; kv_normed/ln_next remain
        accepted for the kernel's standalone ln-handoff feature (unused by
        the stage loop since the SR-KV fusion) — when ln_next is given the
        kernel still returns (out, LN_next(out))."""
        from mvlt_tpu.ops.block_fused import fused_block

        p = self.variables["params"]
        c = self.dim
        nh = self.num_heads
        del kv_normed  # the SR-KV kernel reads the raw stream
        # hp2: two 64-wide heads per 128-lane stripe.  The SR-KV producer
        # emits the paired K/V layout directly (same GEMMs, re-striped
        # weights) — XLA-side pairing copies measured a 10% serving LOSS
        # (tools/tpu_hp2_check.py); single-head stages ride pack2 instead.
        hp2 = self.head_pair and nh >= 2 and (c // nh) <= 64
        k, v, kv_len = self._sr_kv(x, hw, head_pair=hp2)
        ap = p["attn"]
        mp = p["mlp"]
        return fused_block(
            x, k, v,
            p["norm1"]["scale"], p["norm1"]["bias"],
            ap["q"]["kernel"], ap["q"].get("bias", jnp.zeros((c,), jnp.float32)),
            ap["proj"]["kernel"], ap["proj"]["bias"],
            p["norm2"]["scale"], p["norm2"]["bias"],
            mp["fc1"]["kernel"], mp["fc1"]["bias"],
            mp["fc2"]["kernel"], mp["fc2"]["bias"],
            ln_next[:2] if ln_next is not None else None,
            scale=(c // nh) ** -0.5, eps1=self.ln_eps, eps2=self.ln_eps,
            num_heads=nh, dim=c, kv_len=kv_len,
            eps_next=ln_next[2] if ln_next is not None else None,
            gelu=self.kernel_gelu,
            head_pair=hp2, kv_paired=hp2,
        )

    def _v2_fused_block(self, x: jnp.ndarray, hw: tuple, t_num: int):
        """PVT-v2 serving block on a lane-padded stage stream: fused SR-KV
        (ops/sr_kv.py — v2's conv-SR front end is identical to v1's,
        libs/pvlt.py:100-108) -> padded attention half
        (ops/block_attention.py:fused_block_attention_padded) -> padded
        whole-image DWConv-MLP kernel (ops/dwconv_mlp.py).  Zero XLA glue
        and zero pad/unpad copies of the full stream per block — the copies
        were what made the per-block 'mega' form throughput-neutral for v2."""
        from mvlt_tpu.ops.block_attention import fused_block_attention_padded
        from mvlt_tpu.ops.dwconv_mlp import fused_dwconv_mlp

        p = self.variables["params"]
        c = self.dim
        k, v, kv_len = self._sr_kv(x, hw)
        ap = p["attn"]
        x = fused_block_attention_padded(
            x, k, v,
            p["norm1"]["scale"], p["norm1"]["bias"],
            ap["q"]["kernel"], ap["q"].get("bias", jnp.zeros((c,), jnp.float32)),
            ap["proj"]["kernel"], ap["proj"]["bias"],
            scale=(c // self.num_heads) ** -0.5, eps=self.ln_eps,
            num_heads=self.num_heads, dim=c, kv_len=kv_len,
        )
        mp = p["mlp"]
        return fused_dwconv_mlp(
            x, p["norm2"]["scale"], p["norm2"]["bias"],
            mp["fc1"]["kernel"], mp["fc1"]["bias"],
            mp["dwconv"]["kernel"], mp["dwconv"]["bias"],
            mp["fc2"]["kernel"], mp["fc2"]["bias"],
            hw=hw, eps=self.ln_eps, gelu=self.kernel_gelu, dim=c,
        )

    def _v2_fused_block_p2(self, x: jnp.ndarray, hw: tuple, t_num: int):
        """_v2_fused_block on the PACKED stage-1 stream: packed SR-KV front
        end (v2's conv-SR == v1's) -> packed attention half
        (ops/block_packed.py:fused_attention_p2) -> packed whole-image
        DWConv-MLP (ops/dwconv_mlp.py:fused_dwconv_mlp_p2, whose 3x3 halo
        crosses the packed lane halves in VMEM)."""
        from mvlt_tpu.ops.block_packed import fused_attention_p2
        from mvlt_tpu.ops.dwconv_mlp import fused_dwconv_mlp_p2

        p = self.variables["params"]
        c = self.dim
        k, v, kv_len = self._sr_kv_p2(x, hw, t_num)
        ap = p["attn"]
        x = fused_attention_p2(
            x, k, v,
            p["norm1"]["scale"], p["norm1"]["bias"],
            ap["q"]["kernel"], ap["q"].get("bias", jnp.zeros((c,), jnp.float32)),
            ap["proj"]["kernel"], ap["proj"]["bias"],
            scale=(c // self.num_heads) ** -0.5, eps=self.ln_eps,
            dim=c, kv_len=kv_len,
        )
        mp = p["mlp"]
        return fused_dwconv_mlp_p2(
            x, p["norm2"]["scale"], p["norm2"]["bias"],
            mp["fc1"]["kernel"], mp["fc1"]["bias"],
            mp["dwconv"]["kernel"], mp["dwconv"]["bias"],
            mp["fc2"]["kernel"], mp["fc2"]["bias"],
            hw=hw, eps=self.ln_eps, gelu=self.kernel_gelu, dim=c,
        )

    def _swin_fused_block(self, xv: jnp.ndarray, xt: jnp.ndarray, hw: tuple,
                          t_num: int):
        """Swin serving block on the SPLIT stage stream: the visual half
        runs as the whole-block band kernel (ops/swin_band.py — window
        partition folded into the additive mask, zero windowing glue in
        HBM; the vertical half of the cyclic shift is the roll/unroll pair
        here); the text-query half (pooled visual KV + text KV,
        models/swin.py:174-188) runs in XLA on the [B, T, C] text stream,
        consuming the kernel's x-pooled LN1 output.  Returns (xv', xt')."""
        from mvlt_tpu.ops.kernel_math import round_up as _round_up
        from mvlt_tpu.ops.swin_band import (fused_swin_band_block,
                                            swin_band_add_tables)

        p = self.variables["params"]
        ap = p["attn"]
        c = self.dim
        nh = self.num_heads
        hd = c // nh
        h, w = hw
        b = xv.shape[0]
        ws = min(self.window_size, h, w)
        s = ws // 2 if self.shift else 0
        from mvlt_tpu.models.swin import TEXT_POOL
        win = max(1, h // TEXT_POOL)   # SwinJointAttention.text_pool
        dtype = xt.dtype
        scale = hd ** -0.5

        wq = ap["q"]["kernel"]
        bq = ap["q"].get("bias", jnp.zeros((c,), jnp.float32))
        wkv = ap["kv"]["kernel"]
        bkv = ap["kv"].get("bias", jnp.zeros((2 * c,), jnp.float32))
        wk_, wv_ = wkv[:, :c], wkv[:, c:]
        bk_, bv_ = bkv[:c], bkv[c:]
        wp_ = ap["proj"]["kernel"]
        bp_ = ap["proj"]["bias"]

        def ln(z, prm):
            zf = z.astype(jnp.float32)
            mu = zf.mean(-1, keepdims=True)
            var = zf.var(-1, keepdims=True)
            return ((zf - mu) * jax.lax.rsqrt(var + self.ln_eps)
                    * prm["scale"].astype(jnp.float32)
                    + prm["bias"].astype(jnp.float32)).astype(dtype)

        def dense(z, wm, bm):
            return (jnp.einsum("btc,co->bto", z, wm.astype(dtype),
                               preferred_element_type=jnp.float32)
                    + bm.astype(jnp.float32)).astype(dtype)

        # --- text-side LN1 + projections (XLA; [B, T, c] only) ---
        ln_t = ln(xt, p["norm1"])
        q_t = dense(ln_t, wq, bq)
        k_t = dense(ln_t, wk_, bk_)
        v_t = dense(ln_t, wv_, bv_)

        t_pad = _round_up(t_num, 16)

        def stripe_seq(a):             # [B, T, c] -> [B, T_pad, nh*128]
            z = jnp.zeros((b, t_pad, nh, 128), dtype)
            z = z.at[:, :t_num, :, :hd].set(a.reshape(b, t_num, nh, hd))
            return z.reshape(b, t_pad, nh * 128)

        add = swin_band_add_tables(ap["rel_pos_bias"], h=h, w=w, ws=ws,
                                   shift=bool(s), t_num=t_num, t_pad=t_pad)
        xin = jnp.roll(xv, -s * w, axis=1) if s else xv
        mp = p["mlp"]
        out_vis, pooled = fused_swin_band_block(
            xin, stripe_seq(k_t), stripe_seq(v_t), add,
            p["norm1"]["scale"], p["norm1"]["bias"],
            wq, bq, wk_, bk_, wv_, bv_, wp_, bp_,
            p["norm2"]["scale"], p["norm2"]["bias"],
            mp["fc1"]["kernel"], mp["fc1"]["bias"],
            mp["fc2"]["kernel"], mp["fc2"]["bias"],
            hw=hw, ws=ws, win=win, dim=c, num_heads=nh, scale=scale,
            eps1=self.ln_eps, eps2=self.ln_eps, gelu=self.kernel_gelu)
        if s:
            out_vis = jnp.roll(out_vis, s * w, axis=1)

        # --- text queries: pooled visual KV + text KV (swin.py:174-188);
        # pool(dense(ln)) == dense(pool(ln)) exactly (affine, mean weights
        # sum to 1), so the kernel's pooled-LN rows feed the projections ---
        pooled = pooled[..., :c].reshape(b, h, w // win, c)
        if s:
            pooled = jnp.roll(pooled, s, axis=1)   # undo the vertical roll
        pooled = pooled.reshape(b, h // win, win, w // win, c).mean(axis=2)
        pooled = pooled.reshape(b, -1, c).astype(dtype)
        k_pool = dense(pooled, wk_, bk_)
        v_pool = dense(pooled, wv_, bv_)

        def heads_of(z):               # [B, L, c] -> [B, nh, L, hd]
            return jnp.moveaxis(z.reshape(z.shape[:-1] + (nh, hd)), -2, -3)

        k_cat = jnp.concatenate([heads_of(k_pool), heads_of(k_t)], axis=-2)
        v_cat = jnp.concatenate([heads_of(v_pool), heads_of(v_t)], axis=-2)
        t_logits = jnp.einsum("bhqd,bhkd->bhqk", heads_of(q_t), k_cat,
                              preferred_element_type=jnp.float32) * scale
        t_probs = jax.nn.softmax(t_logits, axis=-1).astype(dtype)
        out_txt = jnp.einsum("bhqk,bhkd->bhqd", t_probs, v_cat,
                             preferred_element_type=jnp.float32).astype(dtype)
        out_txt = jnp.moveaxis(out_txt, 1, 2).reshape(b, t_num, c)
        xt = xt + dense(out_txt, wp_, bp_)

        # --- text MLP half: exact erf GELU, matching the unfused Swin path
        # (Mlp, above) bit-for-bit.  This half is XLA-side on a tiny
        # [B, T, C] tensor, so the VPU-divide cost that justifies
        # kernel_gelu='tanh' inside the band kernel does not apply here
        # (VERDICT r4 weak #4; reference GELU form: libs/pvlt.py:58) ---
        hid = dense(ln(xt, p["norm2"]), mp["fc1"]["kernel"], mp["fc1"]["bias"])
        hid = erf_gelu(hid)
        xt = xt + dense(hid, mp["fc2"]["kernel"], mp["fc2"]["bias"])
        return out_vis, xt

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: tuple, t_num: int,
                 deterministic: bool = True,
                 kv_normed: Optional[jnp.ndarray] = None,
                 ln_next: Optional[tuple] = None):
        # NOTE: deterministic is positional (not keyword-only) so nn.remat
        # can mark it static (static_argnums in PVLT's stage loop).
        # kv_normed / ln_next belong to the 'full'-kernel LN handoff
        # (ops/block_fused.py) and are only passed on that path.

        # Swin whole-block band-kernel serving: the stage loop hands this
        # path a SPLIT (visual lane-padded, text) stream tuple — PVLT's
        # swin_full_stage gate and this dispatch share swin_full_block_env_ok
        if self.swin_full and isinstance(x, tuple):
            xv, xt = x
            return self._swin_fused_block(xv, xt, hw, t_num)

        # Megakernel A/B: the modular path (Pallas fused-attention +
        # fused-LN-MLP, XLA projections) measured slightly faster than the
        # full block-attention megakernel on v5e (3379 vs 3333 pairs/s), so
        # 'none' is the default (ModelConfig.block_attn_kernel).
        fused_env_ok = fused_block_env_ok(
            use_pallas=self.use_pallas, variant=self.variant,
            linear_sr=self.linear_sr, deterministic=deterministic,
            drop=self.drop, attn_drop=self.attn_drop,
            is_initializing=self.is_initializing(),
        )
        if fused_env_ok and self.block_attn == "full":
            if self.pack2:
                # packed stage-1 stream: [B, (h*w+t)/2, 128], two 64-dim
                # tokens per row (PVLT reshapes once per stage)
                return self._fused_full_block_p2(x, hw, t_num)
            # whole-block megakernel (possibly on a lane-padded stream —
            # PVLT pads once per stage when this path is active)
            return self._fused_full_block(x, hw, kv_normed=kv_normed,
                                          ln_next=ln_next)
        if self.v2_full and v2_full_block_env_ok(
                use_pallas=self.use_pallas, variant=self.variant,
                linear_sr=self.linear_sr, deterministic=deterministic,
                drop=self.drop, attn_drop=self.attn_drop,
                dwconv_kernel=self.dwconv_kernel,
                is_initializing=self.is_initializing()):
            if self.pack2:
                # packed stage-1 stream (same layout as the v1 'full' path)
                return self._v2_fused_block_p2(x, hw, t_num)
            # v2 whole-stage fused serving on the lane-padded stream (PVLT
            # pads once per stage when it sets v2_full)
            return self._v2_fused_block(x, hw, t_num)
        if x.shape[-1] != self.dim:
            raise ValueError(
                f"lane-padded stream (width {x.shape[-1]} != dim {self.dim}) "
                f"reached a non-'full' block path — the PVLT stage gate and "
                f"Block dispatch disagree (fused_block_env_ok)")
        want_mega = self.block_attn == "mega" or (
            self.block_attn == "auto" and x.shape[1] >= 4000)
        # training path: the same fused attention half-block, via its custom
        # VJP (backward is a Pallas kernel too); DropPath folds in as a
        # per-sample row scale exactly like the fused MLP
        fused_attn_train_ok = (
            self.fused_attn_train and not deterministic
            and self.use_pallas and self.variant == "v1"
            and not self.drop and not self.attn_drop
            and not self.is_initializing() and jax.default_backend() == "tpu"
        )
        # PVT-v2 inference can ride the same fused attention-half kernel (its
        # attention math is identical to v1's; only the K/V front end
        # differs — _xla_kv's linear_sr branch).  The DWConv MLP half stays
        # in XLA (the 3x3 depthwise needs spatial halos a row-tiled stream
        # kernel doesn't have).  OPT-IN via block_attn='mega' only: measured
        # throughput-neutral on v5e (2125 vs 2150 pairs/s — the stream
        # pad/unpad copies offset the kernel win while the DWConv MLP
        # dominates), and the fused-path XLA compile at v2 shapes is
        # pathologically slow over the tunneled backend, so the default
        # ('full'/'auto') keeps v2 on the modular kernel path.
        v2_mega_ok = (
            self.variant == "v2" and self.use_pallas and deterministic
            and not self.drop and not self.attn_drop
            and self.block_attn == "mega"
            and not self.is_initializing() and jax.default_backend() == "tpu"
        )
        if fused_env_ok and want_mega:
            x = self._fused_attention_half(x, hw)
        elif v2_mega_ok:
            x = self._fused_attention_half(x, hw)
        elif fused_attn_train_ok:
            x = self._fused_attention_half(x, hw,
                                           row_scale=self._drop_path_row_scale(x),
                                           save_stats=self.fused_attn_stats)
        elif self.variant == "swin":
            from mvlt_tpu.models.swin import SwinJointAttention

            attn_out = SwinJointAttention(
                self.dim, self.num_heads, window_size=self.window_size,
                shift=self.shift, qkv_bias=self.qkv_bias,
                proj_drop=self.drop, use_pallas=self.use_pallas,
                dtype=self.dtype, name="attn",
            )(
                nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x),
                hw, t_num, deterministic=deterministic,
            )
            x = x + DropPath(self.drop_path, name="drop_path1")(attn_out, deterministic=deterministic)
        else:
            attn_out = JointSRAttention(
                self.dim, self.num_heads, sr_ratio=self.sr_ratio,
                qkv_bias=self.qkv_bias, attn_drop=self.attn_drop,
                proj_drop=self.drop, ln_eps=self.sr_ln_eps,
                use_pallas=self.use_pallas, linear_sr=self.linear_sr,
                dtype=self.dtype, name="attn",
            )(
                nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x),
                hw, t_num, deterministic=deterministic,
            )
            x = x + DropPath(self.drop_path, name="drop_path1")(attn_out, deterministic=deterministic)

        # Fused LN->MLP->residual Pallas kernel (mvlt_tpu/ops/fused_mlp.py):
        # keeps the ratio-8 hidden activation in VMEM.  Inference uses it
        # unconditionally; training opts in via ModelConfig.fused_mlp_train
        # (the custom-VJP backward benched behind XLA autodiff under the
        # old methodology — 690 vs 711 pairs/s — and is re-gated by the
        # honest harness via tools/bench_train_fusedmlp.py).  The unfused
        # path always runs at init (creates the params).
        # v1 and swin share the standard Mlp; v2's DWConv MLP cannot fuse
        use_fused = (
            self.use_pallas and self.variant in ("v1", "swin")
            and (deterministic or self.fused_mlp_train)
            and not self.drop and not self.is_initializing()
            and jax.default_backend() == "tpu"
        )
        if use_fused:
            from mvlt_tpu.ops.fused_mlp import fused_ln_mlp

            if deterministic or self.drop_path == 0.0:
                # DropPath inactive: no per-row scale needed
                row_scale = None
            else:
                # fold per-sample stochastic depth into the kernel as a
                # row scale (mask/keep), matching DropPath semantics
                keep = 1.0 - self.drop_path
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (x.shape[0],))
                row_scale = mask.astype(jnp.float32) / keep
            p = self.variables["params"]
            return fused_ln_mlp(
                x,
                p["norm2"]["scale"], p["norm2"]["bias"],
                p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
                p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
                row_scale,
                eps=self.ln_eps, gelu=self.kernel_gelu,
                # packed two-tokens-per-row layout at dim=64 (stage 1):
                # no 64->128 pad/slice copies, half the kernel stream bytes
                # in BOTH the forward and the custom-VJP backward
                pack2=self.pack2_mlp,
            )

        # v2 serving: the whole-image fused DWConv-MLP kernel
        # (ops/dwconv_mlp.py) — LN2 + fc1 + in-VMEM depthwise 3x3 + GELU +
        # fc2 + residual in one pass; the ratio-8 hidden never touches HBM.
        h_, w_ = hw
        v2_mlp_fused = (
            self.variant == "v2" and self.dwconv_kernel and self.use_pallas
            and deterministic and not self.drop
            and h_ % 8 == 0 and w_ % 8 == 0 and x.shape[1] % 8 == 0
            and not self.is_initializing() and jax.default_backend() == "tpu"
        )
        if v2_mlp_fused:
            from mvlt_tpu.ops.dwconv_mlp import fused_dwconv_mlp

            p = self.variables["params"]
            return fused_dwconv_mlp(
                x, p["norm2"]["scale"], p["norm2"]["bias"],
                p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
                p["mlp"]["dwconv"]["kernel"], p["mlp"]["dwconv"]["bias"],
                p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
                hw=hw, eps=self.ln_eps, gelu=self.kernel_gelu,
            )

        normed = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        if self.variant == "v2":
            mlp_out = DWConvMlp(
                int(self.dim * self.mlp_ratio), self.dim, drop=self.drop,
                dtype=self.dtype, name="mlp",
            )(normed, hw, deterministic=deterministic)
        else:
            mlp_out = Mlp(
                int(self.dim * self.mlp_ratio), self.dim, drop=self.drop,
                dtype=self.dtype, name="mlp",
            )(normed, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(mlp_out, deterministic=deterministic)
        return x


def _resize_pos_embed(pos: jnp.ndarray, native_hw: tuple, hw: tuple) -> jnp.ndarray:
    """Bilinearly resize a [1, gh*gw, C] positional table to a new grid
    (libs/pvlt.py:291-297; align_corners=False, no antialias)."""
    if native_hw == hw:
        return pos
    gh, gw = native_hw
    h, w = hw
    c = pos.shape[-1]
    pos2d = pos.reshape(1, gh, gw, c)
    pos2d = jax.image.resize(pos2d, (1, h, w, c), method="bilinear", antialias=False)
    return pos2d.reshape(1, h * w, c)


class PVLT(nn.Module):
    """Pyramid Vision-Language Transformer with task heads.

    Call: ``model(images_nhwc, input_ids)`` -> dict of logits
    (mlm/itm/sup_cls/sub_cls/t2i; disabled heads yield None), matching the
    reference forward contract (libs/pvlt.py:358-401) with NHWC t2i output.
    """

    cfg: ModelConfig
    axis_name: Optional[str] = None   # mesh axis for cross-replica BatchNorm
    # sequence parallelism (SURVEY.md §2c stretch): when set, the joint
    # [B, N, C] token stream is sharded over the mesh's model axis between
    # blocks — Q rows are independent given the replicated SRA KV, so long
    # visual sequences (high-res inputs) split across chips.
    sp_mesh: Optional[Any] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, input_ids: jnp.ndarray, *,
                 train: bool = False,
                 mlm_row_idx: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
        cfg = self.cfg
        det = not train
        dtype = jnp.dtype(cfg.compute_dtype)
        b = images.shape[0]
        t_num = cfg.num_text_tokens

        if images.shape[-1] != cfg.in_chans and images.shape[1] == cfg.in_chans:
            images = images.transpose(0, 2, 3, 1)  # accept NCHW for reference API compat

        # --- text embedding (once, before stage 1; libs/pvlt.py:326) ---
        y = BertEmbeddings(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.token_hidden_size,
            max_position_embeddings=cfg.max_position_embeddings,
            type_vocab_size=cfg.type_vocab_size,
            ln_eps=cfg.bert_ln_eps,
            dropout_rate=cfg.bert_dropout,
            dtype=dtype,
            name="text_embeddings",
        )(input_ids, deterministic=det)

        # stochastic-depth decay rule: linspace over total depth (libs/pvlt.py:197)
        total_depth = sum(cfg.depths)
        dpr = np.linspace(0.0, cfg.drop_path_rate, total_depth)

        x = images.astype(dtype)
        img_feats, text_feats = [], []
        cur = 0
        # Whole-block megakernel path (ModelConfig.block_attn_kernel='full'):
        # lane-pad the joint stream once per stage so every Block's Pallas
        # call runs pad-free (each jnp.pad/slice around a pallas_call
        # materializes the full stream — at stage 1 the 64->128 lane pad
        # would otherwise cost more HBM traffic than the kernel body).
        full_kernel = cfg.block_attn_kernel == "full" and fused_block_env_ok(
            use_pallas=cfg.use_pallas_attention, variant=cfg.variant,
            linear_sr=cfg.linear_sr, deterministic=det,
            drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
            is_initializing=self.is_initializing(),
        )
        # PVT-v2 whole-stage fused serving (same stage-level lane-padding
        # idea; per-stage shape checks added below once h/w are known)
        v2_full_env = cfg.block_attn_kernel == "full" and v2_full_block_env_ok(
            use_pallas=cfg.use_pallas_attention, variant=cfg.variant,
            linear_sr=cfg.linear_sr, deterministic=det,
            drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
            dwconv_kernel=cfg.dwconv_mlp_kernel,
            is_initializing=self.is_initializing(),
        )
        # Swin whole-block band-kernel serving (ops/swin_band.py): the stage
        # keeps the stream SPLIT (lane-padded visual half, text half) so the
        # per-block windowing glue and the visual/text concats vanish
        swin_full_env = cfg.block_attn_kernel == "full" and swin_full_block_env_ok(
            use_pallas=cfg.use_pallas_attention, variant=cfg.variant,
            deterministic=det, drop=cfg.drop_rate,
            attn_drop=cfg.attn_drop_rate,
            is_initializing=self.is_initializing(),
        )
        for i in range(cfg.num_stages):
            dim = cfg.embed_dims[i]
            patch = cfg.patch_size if i == 0 else 2
            if cfg.variant == "v2":
                # PVT-v2 overlapping patch embed: k=7,s=4 then k=3,s=2
                kernel = 7 if i == 0 else 3
                x, (h, w) = OverlapPatchEmbed(
                    patch_size=kernel, stride=patch, embed_dim=dim,
                    ln_eps=cfg.other_ln_eps, dtype=dtype, name=f"patch_embed{i + 1}",
                )(x)
            else:
                x, (h, w) = PatchEmbed(
                    patch_size=patch, embed_dim=dim, ln_eps=cfg.other_ln_eps,
                    dtype=dtype, name=f"patch_embed{i + 1}",
                )(x)

            # per-stage text re-projection: Dense + LN (libs/pvlt.py:205-208)
            y = nn.Dense(dim, dtype=dtype, kernel_init=_trunc02, name=f"text_embed{i + 1}_dense")(y)
            y = nn.LayerNorm(epsilon=cfg.other_ln_eps, dtype=dtype, name=f"text_embed{i + 1}_ln")(y)

            native_g = cfg.img_size // (cfg.patch_size * (2 ** i))
            num_patches = native_g * native_g
            pos_slots = num_patches + 1 if i == cfg.num_stages - 1 else num_patches
            pos_embed = self.param(
                f"pos_embed{i + 1}", _trunc02, (1, pos_slots, dim), jnp.float32,
            )
            text_pos_embed = self.param(
                f"text_pos_embed{i + 1}", _trunc02, (1, t_num, dim), jnp.float32,
            )
            if i == cfg.num_stages - 1:
                pos_embed = pos_embed[:, 1:]  # drop PVT cls slot (libs/pvlt.py:341-342)
            pos_embed = _resize_pos_embed(pos_embed.astype(dtype), (native_g, native_g), (h, w))

            d_pad = -(-dim // 128) * 128
            # swin whole-block band kernel: stream stays SPLIT this stage.
            # Shape gates: even window (the shift is ws//2), dividing grids,
            # a dividing text-pool window, and 16-sublane-aligned band /
            # pooled row counts (bf16 Mosaic alignment)
            ws_i = min(cfg.window_size, h, w)
            if swin_full_env:
                from mvlt_tpu.models.swin import TEXT_POOL
                from mvlt_tpu.ops.swin_band import swin_band_vmem_ok
                win_i = max(1, h // TEXT_POOL)
                swin_full_stage = (
                    self.sp_mesh is None
                    and ws_i % 2 == 0 and h % ws_i == 0 and w % ws_i == 0
                    and h % win_i == 0 and w % win_i == 0
                    and (ws_i * w) % 16 == 0
                    and (ws_i * (w // win_i)) % 16 == 0
                    # VMEM pre-flight (shared with the kernel's own check):
                    # oversized shapes fall back instead of raising (ADVICE r4)
                    and swin_band_vmem_ok(
                        hw=(h, w), ws=ws_i, win=win_i, dim=dim,
                        num_heads=cfg.num_heads[i],
                        hidden=int(dim * cfg.mlp_ratios[i]), t_num=t_num,
                        itemsize=jnp.dtype(dtype).itemsize))
            else:
                swin_full_stage = False
            if swin_full_stage:
                xv = x + pos_embed
                if d_pad != dim:
                    xv = jnp.pad(xv, ((0, 0), (0, 0), (0, d_pad - dim)))
                x = (xv, y + text_pos_embed.astype(dtype))
            else:
                x = jnp.concatenate(
                    [x + pos_embed, y + text_pos_embed.astype(dtype)], axis=1)
            if cfg.drop_rate and not swin_full_stage:
                x = nn.Dropout(rate=cfg.drop_rate)(x, deterministic=det)
            if self.sp_mesh is not None and not swin_full_stage:
                from mvlt_tpu.parallel.sharding import sequence_sharding_constraint

                x = sequence_sharding_constraint(x, self.sp_mesh)
            # pack2 (ModelConfig.pack_stage1): at dim=64 stages, instead of
            # lane-padding 64->128 (2x HBM/VPU on the whole stream), pack two
            # tokens per 128-lane row — a free contiguous reshape; the
            # packed kernels (ops/block_packed.py) need heads==1 and even
            # sr/w/t so pairs never straddle an s2d group or the text
            # boundary (all true at every shipped v1 stage 1)
            # h/w divisibility by sr is required by the packed kernel's s2d
            # reshape (same assumption as the unpacked SR-KV path — made
            # explicit here so a non-divisible input falls back instead of
            # dying in a generic reshape trace error); sequence sharding is
            # excluded because the pack reshape halves the (sharded)
            # sequence axis mid-stage — untested under sp until measured.
            # v2 whole-stage fused path: needs the whole-image DWConv
            # kernel's 8-aligned grid and the SR-KV kernel's s2d
            # divisibility (sr==1 at stage 4 skips the s2d entirely)
            sr_i = cfg.sr_ratios[i]
            v2_full_stage = (v2_full_env and h % 8 == 0 and w % 8 == 0
                             and (h * w + t_num) % 8 == 0
                             and (sr_i == 1 or (h % sr_i == 0 and w % sr_i == 0)))
            pack2_env = (cfg.pack_stage1 and dim * 2 == 128
                         and self.sp_mesh is None
                         and cfg.num_heads[i] == 1 and sr_i % 2 == 0
                         and sr_i > 1 and w % 2 == 0
                         and h % sr_i == 0 and w % sr_i == 0
                         and t_num >= 2 and t_num % 2 == 0)
            # the v2 packed path additionally needs the packed DWConv-MLP
            # kernel's 8-aligned half-grid ([h, w/2] plus the packed stream
            # row count)
            pack2 = pack2_env and (
                full_kernel
                or (v2_full_stage and h % 8 == 0 and (w // 2) % 8 == 0
                    and ((h * w + t_num) // 2) % 8 == 0))
            if pack2:
                x = x.reshape(b, (h * w + t_num) // 2, 2 * dim)
            elif (full_kernel or v2_full_stage) and d_pad != dim:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, d_pad - dim)))

            block_cls = Block
            if cfg.remat and not full_kernel:
                # rematerialize block activations in the backward pass
                # (trades FLOPs for HBM; the TPU analogue of the reference's
                # absent gradient checkpointing — enables pvlt_large at
                # full batch).  static: hw, t_num, deterministic (self is 0).
                # Pointless on the inference-only full-kernel path, which
                # also threads extra args remat's static_argnums don't know.
                block_cls = nn.remat(Block, static_argnums=(2, 3, 4))

            def mk_block(j):
                return block_cls(
                    dim=dim, num_heads=cfg.num_heads[i], mlp_ratio=cfg.mlp_ratios[i],
                    sr_ratio=cfg.sr_ratios[i], qkv_bias=cfg.qkv_bias,
                    drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
                    drop_path=float(dpr[cur + j]), ln_eps=cfg.block_ln_eps,
                    sr_ln_eps=cfg.other_ln_eps, use_pallas=cfg.use_pallas_attention,
                    variant=cfg.variant,
                    linear_sr=cfg.linear_sr and cfg.sr_ratios[i] > 1,
                    block_attn=cfg.block_attn_kernel,
                    fused_mlp_train=cfg.fused_mlp_train,
                    fused_attn_train=cfg.fused_attn_train,
                    fused_attn_stats=cfg.fused_attn_stats,
                    kernel_gelu=cfg.kernel_gelu,
                    head_pair=cfg.head_pair_attn,
                    pack2_mlp=cfg.pack_mlp_train,
                    dwconv_kernel=cfg.dwconv_mlp_kernel,
                    pack2=pack2,
                    v2_full=v2_full_stage,
                    swin_full=swin_full_stage,
                    window_size=cfg.window_size,
                    shift=cfg.variant == "swin" and j % 2 == 1,  # alternate W-MSA/SW-MSA
                    dtype=dtype, name=f"block{i + 1}_{j}",
                )

            # The full-kernel path needs no inter-block handoff since the
            # SR-KV fusion (ops/sr_kv.py): every block's K/V path reads the
            # raw stream inside its own kernel, at every sr ratio.
            for j in range(cfg.depths[i]):
                x = mk_block(j)(x, (h, w), t_num, det)
            cur += cfg.depths[i]

            if swin_full_stage:
                # stream ran split: just drop the visual pad lanes
                xv, y = x
                x = xv[..., :dim].reshape(b, h, w, dim)
            else:
                if pack2:  # un-pack: free contiguous reshape to [B, N, dim]
                    x = x.reshape(b, h * w + t_num, dim)
                # split back (drop pad lanes, fused into the same copy)
                x, y = x[:, : h * w, :dim], x[:, h * w :, :dim]
                x = x.reshape(b, h, w, dim)
            img_feats.append(x)
            text_feats.append(y)

        # --- heads (libs/pvlt.py:242-277, 358-401) ---
        logits: Dict[str, Any] = {}
        last_text = text_feats[-1]
        lt = cfg.loss_type

        def adapter(name: str, feat: jnp.ndarray) -> jnp.ndarray:
            """Linear(dim->hidden)+LN head adapter (libs/pvlt.py:244-248)."""
            z = nn.Dense(cfg.token_hidden_size, dtype=dtype, kernel_init=_trunc02,
                         name=f"{name}_dense")(feat)
            return nn.LayerNorm(epsilon=cfg.other_ln_eps, dtype=dtype, name=f"{name}_ln")(z)

        if lt.mlm:
            table = self.variables["params"]["text_embeddings"]["word_embeddings"]["embedding"]
            decode = not (train and cfg.mlm_loss_chunk > 0)
            if mlm_row_idx is not None and not decode:
                # Pre-transform row gather (train/losses.py:mlm_gather_plan):
                # only ~capacity of the B*T text rows carry an MLM label, so
                # gather them BEFORE the head adapter + BertHeadTransform —
                # the Dense(dim->768)+LN and Dense(768->768)+GELU+LN then run
                # on [capacity] rows instead of all B*T, forward AND backward.
                # The loss must be computed against the plan's sel_labels.
                d = last_text.shape[-1]
                sel = jnp.take(last_text.reshape(-1, d), mlm_row_idx, axis=0)
                mlm_feat = adapter("mlm_head_embed", sel[None])
            else:
                mlm_feat = adapter("mlm_head_embed", last_text)
            head = MLMHead(
                vocab_size=cfg.vocab_size, hidden_size=cfg.token_hidden_size,
                dtype=dtype, name="mlm_head",
            )
            if decode:
                logits["mlm_logits"] = head(mlm_feat, table)
            else:
                hidden, bias = head(mlm_feat, table, decode=False)
                logits["mlm_logits"] = None
                logits["mlm_hidden"] = hidden
                logits["mlm_table"] = table
                logits["mlm_bias"] = bias
        else:
            logits["mlm_logits"] = None

        if lt.itm:
            itm_feat = adapter("itm_head_embed", last_text[:, 0:1, :])
            logits["itm_logits"] = ITMHead(dtype=dtype, name="itm_head")(itm_feat)
        else:
            logits["itm_logits"] = None

        if lt.cls:
            sup_feat = adapter("sup_cls_head_embed", last_text[:, 0:1, :])
            logits["sup_cls_logits"] = CLSHead(cfg.num_super_classes, dtype=dtype,
                                               name="sup_cls_head")(sup_feat)
            sub_feat = adapter("sub_cls_head_embed", last_text[:, 0:1, :])
            logits["sub_cls_logits"] = CLSHead(cfg.num_sub_classes, dtype=dtype,
                                               name="sub_cls_head")(sub_feat)
        else:
            logits["sup_cls_logits"] = None
            logits["sub_cls_logits"] = None

        if lt.t2i:
            t2i = ITGHead(
                embed_dims=cfg.embed_dims, channel=cfg.itg_channel,
                axis_name=self.axis_name, dtype=dtype, name="t2i_head",
            )(img_feats[1], img_feats[2], img_feats[3], train=train)
            logits["t2i_logits"] = t2i.astype(jnp.float32)
        else:
            logits["t2i_logits"] = None

        return logits


# --- model registry -----------------------------------------------------
# The capability behind the reference's timm @register_model entries
# (libs/pvlt.py:415-483) and the broken hubconf.py: name -> depth preset.
MODEL_REGISTRY: Dict[str, Dict[str, Any]] = {
    "pvlt_tiny": dict(depths=(2, 2, 2, 2)),
    "pvlt_small": dict(depths=(3, 4, 6, 3)),
    "pvlt_medium": dict(depths=(3, 4, 18, 3)),
    "pvlt_large": dict(depths=(3, 8, 27, 3)),
    # PVT-v2 backbone variants (BASELINE.json stretch config): overlapping
    # patch embed, DWConv MLP, optional linear SRA.
    "pvlt_v2_tiny": dict(depths=(2, 2, 2, 2), variant="v2"),
    "pvlt_v2_small": dict(depths=(3, 4, 6, 3), variant="v2"),
    "pvlt_v2_linear_tiny": dict(depths=(2, 2, 2, 2), variant="v2", linear_sr=True),
    # Swin backbone variants (BASELINE.json stretch config): shifted-window
    # joint attention with relative-position bias (mvlt_tpu/models/swin.py);
    # Swin-T-like depths for the 'small' entry.
    "pvlt_swin_tiny": dict(depths=(2, 2, 2, 2), variant="swin"),
    "pvlt_swin_small": dict(depths=(2, 2, 6, 2), variant="swin"),
}


def validate_model_config(cfg: ModelConfig) -> None:
    """Reject unsupported knob combinations at construction time instead of
    letting them surface as trace-time errors (or silent no-ops) inside a
    jit.  Attention-prob dropout (libs/pvlt.py:88) is implemented on the
    v1/v2 XLA path (JointSRAttention); the Swin variant's window attention
    does not materialize probs outside its kernel, so it rejects it."""
    if cfg.attn_drop_rate and cfg.variant == "swin":
        raise NotImplementedError(
            f"attn_drop_rate={cfg.attn_drop_rate} is not supported by the "
            f"swin variant's window-attention path; use variant v1/v2 or "
            f"attn_drop_rate=0")
    if cfg.block_attn_kernel not in ("none", "mega", "auto", "full"):
        raise ValueError(
            f"block_attn_kernel={cfg.block_attn_kernel!r} not in "
            f"('none', 'mega', 'auto', 'full')")
    if cfg.kernel_gelu not in ("tanh", "erf"):
        raise ValueError(f"kernel_gelu={cfg.kernel_gelu!r} not in ('tanh', 'erf')")
    if not 0.0 < cfg.mlm_capacity_frac <= 1.0:
        raise ValueError(f"mlm_capacity_frac={cfg.mlm_capacity_frac} must be in (0, 1]")


def resolve_model_config(cfg: ModelConfig) -> ModelConfig:
    """Return cfg with the MODEL_REGISTRY preset for cfg.name applied —
    the config the model will ACTUALLY be built with.  Anything computing
    shape-derived quantities from a config (e.g. bench.py's analytic FLOP
    model) must resolve first: a bare ModelConfig(name='pvlt_small') still
    carries tiny depths until this runs."""
    if cfg.name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {cfg.name!r}; registry: {sorted(MODEL_REGISTRY)}")
    preset = MODEL_REGISTRY[cfg.name]
    updates = {k: v for k, v in preset.items() if getattr(cfg, k) != v}
    if updates:
        import dataclasses

        cfg = dataclasses.replace(cfg, **updates)
    return cfg


def create_model(cfg: ModelConfig, *, axis_name: Optional[str] = None,
                 sp_mesh: Optional[Any] = None) -> PVLT:
    """Instantiate a PVLT from a ModelConfig, applying the registry preset
    for cfg.name (all presets share dims/heads/mlp-ratios; only depths vary,
    libs/pvlt.py:416-483)."""
    cfg = resolve_model_config(cfg)  # validate what will actually be built:
    # the preset sets variant, so e.g. swin+attn_drop must reject even when
    # requested via name= with the default variant field
    validate_model_config(cfg)
    return PVLT(cfg, axis_name=axis_name, sp_mesh=sp_mesh)
