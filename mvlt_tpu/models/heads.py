"""Task heads: MLM (weight-tied), ITM, CLS, and the T2I pixel decoder.

Functional equivalents of the reference heads (libs/vl_heads.py):
  * MLMHead  — BertHeadTransform (dense+erf-GELU+LN) then a decoder tied to
    the BERT word-embedding table plus a free bias (libs/vl_heads.py:38-70).
  * ITMHead  — Linear(hidden->2) with bias, plus a separate zero-init bias
    parameter (libs/vl_heads.py:73-87; both biases kept for checkpoint
    fidelity).
  * CLSHead  — same shape as ITM with cls_num outputs (libs/vl_heads.py:90-104).
  * ITGHead  — FPN-style pixel decoder over stage 2-4 feature maps with
    multiplicative fusion, ConvBN blocks and align-corners bilinear
    upsampling (libs/vl_heads.py:107-165).  NHWC layout throughout (TPU
    conv-friendly); BatchNorm supports cross-replica stats via ``axis_name``.

The ELECTRA generator in the reference (libs/vl_heads.py:168-245) is dead
code and is intentionally not rebuilt (SURVEY.md §7 "Dead code").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvlt_tpu.ops.upsample import upsample_bilinear_align_corners

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def erf_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — the reference uses the non-tanh form
    (libs/vl_heads.py:7-14); flax's default is the tanh approximation."""
    return nn.gelu(x, approximate=False)


class BertHeadTransform(nn.Module):
    hidden_size: int = 768
    ln_eps: float = 1e-5  # torch nn.LayerNorm default (libs/vl_heads.py:28)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_size, dtype=self.dtype, kernel_init=_trunc02, name="dense")(x)
        x = erf_gelu(x)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="LayerNorm")(x)
        return x


class MLMHead(nn.Module):
    """Masked language modeling head; decoder weight is the (tied) embedding
    table passed in at call time, so no duplicate vocab-size parameter."""

    vocab_size: int = 30522
    hidden_size: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, embedding_table: jnp.ndarray,
                 decode: bool = True):
        """x: [B, T, hidden]; embedding_table: [vocab, hidden] -> [B, T, vocab].

        With decode=False, returns (transformed_hidden, bias) instead of
        logits — the training step then computes the MLM loss in vocab
        chunks without materializing the full logits tensor
        (mvlt_tpu/train/losses.py:chunked_mlm_loss).
        """
        x = BertHeadTransform(self.hidden_size, dtype=self.dtype, name="transform")(x)
        bias = self.param("bias", nn.initializers.zeros, (self.vocab_size,), jnp.float32)
        if not decode:
            return x, bias
        logits = jnp.einsum(
            "btd,vd->btv", x, embedding_table.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        return logits + bias.astype(logits.dtype)


class ITMHead(nn.Module):
    """Image-text matching head (2-way)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(2, dtype=self.dtype, kernel_init=_trunc02, name="linear")(x)
        extra_bias = self.param("linear_bias", nn.initializers.zeros, (2,), jnp.float32)
        return y + extra_bias.astype(y.dtype)


class CLSHead(nn.Module):
    """Super/sub-category recognition head."""

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.num_classes, dtype=self.dtype, kernel_init=_trunc02, name="linear")(x)
        extra_bias = self.param("linear_bias", nn.initializers.zeros, (self.num_classes,), jnp.float32)
        return y + extra_bias.astype(y.dtype)


class ConvBN(nn.Module):
    """3x3 (or 1x1) conv without bias followed by BatchNorm
    (libs/vl_heads.py:147-152).  torch BN defaults: eps 1e-5, momentum 0.1
    (== flax momentum 0.9)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x)
        return x


class ITGHead(nn.Module):
    """T2I pixel decoder: stages 2-4 feature maps -> full-resolution RGB.

    Reference topology (libs/vl_heads.py:136-165): reductions to a common
    channel width, cascaded x2 upsampling with multiplicative fusion, two
    concat stages, and a 1x1 score conv followed by x8 upsampling.
    All feature maps are NHWC.
    """

    embed_dims: tuple = (64, 128, 320, 512)
    channel: int = 64
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        low_feat: jnp.ndarray,   # stage-2 map [B, H/8,  W/8,  embed_dims[1]]
        mid_feat: jnp.ndarray,   # stage-3 map [B, H/16, W/16, embed_dims[2]]
        high_feat: jnp.ndarray,  # stage-4 map [B, H/32, W/32, embed_dims[3]]
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        c = self.channel
        mk = lambda feats, name: ConvBN(feats, axis_name=self.axis_name, dtype=self.dtype, name=name)
        up2 = lambda t: upsample_bilinear_align_corners(t, 2)

        low = mk(c, "reduction1")(low_feat, train=train)
        mid = mk(c, "reduction2")(mid_feat, train=train)
        high = mk(c, "reduction3")(high_feat, train=train)

        x1_1 = high
        x2_1 = mk(c, "conv_upsample1")(up2(x1_1), train=train) * mid
        x3_1 = (
            mk(c, "conv_upsample2")(up2(mid), train=train)
            * mk(c, "conv_upsample3")(up2(x2_1), train=train)
            * low
        )

        x2_2 = jnp.concatenate([x2_1, mk(c, "conv_upsample4")(up2(x1_1), train=train)], axis=-1)
        x2_2 = mk(2 * c, "conv_concat2")(x2_2, train=train)

        x3_2 = jnp.concatenate([x3_1, mk(2 * c, "conv_upsample5")(up2(x2_2), train=train)], axis=-1)
        x3_2 = mk(3 * c, "conv_concat3")(x3_2, train=train)

        refined = mk(3 * c, "conv4")(x3_2, train=train)

        score = nn.Conv(3, kernel_size=(1, 1), dtype=self.dtype, name="score_conv")(refined)
        return upsample_bilinear_align_corners(score, 8)
