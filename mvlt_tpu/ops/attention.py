"""Multi-head attention with asymmetric (spatially-reduced) KV.

This is the hot op of PVLT: every block attends a joint [image-patches ||
text-tokens] query sequence against a KV sequence whose *visual* part was
downsampled by a strided conv (spatial-reduction attention, SRA) while the
text part is kept at full length (reference: libs/pvlt.py:95-121).

The QKV projections and the SR conv live in the model (they are matmuls XLA
already maps onto the MXU); this module provides the softmax-attention core
with two interchangeable backends:

  * ``_attention_xla`` — einsum reference path, always available, used on CPU
    and as the ground truth in tests;
  * Pallas fused kernel (mvlt_tpu.ops.pallas_attention) — one VMEM-resident
    pass over the KV (KV length is tiny after SRA: (HW/sr^2)+T), fusing
    scale, softmax and the PV matmul to avoid materializing the [N, KV]
    attention matrix in HBM.

Numerics: logits/softmax accumulate in float32 regardless of input dtype
(bf16 inputs are fine on the MXU; the softmax reduction is done in fp32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _attention_xla(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Plain XLA attention. q: [B, H, N, D], k/v: [B, H, M, D] -> [B, H, N, D]."""
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(jax.named_call, name="mha_core")
def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    use_pallas: bool = True,
) -> jax.Array:
    """Softmax attention core.

    Args:
      q: [B, H, N, D] queries (joint image+text sequence).
      k: [B, H, M, D] keys (SR-reduced image tokens ++ text tokens).
      v: [B, H, M, D] values.
      scale: 1/sqrt(D) (reference: head_dim ** -0.5, libs/pvlt.py:82).
      use_pallas: dispatch to the fused Pallas TPU kernel when running on TPU.

    Returns:
      [B, H, N, D] attention output in q.dtype.
    """
    if use_pallas and q.shape[-1] >= 8 and jax.default_backend() == "tpu":
        from mvlt_tpu.ops.pallas_attention import fused_attention

        return fused_attention(q, k, v, scale=scale)
    return _attention_xla(q, k, v, scale)
