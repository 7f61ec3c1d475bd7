"""Pre-training / fine-tuning objectives.

The reference computes losses inline in the engine
(engine_grid_masking.py:81-102):
  * MLM:  CrossEntropy(ignore_index=-1) over [B*T, vocab], weight 1
  * ITM:  CrossEntropy over [B, 2], weight 1
  * CLS:  CrossEntropy over 48-way + 122-way heads, weight 1 each
  * T2I:  SmoothL1(beta=1) between the reconstructed pixels and the *clean*
          image, weight 10 (MLM_LOSS_WEIGHT/ITM_LOSS_WEIGHT/T2I_LOSS_WEIGHT
          at engine_grid_masking.py:23)

Everything here is pure-jnp and jit-safe; all reductions are means so values
are batch-size invariant (and DP-invariant under pjit, where each device
computes the mean over its shard and gradients psum naturally).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

MLM_LOSS_WEIGHT = 1.0
ITM_LOSS_WEIGHT = 1.0
T2I_LOSS_WEIGHT = 10.0
MLM_IGNORE_INDEX = -1


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: Optional[int] = None) -> jnp.ndarray:
    """Mean softmax cross entropy; positions equal to ignore_index are
    excluded from the mean (torch CrossEntropyLoss(ignore_index=...)
    semantics)."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    if ignore_index is not None:
        valid = labels != ignore_index
        safe_labels = jnp.where(valid, labels, 0)
        nll = -jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(valid.sum(), 1)
        return jnp.where(valid, nll, 0.0).sum() / denom
    nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    return nll.mean()


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """torch SmoothL1Loss with default beta=1 (mean reduction)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta).mean()


def compute_losses(outputs: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                   num_super: int = 48, num_sub: int = 122) -> Dict[str, jnp.ndarray]:
    """All enabled objectives for one step.

    batch keys (mirroring the dataset contract, mcloader/fashion_gen.py:192-209):
      images [B,H,W,3] (clean, the T2I regression target), mlm_labels [B,T]
      (-1 = unmasked), itm_labels [B] or [B,1], sup_cls_labels / sub_cls_labels.
    """
    zero = jnp.float32(0.0)
    losses = {"loss_mlm": zero, "loss_itm": zero, "loss_sup_cls": zero,
              "loss_sub_cls": zero, "loss_t2i": zero}
    total = zero

    if outputs.get("mlm_logits") is not None:
        vocab = outputs["mlm_logits"].shape[-1]
        l = MLM_LOSS_WEIGHT * cross_entropy(
            outputs["mlm_logits"].reshape(-1, vocab),
            batch["mlm_labels"].reshape(-1),
            ignore_index=MLM_IGNORE_INDEX,
        )
        losses["loss_mlm"] = l
        total = total + l

    if outputs.get("itm_logits") is not None:
        l = ITM_LOSS_WEIGHT * cross_entropy(
            outputs["itm_logits"].reshape(-1, 2), batch["itm_labels"].reshape(-1))
        losses["loss_itm"] = l
        total = total + l

    if outputs.get("sup_cls_logits") is not None:
        l_sup = cross_entropy(outputs["sup_cls_logits"].reshape(-1, num_super),
                              batch["sup_cls_labels"].reshape(-1))
        l_sub = cross_entropy(outputs["sub_cls_logits"].reshape(-1, num_sub),
                              batch["sub_cls_labels"].reshape(-1))
        losses["loss_sup_cls"] = l_sup
        losses["loss_sub_cls"] = l_sub
        total = total + l_sup + l_sub

    if outputs.get("t2i_logits") is not None:
        l = T2I_LOSS_WEIGHT * smooth_l1(outputs["t2i_logits"], batch["images"])
        losses["loss_t2i"] = l
        total = total + l

    losses["total_loss"] = total
    return losses
