"""Evaluation metric primitives.

Native equivalents of libs/vl_scores.py and the sklearn calls at
engine_grid_masking.py:465-474 (accuracy, macro/micro/weighted F1) so the
runtime has no sklearn dependency.  All jnp functions are jit-safe; the F1
computation is vectorized via bincount confusion counts.

Reference quirk reproduced: PSNR uses PIXEL_MAX=255 even though images are
in [0,1] (libs/vl_scores.py:57-63) — kept so reported t2i_psnr values are
directly comparable with the reference logs.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def mlm_accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
                 ignore_index: int = -1) -> jnp.ndarray:
    """Token accuracy over non-ignored positions (libs/vl_scores.py:5-33).
    Returns a scalar in [0,1]; 0/0 -> 0."""
    preds = jnp.argmax(logits, axis=-1)
    valid = labels != ignore_index
    correct = jnp.sum((preds == labels) & valid)
    total = jnp.sum(valid)
    return jnp.where(total > 0, correct / jnp.maximum(total, 1), 0.0)


def argmax_accuracy_count(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Number of argmax-correct rows (libs/vl_scores.py:36-50, the
    multi-logit branch).  logits [N, C], labels [N]."""
    return jnp.sum(jnp.argmax(logits, axis=-1) == labels)


def psnr(pred: jnp.ndarray, target: jnp.ndarray, pixel_max: float = 255.0) -> float:
    """PSNR with the reference's 255 peak (libs/vl_scores.py:53-63)."""
    mse = float(jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2))
    if mse == 0:
        return 100.0
    return 20 * math.log10(pixel_max / math.sqrt(mse))


def _confusion_counts(labels: np.ndarray, preds: np.ndarray,
                      num_classes: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(tp, pred_count, true_count) per class via bincount."""
    labels = np.asarray(labels).reshape(-1)
    preds = np.asarray(preds).reshape(-1)
    tp = np.bincount(labels[labels == preds], minlength=num_classes)[:num_classes]
    pred_count = np.bincount(preds, minlength=num_classes)[:num_classes]
    true_count = np.bincount(labels, minlength=num_classes)[:num_classes]
    return tp.astype(np.float64), pred_count.astype(np.float64), true_count.astype(np.float64)


def f1_scores(labels: np.ndarray, preds: np.ndarray, num_classes: int) -> dict:
    """macro / micro / weighted F1 with sklearn semantics.

    sklearn averages per-class F1 over the classes *present in labels or
    preds* (its default labels=union); classes absent from both are excluded
    from macro/weighted averaging.  0/0 precision/recall/F1 terms are 0.
    """
    tp, pc, tc = _confusion_counts(labels, preds, num_classes)
    present = (pc + tc) > 0

    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(pc > 0, tp / np.maximum(pc, 1), 0.0)
        recall = np.where(tc > 0, tp / np.maximum(tc, 1), 0.0)
        f1 = np.where(precision + recall > 0,
                      2 * precision * recall / np.maximum(precision + recall, 1e-300), 0.0)

    macro = float(f1[present].mean()) if present.any() else 0.0
    support = tc[present]
    weighted = float((f1[present] * support).sum() / support.sum()) if support.sum() else 0.0
    micro_tp, micro_pc, micro_tc = tp.sum(), pc.sum(), tc.sum()
    micro_p = micro_tp / micro_pc if micro_pc else 0.0
    micro_r = micro_tp / micro_tc if micro_tc else 0.0
    micro = 2 * micro_p * micro_r / (micro_p + micro_r) if micro_p + micro_r else 0.0
    return {"macro_f1": macro, "micro_f1": float(micro), "weighted_f1": weighted}


def cls_metrics(labels: np.ndarray, preds: np.ndarray, num_classes: int) -> Tuple[float, float, float, float]:
    """(accuracy, macro_f1, micro_f1, weighted_f1) — the tuple contract of
    calculate_cls_metrics (engine_grid_masking.py:465-474)."""
    labels = np.asarray(labels).reshape(-1)
    preds = np.asarray(preds).reshape(-1)
    acc = float((labels == preds).mean()) if labels.size else 0.0
    f1 = f1_scores(labels, preds, num_classes)
    return acc, f1["macro_f1"], f1["micro_f1"], f1["weighted_f1"]
