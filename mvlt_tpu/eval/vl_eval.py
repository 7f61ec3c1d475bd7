"""Pre-training validation: MLM/ITM/CLS accuracy + T2I PSNR.

Protocol (engine_grid_masking.py:153-333): three forwards per batch —
  1. (clean images, masked text ids)   -> MLM loss + token accuracy
  2. (clean images, clean text ids)    -> ITM + CLS losses/accuracies
  3. (masked images, clean text ids)   -> T2I loss + PSNR
All three share one compiled eval graph here (the input selection is just
different operands to the same jitted forward).  The summed quality score
``mlm_acc + itm_acc + sup_cls_acc + sub_cls_acc`` drives best-checkpoint
selection (main_vl.py:462-498).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.eval.metrics import argmax_accuracy_count, mlm_accuracy, psnr
from mvlt_tpu.train.losses import compute_losses
from mvlt_tpu.utils.logging import MetricLogger


def make_vl_eval_fn(model, cfg) -> Callable:
    """Jitted per-batch eval computing all enabled metrics in one graph."""
    lt = cfg.loss_type

    def forward(variables, images, ids):
        return model.apply(variables, images, ids, train=False)

    @jax.jit
    def eval_batch(variables, batch) -> Dict[str, jnp.ndarray]:
        metrics: Dict[str, jnp.ndarray] = {}
        total_loss = jnp.float32(0.0)
        b = batch["images"].shape[0]

        if lt.mlm:
            out = forward(variables, batch["images"], batch["input_ids"])
            losses = compute_losses(
                {"mlm_logits": out["mlm_logits"]}, batch)
            total_loss += losses["loss_mlm"]
            metrics["mlm_acc"] = mlm_accuracy(out["mlm_logits"], batch["mlm_labels"])

        if lt.itm or lt.cls:
            out = forward(variables, batch["images"], batch["ori_input_ids"])
            if lt.itm:
                losses = compute_losses({"itm_logits": out["itm_logits"]}, batch)
                total_loss += losses["loss_itm"]
                metrics["itm_acc"] = argmax_accuracy_count(
                    out["itm_logits"].reshape(-1, 2), batch["itm_labels"].reshape(-1)) / b
            if lt.cls:
                losses = compute_losses(
                    {"sup_cls_logits": out["sup_cls_logits"],
                     "sub_cls_logits": out["sub_cls_logits"]}, batch)
                total_loss += losses["loss_sup_cls"] + losses["loss_sub_cls"]
                metrics["sup_cls_acc"] = argmax_accuracy_count(
                    out["sup_cls_logits"].reshape(b, -1),
                    batch["sup_cls_labels"].reshape(-1)) / b
                metrics["sub_cls_acc"] = argmax_accuracy_count(
                    out["sub_cls_logits"].reshape(b, -1),
                    batch["sub_cls_labels"].reshape(-1)) / b

        if lt.t2i:
            out = forward(variables, batch["masked_images"], batch["ori_input_ids"])
            losses = compute_losses({"t2i_logits": out["t2i_logits"]}, batch)
            total_loss += losses["loss_t2i"]
            metrics["t2i_mse"] = jnp.mean(
                (out["t2i_logits"].astype(jnp.float32)
                 - batch["images"].astype(jnp.float32)) ** 2)

        metrics["total_loss"] = total_loss
        return metrics

    return eval_batch


def evaluate_vl(eval_batch_fn: Callable, variables, loader: Iterable,
                log_every: int = 10, is_main: bool = True) -> Dict[str, float]:
    import math

    logger = MetricLogger(is_main=is_main)
    for batch in logger.log_every(loader, log_every, header="Eval:"):
        feed = {k: jnp.asarray(v) for k, v in batch.items()
                if isinstance(v, (np.ndarray, jnp.ndarray))}
        m = jax.device_get(eval_batch_fn(variables, feed))
        b = int(np.asarray(batch["images"]).shape[0])
        # PSNR is aggregated from per-batch MSE (reference quirk: peak 255
        # on [0,1 ] images, libs/vl_scores.py:57-63).
        mse = m.pop("t2i_mse", None)
        for k, v in m.items():
            logger.meters[k].update(float(v), n=b)
        if mse is not None:
            p = 100.0 if mse == 0 else 20 * math.log10(255.0 / math.sqrt(float(mse)))
            logger.meters["t2i_psnr"].update(p, n=b)
    logger.synchronize_between_processes()
    stats = logger.global_averages()
    stats["quality_score"] = sum(
        stats.get(k, 0.0) for k in ("mlm_acc", "itm_acc", "sup_cls_acc", "sub_cls_acc"))
    if is_main:
        print("eval:", {k: round(v, 5) for k, v in stats.items()}, flush=True)
    return stats
