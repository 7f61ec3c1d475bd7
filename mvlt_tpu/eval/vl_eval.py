"""Pre-training validation: MLM/ITM/CLS accuracy + T2I PSNR.

Protocol (engine_grid_masking.py:153-333): three forwards per batch —
  1. (clean images, masked text ids)   -> MLM loss + token accuracy
  2. (clean images, clean text ids)    -> ITM + CLS losses/accuracies
  3. (masked images, clean text ids)   -> T2I loss + PSNR
All three share one compiled eval graph here (the input selection is just
different operands to the same jitted forward).  The summed quality score
``mlm_acc + itm_acc + sup_cls_acc + sub_cls_acc`` drives best-checkpoint
selection (main_vl.py:462-498).

Sharded eval (TPU-first upgrade over the reference's rank-0 serial eval,
engine_grid_masking.py:337-393): pass ``mesh`` to shard every eval batch
over the data axis.  The ragged final batch is padded to the data-axis
multiple and masked — padded rows carry label -1 everywhere, so the
ignore-index cross-entropies and the count-based accuracies are EXACT,
not approximately, equal to the unsharded run (tests/test_sharded_eval.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.train.losses import cross_entropy
from mvlt_tpu.utils.logging import MetricLogger

PAD_LABEL = -1


def make_vl_eval_fn(model, cfg) -> Callable:
    """Jitted per-batch eval returning masked SUMS and COUNTS (not means),
    so padded rows contribute nothing and host aggregation is exact."""
    lt = cfg.loss_type

    def forward(variables, images, ids):
        return model.apply(variables, images, ids, train=False)

    @jax.jit
    def eval_batch(variables, batch) -> Dict[str, jnp.ndarray]:
        m: Dict[str, jnp.ndarray] = {}
        valid = batch["valid"].astype(jnp.float32)          # [B], 0 on padding
        nv = valid.sum()
        m["n_valid"] = nv
        total_loss = jnp.float32(0.0)

        if lt.mlm:
            out = forward(variables, batch["images"], batch["input_ids"])
            labels = batch["mlm_labels"]                     # padded rows: all -1
            vocab = out["mlm_logits"].shape[-1]
            total_loss += cross_entropy(
                out["mlm_logits"].reshape(-1, vocab), labels.reshape(-1),
                ignore_index=PAD_LABEL)
            preds = jnp.argmax(out["mlm_logits"], axis=-1)
            tok_valid = labels != PAD_LABEL
            m["mlm_correct"] = jnp.sum((preds == labels) & tok_valid).astype(jnp.float32)
            m["mlm_count"] = tok_valid.sum().astype(jnp.float32)

        if lt.itm or lt.cls:
            out = forward(variables, batch["images"], batch["ori_input_ids"])

            def masked_acc(logits, labels):
                labels = labels.reshape(-1)
                ok = (jnp.argmax(logits, axis=-1) == labels) & (labels != PAD_LABEL)
                return ok.sum().astype(jnp.float32)

            if lt.itm:
                labels = batch["itm_labels"].reshape(-1)     # padded rows: -1
                total_loss += cross_entropy(
                    out["itm_logits"].reshape(-1, 2), labels, ignore_index=PAD_LABEL)
                m["itm_correct"] = masked_acc(out["itm_logits"].reshape(-1, 2), labels)
            if lt.cls:
                b = batch["images"].shape[0]
                sup = out["sup_cls_logits"].reshape(b, -1)
                sub = out["sub_cls_logits"].reshape(b, -1)
                total_loss += cross_entropy(
                    sup, batch["sup_cls_labels"].reshape(-1), ignore_index=PAD_LABEL)
                total_loss += cross_entropy(
                    sub, batch["sub_cls_labels"].reshape(-1), ignore_index=PAD_LABEL)
                m["sup_correct"] = masked_acc(sup, batch["sup_cls_labels"])
                m["sub_correct"] = masked_acc(sub, batch["sub_cls_labels"])

        if lt.t2i:
            out = forward(variables, batch["masked_images"], batch["ori_input_ids"])
            pred = out["t2i_logits"].astype(jnp.float32)
            tgt = batch["images"].astype(jnp.float32)
            diff = jnp.abs(pred - tgt)
            sl1_rows = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
            sl1_rows = sl1_rows.reshape(pred.shape[0], -1).mean(axis=-1)
            total_loss += 10.0 * (sl1_rows * valid).sum() / jnp.maximum(nv, 1.0)
            mse_rows = ((pred - tgt) ** 2).reshape(pred.shape[0], -1).mean(axis=-1)
            m["t2i_mse_sum"] = (mse_rows * valid).sum()

        m["total_loss"] = total_loss
        return m

    return eval_batch


def pad_eval_batch(feed: Dict[str, np.ndarray], multiple: int) -> Dict[str, np.ndarray]:
    """Pad every array's leading dim to ``multiple`` and add the ``valid``
    mask.  Label tensors are padded with -1 (the ignore index), everything
    else with zeros."""
    b = int(feed["images"].shape[0])
    pad = (-b) % multiple
    out = {}
    for k, v in feed.items():
        v = np.asarray(v)
        if pad:
            fill = PAD_LABEL if k.endswith("labels") else 0
            widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
            v = np.pad(v, widths, constant_values=fill)
        out[k] = v
    out["valid"] = np.concatenate(
        [np.ones(b, np.float32), np.zeros(pad, np.float32)])
    return out


def evaluate_vl(eval_batch_fn: Callable, variables, loader: Iterable,
                mesh=None, log_every: int = 10,
                is_main: bool = True) -> Dict[str, float]:
    """Run VL eval; with ``mesh`` the batches shard over the data axis so
    every chip works through eval (the reference leaves world-1 GPUs idle)."""
    import math

    from mvlt_tpu.parallel.sharding import shard_batch

    multiple = mesh.shape["data"] if mesh is not None else 1

    logger = MetricLogger(is_main=is_main)
    for batch in logger.log_every(loader, log_every, header="Eval:"):
        feed = {k: np.asarray(v) for k, v in batch.items()
                if isinstance(v, (np.ndarray, jnp.ndarray))}
        feed = pad_eval_batch(feed, multiple)
        if mesh is not None:
            feed = shard_batch(mesh, feed)
        else:
            feed = {k: jnp.asarray(v) for k, v in feed.items()}
        m = jax.device_get(eval_batch_fn(variables, feed))
        nv = float(m["n_valid"])
        if "mlm_correct" in m:
            cnt = float(m["mlm_count"])
            logger.meters["mlm_acc"].update(
                float(m["mlm_correct"]) / max(cnt, 1.0), n=int(max(cnt, 1)))
        if "itm_correct" in m:
            logger.meters["itm_acc"].update(float(m["itm_correct"]) / max(nv, 1.0), n=int(nv))
        if "sup_correct" in m:
            logger.meters["sup_cls_acc"].update(float(m["sup_correct"]) / max(nv, 1.0), n=int(nv))
            logger.meters["sub_cls_acc"].update(float(m["sub_correct"]) / max(nv, 1.0), n=int(nv))
        logger.meters["total_loss"].update(float(m["total_loss"]), n=int(nv))
        if "t2i_mse_sum" in m:
            mse = float(m["t2i_mse_sum"]) / max(nv, 1.0)
            # PSNR aggregated from per-batch MSE (reference quirk: peak 255
            # on [0,1] images, libs/vl_scores.py:57-63)
            p = 100.0 if mse == 0 else 20 * math.log10(255.0 / math.sqrt(mse))
            logger.meters["t2i_psnr"].update(p, n=int(nv))
    logger.synchronize_between_processes()
    stats = logger.global_averages()
    stats["quality_score"] = sum(
        stats.get(k, 0.0) for k in ("mlm_acc", "itm_acc", "sup_cls_acc", "sub_cls_acc"))
    if is_main:
        print("eval:", {k: round(v, 5) for k, v in stats.items()}, flush=True)
    return stats
