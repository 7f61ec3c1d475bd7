"""M-CR / S-CR recognition evaluation.

Protocol (engine_grid_masking.py:396-474): forward the full valid split with
clean text ids, argmax the 48-way (super) and 122-way (sub) heads, report
accuracy + macro/micro/weighted F1 per head, and dump the prediction lists
as an artifact (the reference writes ./visulization/<hdr>/ text files).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.eval.metrics import cls_metrics


def make_cls_scorer(model, variables) -> Callable:
    """``variables`` is a traced jit argument (not a baked closure constant)
    — restores don't recompile; see make_itm_scorer."""

    @jax.jit
    def score(variables, images: jnp.ndarray, input_ids: jnp.ndarray):
        if images.dtype == jnp.uint8:  # uint8-on-the-wire eval batches
            images = images.astype(jnp.float32) / 255.0
        out = model.apply(variables, images, input_ids, train=False)
        sup = jnp.argmax(out["sup_cls_logits"].reshape(images.shape[0], -1), axis=-1)
        sub = jnp.argmax(out["sub_cls_logits"].reshape(images.shape[0], -1), axis=-1)
        return sup, sub

    return lambda images, input_ids: score(variables, images, input_ids)


def evaluate_recognition(scorer: Callable, loader: Iterable,
                         num_super: int = 48, num_sub: int = 122,
                         artifact_dir: Optional[str] = None, mesh=None,
                         is_main: bool = True) -> Dict[str, float]:
    """With ``mesh``, batches shard over the data axis (padded by repeating
    row 0; padded predictions sliced off — metrics exact)."""
    if mesh is not None:
        from mvlt_tpu.parallel.sharding import shard_batch

    dp = mesh.shape["data"] if mesh is not None else 1
    sup_labels, sup_preds, sub_labels, sub_preds, names = [], [], [], [], []
    for batch in loader:
        imgs = np.asarray(batch["images"])
        if imgs.dtype != np.uint8:  # uint8 ships as-is; scorer divides by 255
            imgs = imgs.astype(np.float32)
        ids = np.asarray(batch["ori_input_ids"])
        b = imgs.shape[0]
        pad = (-b) % dp
        if pad:
            imgs = np.concatenate([imgs, np.repeat(imgs[:1], pad, axis=0)])
            ids = np.concatenate([ids, np.repeat(ids[:1], pad, axis=0)])
        feed = {"images": imgs, "input_ids": ids}
        if mesh is not None:
            feed = shard_batch(mesh, feed)
        sup, sub = scorer(feed["images"], feed["input_ids"])
        sup_preds.extend(np.asarray(sup)[:b].tolist())
        sub_preds.extend(np.asarray(sub)[:b].tolist())
        sup_labels.extend(np.asarray(batch["sup_cls_labels"]).reshape(-1).tolist())
        sub_labels.extend(np.asarray(batch["sub_cls_labels"]).reshape(-1).tolist())
        if "info_list" in batch:
            names.extend(batch["info_list"])

    sup_acc, sup_macro, sup_micro, sup_weighted = cls_metrics(sup_labels, sup_preds, num_super)
    sub_acc, sub_macro, sub_micro, sub_weighted = cls_metrics(sub_labels, sub_preds, num_sub)
    results = {
        "sup_accuracy": sup_acc, "sup_macro_f1": sup_macro,
        "sup_micro_f1": sup_micro, "sup_weighted_f1": sup_weighted,
        "sub_accuracy": sub_acc, "sub_macro_f1": sub_macro,
        "sub_micro_f1": sub_micro, "sub_weighted_f1": sub_weighted,
    }

    if artifact_dir and is_main:
        os.makedirs(artifact_dir, exist_ok=True)
        with open(os.path.join(artifact_dir, "recognition_predictions.json"), "w") as f:
            json.dump({
                "sup_labels": sup_labels, "sup_preds": sup_preds,
                "sub_labels": sub_labels, "sub_preds": sub_preds,
                "names": names, "metrics": results,
            }, f)

    if is_main:
        print(f"recognition: sup acc={sup_acc:.7f} macro_f1={sup_macro:.7f} | "
              f"sub acc={sub_acc:.7f} macro_f1={sub_macro:.7f}", flush=True)
    return results
