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
    @jax.jit
    def score(images: jnp.ndarray, input_ids: jnp.ndarray):
        out = model.apply(variables, images, input_ids, train=False)
        sup = jnp.argmax(out["sup_cls_logits"].reshape(images.shape[0], -1), axis=-1)
        sub = jnp.argmax(out["sub_cls_logits"].reshape(images.shape[0], -1), axis=-1)
        return sup, sub

    return score


def evaluate_recognition(scorer: Callable, loader: Iterable,
                         num_super: int = 48, num_sub: int = 122,
                         artifact_dir: Optional[str] = None,
                         is_main: bool = True) -> Dict[str, float]:
    sup_labels, sup_preds, sub_labels, sub_preds, names = [], [], [], [], []
    for batch in loader:
        sup, sub = scorer(jnp.asarray(batch["images"]),
                          jnp.asarray(batch["ori_input_ids"]))
        sup_preds.extend(np.asarray(sup).tolist())
        sub_preds.extend(np.asarray(sub).tolist())
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
