"""Qualitative visualization: per-sample image/mask/reconstruction dumps and
MLM/ITM prediction reports.

The capability of the reference's ``visual_vl`` (engine_grid_masking.py:477-
685): for each validation sample, save the original image, the masked input
and the T2I reconstruction, and write the MLM top-1 predictions (masked
positions only, decoded back to WordPiece strings) plus the ITM verdict.
The reference's version is partially bit-rotted (it reads ``itg_logits`` /
``n_image`` keys the pipeline no longer produces); this one works against
the live forward contract.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable

import jax.numpy as jnp
import numpy as np

from PIL import Image


def _to_pil(img: np.ndarray) -> Image.Image:
    """float [H,W,3] in [0,1] -> PIL."""
    arr = np.clip(np.asarray(img), 0.0, 1.0)
    return Image.fromarray((arr * 255).astype(np.uint8))


def visualize_vl(eval_step: Callable, variables, loader: Iterable, tokenizer,
                 out_dir: str, max_samples: int = 32) -> int:
    """Dump qualitative artifacts; returns the number of samples written.

    eval_step(variables, images, ids) -> logits dict (from
    mvlt_tpu.train.step.make_eval_step-style closure or model.apply).
    """
    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for batch in loader:
        images = np.asarray(batch["images"])
        masked = np.asarray(batch["masked_images"])
        ids_mlm = jnp.asarray(batch["input_ids"])
        out_recon = eval_step(variables, jnp.asarray(masked), jnp.asarray(batch["ori_input_ids"]))
        out_mlm = eval_step(variables, jnp.asarray(images), ids_mlm)

        b = images.shape[0]
        for i in range(b):
            if written >= max_samples:
                return written
            sample_dir = os.path.join(out_dir, f"sample_{written:04d}")
            os.makedirs(sample_dir, exist_ok=True)
            _to_pil(images[i]).save(os.path.join(sample_dir, "original.png"))
            _to_pil(masked[i]).save(os.path.join(sample_dir, "masked.png"))
            if "t2i_logits" in out_recon and out_recon["t2i_logits"] is not None:
                recon = np.asarray(out_recon["t2i_logits"][i])
                _to_pil(recon).save(os.path.join(sample_dir, "reconstruction.png"))

            lines = []
            if "mlm_logits" in out_mlm and out_mlm["mlm_logits"] is not None:
                mlm_labels = np.asarray(batch["mlm_labels"][i])
                preds = np.asarray(jnp.argmax(out_mlm["mlm_logits"][i], axis=-1))
                masked_pos = np.nonzero(mlm_labels != -1)[0]
                for p in masked_pos:
                    want = tokenizer.convert_ids_to_tokens([int(mlm_labels[p])])[0]
                    got = tokenizer.convert_ids_to_tokens([int(preds[p])])[0]
                    mark = "OK " if want == got else "BAD"
                    lines.append(f"[{mark}] pos {p:3d}: label={want!r} pred={got!r}")
            if "itm_logits" in out_mlm and out_mlm["itm_logits"] is not None:
                logits = np.asarray(out_mlm["itm_logits"][i]).reshape(-1)
                prob = float(np.exp(logits[1]) / np.exp(logits).sum())
                label = int(np.asarray(batch["itm_labels"][i]).reshape(()))
                lines.append(f"ITM: p(match)={prob:.4f} label={label}")
            with open(os.path.join(sample_dir, "predictions.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")
            written += 1
    return written
