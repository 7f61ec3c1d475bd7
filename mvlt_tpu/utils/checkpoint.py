"""Checkpoint save / resume (Orbax).

Reference policy (main_vl.py:441-498): one rolling checkpoint containing
{model, optimizer, lr_scheduler, epoch, scaler, args}; saved every epoch for
the first 2/3 of training, then only when the summed eval quality score
(mlm+itm+sup+sub accuracy) improves.  Resume restores everything and
continues at epoch+1 (main_vl.py:327-346).

Here: Orbax pytree checkpoints under <output_dir>/checkpoint/{last,best},
with a JSON sidecar for epoch / best-score / config provenance (the config
copy replaces the reference's copy-the-config-file-into-the-rundir trick,
scripts_dws/dws_mvlt_exp21.sh:9).  The LR schedule is a pure function of
the step, so no scheduler state needs saving; bf16 needs no loss-scaler
state.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from mvlt_tpu.config import RunConfig, config_to_dict


def _state_pytree(state) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


class CheckpointManager:
    def __init__(self, output_dir: str, cfg: Optional[RunConfig] = None):
        self.root = os.path.abspath(os.path.join(output_dir, "checkpoint"))
        os.makedirs(self.root, exist_ok=True)
        self.cfg = cfg
        self.best_score = float("-inf")
        self._ckptr = ocp.StandardCheckpointer()
        meta = self._read_meta("best")
        if meta:
            self.best_score = meta.get("score", float("-inf"))

    # --- internals --------------------------------------------------------
    def _path(self, tag: str) -> str:
        return os.path.join(self.root, tag)

    def _read_meta(self, tag: str) -> Optional[dict]:
        p = self._path(tag) + ".json"
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def _write_meta(self, tag: str, epoch: int, score: Optional[float]) -> None:
        meta = {"epoch": epoch, "score": score}
        if self.cfg is not None:
            meta["config"] = config_to_dict(self.cfg)
        with open(self._path(tag) + ".json", "w") as f:
            json.dump(meta, f, indent=1)

    def _save(self, tag: str, state, epoch: int, score: Optional[float]) -> None:
        self._ckptr.save(self._path(tag), _state_pytree(state), force=True)
        self._ckptr.wait_until_finished()
        self._write_meta(tag, epoch, score)

    # --- public API --------------------------------------------------------
    def save_epoch(self, state, epoch: int, total_epochs: int,
                   quality_score: Optional[float] = None,
                   save_every_frac: float = 2.0 / 3.0) -> bool:
        """Apply the reference's two-phase policy.  Returns True if saved."""
        in_first_phase = epoch < int(total_epochs * save_every_frac)
        if in_first_phase:
            self._save("last", state, epoch, quality_score)
            return True
        if quality_score is not None and quality_score > self.best_score:
            self.best_score = quality_score
            self._save("best", state, epoch, quality_score)
            self._save("last", state, epoch, quality_score)
            return True
        self._save("last", state, epoch, quality_score)
        return False

    def restore(self, state, tag: str = "last"):
        """Restore into the (template) TrainState; returns (state, start_epoch)."""
        path = self._path(tag)
        if not os.path.exists(path):
            return state, 0
        template = _state_pytree(state)
        restored = self._ckptr.restore(path, template)
        meta = self._read_meta(tag) or {}
        new_state = state.replace(
            step=restored["step"], params=restored["params"],
            batch_stats=restored["batch_stats"], opt_state=restored["opt_state"])
        return new_state, int(meta.get("epoch", -1)) + 1

    def restore_params_only(self, params_template, tag_or_path: str):
        """Finetune-style load: model weights only, dropping head keys whose
        shapes mismatch the current model (main_vl.py:284-290 semantics)."""
        path = tag_or_path if os.path.isabs(tag_or_path) else self._path(tag_or_path)
        restored = self._ckptr.restore(
            path, {"step": 0, "params": params_template,
                   "batch_stats": None, "opt_state": None})
        return restored["params"]
