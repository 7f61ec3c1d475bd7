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
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from mvlt_tpu.config import RunConfig, config_to_dict


def _state_pytree(state) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def resolve_checkpoint_path(path: str, root: Optional[str] = None) -> str:
    """Resolve a user-supplied checkpoint reference to an orbax directory.

    Accepts: a checkpoint dir itself, an output dir containing
    ``checkpoint/{best,last}``, or a bare tag (``last``/``best``) relative
    to ``root``.  Mirrors the reference's tolerance for pointing --resume
    at a run directory (main_vl.py:327-346)."""
    cand = path
    if root and not os.path.exists(cand) and not os.path.isabs(cand):
        cand = os.path.join(root, path)
    p = os.path.abspath(cand)
    if os.path.isdir(p) and not os.path.exists(os.path.join(p, "_METADATA")):
        for sub in ("checkpoint/best", "checkpoint/last", "best", "last"):
            if os.path.exists(os.path.join(p, sub, "_METADATA")):
                return os.path.join(p, sub)
    return p


_MISSING = object()


def merge_params_by_path(params_template, restored,
                         verbose: bool = True) -> Tuple[Any, Dict[str, list]]:
    """Intersect-by-path merge with shape filtering.

    The reference's finetune load (main_vl.py:284-290) copies checkpoint
    tensors onto the fresh model, dropping any key whose shape mismatches
    (pre-train mlm/itm/t2i heads vs fine-tune cls heads).  Same semantics
    here, plus path filtering: checkpoint-only paths are dropped,
    template-only paths keep their fresh init.  Leaves are cast to the
    template leaf's dtype."""
    report: Dict[str, list] = {"loaded": [], "skipped_shape": [], "missing": [], "dropped": []}

    def walk(tmpl, rest, path):
        if isinstance(tmpl, Mapping):
            rest_map = rest if isinstance(rest, Mapping) else {}
            for k in rest_map:
                if k not in tmpl:
                    report["dropped"].append("/".join(path + (k,)))
            return {k: walk(v, rest_map.get(k, _MISSING), path + (k,))
                    for k, v in tmpl.items()}
        if rest is _MISSING or rest is None or isinstance(rest, Mapping):
            report["missing"].append("/".join(path))
            return tmpl
        t, r = np.asarray(tmpl), np.asarray(rest)
        if r.shape != t.shape:
            report["skipped_shape"].append(
                f"{'/'.join(path)}: ckpt {r.shape} vs model {t.shape}")
            return tmpl
        report["loaded"].append("/".join(path))
        return r.astype(t.dtype)

    merged = walk(params_template, restored, ())
    if verbose:
        print(f"param merge: {len(report['loaded'])} loaded, "
              f"{len(report['skipped_shape'])} shape-filtered, "
              f"{len(report['missing'])} kept at init, "
              f"{len(report['dropped'])} checkpoint-only dropped", flush=True)
    return merged, report


class CheckpointManager:
    """Orbax-backed two-phase checkpointing.

    Saves are ASYNC: ``save_epoch`` returns once the state is copied off
    device (so donated training buffers can't race the fetch) and the
    disk serialization overlaps the next epoch's compute.  The JSON meta
    sidecar is written by a watcher thread the moment the data commits —
    never before (a crash mid-serialization can't leave a meta file
    pointing at a torn checkpoint) and never a whole epoch late (a crash
    during the NEXT epoch still resumes at the epoch just saved).
    ``wait()`` runs before any subsequent save/restore, surfaces async
    save errors, and must be called once when training finishes (cli.py
    does)."""

    def __init__(self, output_dir: str, cfg: Optional[RunConfig] = None):
        import threading

        self.root = os.path.abspath(os.path.join(output_dir, "checkpoint"))
        os.makedirs(self.root, exist_ok=True)
        self.cfg = cfg
        self.best_score = float("-inf")
        self._ckptr = ocp.StandardCheckpointer()
        self._pending_meta: list = []
        self._meta_lock = threading.Lock()
        self._watcher: Optional[threading.Thread] = None
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
        import threading

        # a prior async save to this dir must land before force-overwriting
        self.wait()
        self._ckptr.save(self._path(tag), _state_pytree(state), force=True)
        with self._meta_lock:
            self._pending_meta.append((tag, epoch, score))
        # watcher: write the meta as soon as the data commits (a failed
        # save leaves the meta unwritten; the error re-raises in wait())
        self._watcher = threading.Thread(target=self._flush_on_commit,
                                         daemon=True)
        self._watcher.start()

    def _flush_on_commit(self) -> None:
        try:
            self._ckptr.wait_until_finished()
        except Exception:
            return  # meta stays unwritten; wait() surfaces the error
        self._flush_meta()

    def _flush_meta(self) -> None:
        with self._meta_lock:
            pending, self._pending_meta = self._pending_meta, []
        for tag, epoch, score in pending:
            self._write_meta(tag, epoch, score)

    def wait(self) -> None:
        """Block until in-flight async saves land (re-raising their
        errors); any meta the watcher hasn't flushed yet is written here."""
        if self._watcher is not None:
            self._watcher.join()
            self._watcher = None
        self._ckptr.wait_until_finished()  # no-op on success; raises errors
        self._flush_meta()

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

    def restore(self, state, tag_or_path: str = "last"):
        """Restore into the (template-shaped) TrainState from a tag in this
        run's checkpoint dir or an explicit path to another run/checkpoint
        (--resume <path>, main_vl.py:327-346).  Raises loudly if the target
        is missing instead of silently restarting from scratch."""
        self.wait()
        path = resolve_checkpoint_path(tag_or_path, self.root)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"resume target not found: {tag_or_path!r} (resolved to {path})")
        template = _state_pytree(state)
        restored = self._ckptr.restore(path, template)
        meta = {}
        if os.path.exists(path + ".json"):
            with open(path + ".json") as f:
                meta = json.load(f)
        new_state = state.replace(
            step=restored["step"], params=restored["params"],
            batch_stats=restored["batch_stats"], opt_state=restored["opt_state"])
        return new_state, int(meta.get("epoch", -1)) + 1

    def restore_params_only(self, params_template, tag_or_path: str):
        """Finetune-style load: model weights only, intersected by path with
        shape filtering (main_vl.py:284-290 semantics).  Template-free
        restore, so the checkpoint's opt_state / batch_stats / head shapes
        never have to match the fine-tune model's tree."""
        self.wait()
        path = resolve_checkpoint_path(tag_or_path, self.root)
        restored = self._ckptr.restore(path)
        params = restored.get("params", restored)
        merged, report = merge_params_by_path(params_template, params)
        if not report["loaded"]:
            raise ValueError(
                f"finetune init from {tag_or_path}: no checkpoint tensor "
                f"matched the model tree")
        return merged
