"""Training engine: the epoch loop.

The capability of the reference's train_one_epoch_vl
(engine_grid_masking.py:27-150) + the orchestrator's epoch loop
(main_vl.py:422-503), TPU-style:

  * the loss alternation and BN-stat updates live inside ONE jitted step
    (mvlt_tpu/train/step.py);
  * per-step scalars come back as a small device dict; fetching is
    asynchronous — the engine only blocks on the previous step's metrics,
    so host logging overlaps device compute;
  * NaN handling mirrors the reference's warn-don't-abort semantics
    (engine_grid_masking.py:116-120) with a correct message;
  * metric sync across replicas is unnecessary: the loss means are computed
    over the globally-sharded batch under pjit.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable

import jax
import numpy as np

from mvlt_tpu.utils.logging import MetricLogger


def train_one_epoch(train_step, state, loader: Iterable, rng,
                    epoch: int, lr_schedule=None, log_every: int = 10,
                    is_main: bool = True, steps_per_dispatch: int = 1):
    """Run one epoch; returns (state, stats dict of global averages).

    steps_per_dispatch=k>1 expects a multi-step ``train_step``
    (make_train_step(scan_steps=k)) fed by a stacking loader
    (DataLoader(stack_steps=k)): each iteration dispatches k optimizer steps
    as one device program and drains k per-step metric rows."""
    logger = MetricLogger(is_main=is_main)
    pending = None  # (step_idx, device metrics) — fetched one step late
    # step index is tracked host-side: fetching int(state.step) each
    # iteration would block on the just-dispatched step, serializing
    # dispatch on this 1-core host (the benched pattern is donate +
    # pipelined dispatch, tools/bench_train_step.py).  One blocking fetch
    # before the loop only syncs on restore/init.
    step_idx = int(state.step)

    for batch in logger.log_every(loader, log_every, header=f"Epoch [{epoch}]"):
        feed = {k: v for k, v in batch.items() if not isinstance(v, list)}
        state, metrics = train_step(state, feed, rng)

        if pending is not None:
            _drain(pending, logger, lr_schedule, steps_per_dispatch)
        pending = (step_idx, metrics)
        step_idx += steps_per_dispatch

    if pending is not None:
        _drain(pending, logger, lr_schedule, steps_per_dispatch)
    logger.synchronize_between_processes()  # multi-host meter reduction
    stats = logger.global_averages()
    if is_main:
        print(f"epoch {epoch} averaged stats:", {k: round(v, 5) for k, v in stats.items()},
              flush=True)
    return state, stats


def _drain(pending, logger: MetricLogger, lr_schedule,
           steps_per_dispatch: int = 1) -> None:
    step_idx, metrics = pending
    fetched = jax.device_get(metrics)
    rows = ([{k: float(v) for k, v in fetched.items()}]
            if steps_per_dispatch == 1 else
            [{k: float(v[i]) for k, v in fetched.items()}
             for i in range(steps_per_dispatch)])
    for i, host in enumerate(rows):
        total = host.get("total_loss", 0.0)
        if not math.isfinite(total):
            parts = " | ".join(f"{k}={v:.4f}" for k, v in host.items())
            print(f"[warning] non-finite total loss at step {step_idx + i}: {parts} "
                  f"— continuing (reference semantics: warn, don't abort)", flush=True)
        logger.update(**host)
    if lr_schedule is not None:
        logger.update(lr=float(lr_schedule(step_idx + len(rows) - 1)))
