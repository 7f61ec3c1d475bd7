"""Profiling / tracing hooks.

The reference has no profiler — only wall-clock meters and CUDA max-mem in
MetricLogger (libs/utils.py:115-161; SURVEY.md §5).  This module adds the
TPU-native observability layer on top of the step-timing meters:

  * ``trace(dir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable XPlane trace (MXU utilization, HBM traffic,
    per-fusion timing);
  * ``annotate(name)`` — TraceAnnotation for host-side phases;
  * ``step_marker`` — StepTraceAnnotation so device steps group in the
    trace viewer;
  * ``device_memory_profile(path)`` — dump the current HBM allocation
    snapshot (pprof format).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed block when log_dir is set; no-op otherwise.

    Guarded against tunneled single-chip dev rigs: ``start_trace`` hangs
    over the axon TPU tunnel (CLAUDE.md), so tracing is skipped with a
    warning when the backend looks tunneled.  Real pods profile normally;
    set MVLT_FORCE_TRACE=1 to override the guard.
    """
    if not log_dir:
        yield
        return
    import os

    # the tunneled backend registers under the 'axon' plugin name while
    # still reporting platform 'tpu'; the registry name is the only signal
    try:
        from jax._src import xla_bridge

        tunneled = "axon" in xla_bridge._backends
    except Exception:
        tunneled = False
    if tunneled and os.environ.get("MVLT_FORCE_TRACE", "0") != "1":
        print(f"profiling: skipping device trace to {log_dir} — tunneled "
              f"backend detected (start_trace hangs over the tunnel; set "
              f"MVLT_FORCE_TRACE=1 to force)", flush=True)
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def step_marker(step: int):
    return jax.profiler.StepTraceAnnotation("train", step_num=step)


def device_memory_profile(path: str) -> None:
    with open(path, "wb") as f:
        f.write(jax.profiler.device_memory_profile())
