"""Metric smoothing and periodic training-loop logging.

The capability of the reference's MetricLogger/SmoothedValue
(libs/utils.py:18-161): windowed meters, global averages, periodic
iter/eta/time/data lines, and cross-process metric reduction.

TPU-native differences:
  * cross-process sync is a jnp psum over the data axis *inside* the step
    (metrics come back already reduced), or — for host-side meters in a
    multi-process setup — `jax.experimental.multihost_utils`; there is no
    torch.distributed.all_reduce analogue to call here.
  * device memory telemetry uses jax.local_devices()[0].memory_stats().
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Iterator, Optional

import jax
import numpy as np


class SmoothedValue:
    """Track a series with a smoothing window + global average."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.window: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        value = float(value)
        self.window.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self) -> None:
        """Reduce [count, total] across hosts (libs/utils.py:36-47 did this
        with a dist.all_reduce; here jax multihost allgather + sum).  No-op
        in single-process runs."""
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            np.asarray([self.count, self.total], np.float64))
        summed = np.asarray(gathered).reshape(-1, 2).sum(axis=0)
        self.count = int(summed[0])
        self.total = float(summed[1])

    @property
    def median(self) -> float:
        return float(np.median(self.window)) if self.window else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.window)) if self.window else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.window) if self.window else 0.0

    @property
    def value(self) -> float:
        return self.window[-1] if self.window else 0.0

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


def _device_mem_mb() -> Optional[float]:
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / (1024.0 * 1024.0)
    except Exception:
        pass
    return None


class MetricLogger:
    def __init__(self, delimiter: str = "  ", is_main: bool = True):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.is_main = is_main

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def add_meter(self, name: str, meter: SmoothedValue) -> None:
        self.meters[name] = meter

    def __getattr__(self, name: str):
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def global_averages(self) -> Dict[str, float]:
        return {k: m.global_avg for k, m in self.meters.items()}

    def synchronize_between_processes(self) -> None:
        for m in self.meters.values():
            m.synchronize_between_processes()

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "") -> Iterator:
        """Yield items while printing progress every print_freq steps
        (iter count, ETA, per-meter stats, step/data timing, device mem)."""
        total = len(iterable) if hasattr(iterable, "__len__") else None
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        start = time.time()
        end = start
        for i, obj in enumerate(iterable):
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            end = time.time()
            if self.is_main and (i % print_freq == 0 or (total and i == total - 1)):
                if total:
                    eta = str(datetime.timedelta(seconds=int(iter_time.global_avg * (total - i))))
                    prefix = f"{header} [{i}/{total}] eta: {eta}"
                else:
                    prefix = f"{header} [{i}]"
                mem = _device_mem_mb()
                parts = [prefix, str(self), f"time: {iter_time}", f"data: {data_time}"]
                if mem is not None:
                    parts.append(f"mem: {mem:.0f}MB")
                print(self.delimiter.join(parts), flush=True)
        if self.is_main:
            elapsed = str(datetime.timedelta(seconds=int(time.time() - start)))
            print(f"{header} done in {elapsed}", flush=True)
