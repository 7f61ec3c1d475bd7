"""Input pipeline: threaded batch assembly + device prefetch.

The TPU-native replacement for the reference's DataLoader(+pin_memory,
non_blocking H2D copies) and its CUDA-streams prefetcher
(mcloader/data_prefetcher.py): a worker thread pool decodes/tokenizes items,
an assembly thread collates batches, and a prefetch queue keeps
``prefetch_depth`` batches already transferred to device (sharded over the
mesh's data axis) so the TPU never waits on the host.

jax transfers are async by nature — ``jax.device_put`` returns immediately —
so double-buffering is just a bounded queue of already-device_put batches.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np


def collate(items) -> Dict[str, np.ndarray]:
    """Stack a list of item dicts into batch arrays (non-array values are
    collected into lists, e.g. info_list)."""
    out: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], (np.ndarray, np.generic, int, float)):
            out[key] = np.stack([np.asarray(v) for v in vals])
        else:
            out[key] = vals
    return out


def _stack_group(group) -> Dict[str, Any]:
    """Stack k collated batches on a new leading [k] axis (tensors); collect
    non-tensor values (info lists) into k-lists."""
    out: Dict[str, Any] = {}
    for key in group[0]:
        vals = [b[key] for b in group]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Iterable over device-ready batches.

    Args:
      dataset: map-style dataset (``__len__`` / ``__getitem__``).
      sampler: index sampler with ``set_epoch`` (mvlt_tpu/data/samplers.py).
      batch_size: per-host batch size.
      put_fn: host batch -> device batch (e.g. ``partial(shard_batch, mesh)``);
        None keeps batches on host.
      num_workers: decode threads (PIL/pickle release the GIL on I/O).
      drop_last: drop the trailing partial batch (True for training — static
        shapes mean no retrace).
      drop_keys: batch keys removed host-side before put_fn — the H2D lever
        behind --device-masks (the step regenerates masks on device, so
        shipping ``masked_images`` would pay the transfer the flag exists to
        eliminate) and for emitted-but-unconsumed labels (``t2i_labels``:
        the loss compares against the full image, reference
        engine_grid_masking.py:98-102).
      stack_steps: k>1 groups k consecutive batches and emits ONE item with
        every tensor stacked on a leading [k] axis (non-tensor values become
        k-lists), for the multi-step scan dispatch
        (make_train_step(scan_steps=k)).  Trailing partial groups are
        dropped (static shapes).  put_fn then receives [k, B, ...] — shard
        with ``stacked=True`` (parallel/sharding.shard_batch).
    """

    def __init__(self, dataset, sampler, batch_size: int,
                 put_fn: Optional[Callable] = None, num_workers: int = 4,
                 prefetch_depth: int = 2, drop_last: bool = True,
                 drop_keys: tuple = (), stack_steps: int = 1):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.put_fn = put_fn
        self.num_workers = max(1, num_workers)
        self.prefetch_depth = max(1, prefetch_depth)
        self.drop_last = drop_last
        self.drop_keys = tuple(drop_keys)
        self.stack_steps = max(1, stack_steps)

    def set_epoch(self, epoch: int) -> None:
        self.sampler.set_epoch(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.sampler)
        n = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        return n // self.stack_steps if self.stack_steps > 1 else n

    def __iter__(self) -> Iterator[Any]:
        indices = list(self.sampler)
        if self.drop_last:
            indices = indices[: len(indices) // self.batch_size * self.batch_size]

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch_depth)
        _SENTINEL = object()
        err_holder = []

        def produce():
            try:
                group = []
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for start in range(0, len(indices), self.batch_size):
                        chunk = indices[start: start + self.batch_size]
                        items = list(pool.map(self.dataset.__getitem__, chunk))
                        batch = collate(items)
                        for key in self.drop_keys:
                            batch.pop(key, None)
                        if self.stack_steps > 1:
                            group.append(batch)
                            if len(group) < self.stack_steps:
                                continue
                            batch = _stack_group(group)
                            group = []
                        if self.put_fn is not None:
                            batch = self.put_fn(batch)
                        out_q.put(batch)
            except BaseException as e:  # propagate into consumer
                err_holder.append(e)
            finally:
                out_q.put(_SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()

        while True:
            item = out_q.get()
            if item is _SENTINEL:
                if err_holder:
                    raise err_holder[0]
                return
            yield item


def host_to_device_prefetch(iterator: Iterator, put_fn: Callable, depth: int = 2):
    """Wrap any host-batch iterator with a device-transfer prefetch queue."""
    it = iter(iterator)
    buf = []
    for _ in range(depth):
        try:
            buf.append(put_fn(next(it)))
        except StopIteration:
            break
    while buf:
        nxt = buf.pop(0)
        try:
            buf.append(put_fn(next(it)))
        except StopIteration:
            pass
        yield nxt
