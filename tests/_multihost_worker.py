"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Run as: python tests/_multihost_worker.py  with env
COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID set (the explicit rank
discovery path of mvlt_tpu.parallel.mesh.maybe_init_distributed — the
TPU analogue of the reference's RANK/WORLD_SIZE/MASTER_ADDR bring-up,
libs/utils.py:189-254).

Covers, across real process boundaries:
  * maybe_init_distributed (explicit env rank discovery)
  * shard_batch's make_array_from_process_local_data branch
  * SmoothedValue.synchronize_between_processes (multihost allgather)
  * a jitted global-mean reduction over the assembled array
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    from mvlt_tpu.parallel.mesh import make_mesh, maybe_init_distributed
    from mvlt_tpu.parallel.sharding import shard_batch
    from mvlt_tpu.utils.logging import SmoothedValue

    maybe_init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    rank = jax.process_index()
    assert len(jax.devices()) == 4  # 2 local per process

    mesh = make_mesh(dp_size=4, tp_size=1)

    # each host holds its slice of the global batch: rank 0 -> rows 0..3,
    # rank 1 -> rows 4..7 (value = global row index)
    local = np.arange(4 * rank, 4 * (rank + 1), dtype=np.float32)
    batch = {"x": np.repeat(local[:, None], 3, axis=1)}
    global_batch = shard_batch(mesh, batch)
    assert global_batch["x"].shape == (8, 3), global_batch["x"].shape

    total = jax.jit(lambda b: b["x"].sum())(global_batch)
    expect = float(np.arange(8).sum() * 3)
    assert float(total) == expect, (float(total), expect)

    # stacked multi-step group: [k, B_local, ...] assembles to
    # [k, B_global, ...] with the data axis on dim 1 (the
    # --steps-per-dispatch loader contract, shard_batch(stacked=True))
    stacked = {"x": np.stack([batch["x"], batch["x"] + 100.0])}
    g2 = shard_batch(mesh, stacked, stacked=True)
    assert g2["x"].shape == (2, 8, 3), g2["x"].shape
    tot2 = jax.jit(lambda b: b["x"].sum(axis=(1, 2)))(g2)
    want0 = float(np.arange(8).sum() * 3)
    assert np.allclose(np.asarray(tot2), [want0, want0 + 100.0 * 24]), tot2

    meter = SmoothedValue()
    meter.update(float(rank + 1), n=2)      # r0: (2, 2.0); r1: (2, 4.0)
    meter.synchronize_between_processes()
    assert meter.count == 4, meter.count
    assert abs(meter.global_avg - 1.5) < 1e-9, meter.global_avg

    print(f"MULTIHOST_WORKER_OK rank={rank}", flush=True)


if __name__ == "__main__":
    main()
