"""Device mesh construction — the TPU-native replacement for the reference's
NCCL process-group bring-up (libs/utils.py:189-254).

The reference's distribution model is one process per GPU, env-var rank
discovery, and ``init_process_group(backend='nccl')``.  On TPU the analogue
is a single SPMD program over a `jax.sharding.Mesh`:

  * axis ``data``  — batch (data-parallel); gradient psum rides ICI.
  * axis ``model`` — tensor-parallel (megatron-style column/row sharding of
    the MLP/attention projections and vocab sharding of the MLM decoder).

For multi-host (multi-slice) deployments, `jax.distributed.initialize()` is
called once before mesh construction; the data axis is laid out so that
intra-slice reduction happens over ICI before any DCN hop (device order from
`mesh_utils.create_device_mesh` handles this).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> None:
    """Multi-host bring-up: the TPU equivalent of the reference's
    init_distributed_mode / init_distributed_mode_on_pai rank discovery
    (libs/utils.py:189-254).  Supports:
      * MVLT_MULTIHOST=1 with TPU auto-discovery (GCE metadata), or
      * explicit env rank discovery (COORDINATOR_ADDRESS / NUM_PROCESSES /
        PROCESS_ID — the moral analogue of RANK/WORLD_SIZE/MASTER_ADDR).
    No-op when single-host or already initialized.
    """
    coord = os.environ.get("COORDINATOR_ADDRESS")
    if coord:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["NUM_PROCESSES"]),
                process_id=int(os.environ["PROCESS_ID"]),
            )
        except KeyError as e:
            raise RuntimeError(
                f"COORDINATOR_ADDRESS is set but {e} is missing — explicit "
                f"rank discovery needs NUM_PROCESSES and PROCESS_ID") from e
        except RuntimeError as e:
            if "already initialized" not in str(e):
                raise
            print(f"distributed init skipped: {e}", flush=True)
    elif os.environ.get("MVLT_MULTIHOST", "0") == "1":
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            # tolerate re-init only; surface real bring-up failures
            if "already initialized" not in str(e):
                raise
            print(f"distributed init skipped: {e}", flush=True)


def make_hybrid_mesh(tp_size: int = 1, n_slices: Optional[int] = None,
                     devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Multi-slice mesh: the data axis spans slices over DCN while the
    model axis stays inside a slice on ICI (megatron-style weights must
    never cross the slow link).

    On real multi-slice TPU topologies (devices expose ``slice_index``)
    this uses mesh_utils.create_hybrid_device_mesh with one data group per
    slice.  ``n_slices`` overrides autodetection; when the devices carry no
    slice topology (CPU test meshes) the slice structure is simulated by
    slice-major device order — model groups never straddle a simulated
    slice boundary, so shardings compile identically to the real layout.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_slices is None:
        n_slices = max(1, getattr(devices[0], "num_slices", 1))
    if len(devices) % n_slices:
        raise ValueError(f"{len(devices)} devices not divisible by {n_slices} slices")
    per_slice = len(devices) // n_slices
    if per_slice % tp_size:
        raise ValueError(f"{per_slice} per-slice devices not divisible by tp={tp_size}")
    if getattr(devices[0], "slice_index", None) is not None:
        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_slice // tp_size, tp_size),
            dcn_mesh_shape=(n_slices, 1),
            devices=devices,
        )
    else:
        # slice-major layout: data axis = [slice0-dp..., slice1-dp...], so
        # each model row (tp group) lives inside one simulated slice
        mesh_devices = np.asarray(devices).reshape(
            n_slices * (per_slice // tp_size), tp_size)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def make_mesh(dp_size: int = -1, tp_size: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh.

    dp_size == -1 means "all remaining devices on the data axis".
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp_size == -1:
        if n % tp_size:
            raise ValueError(f"{n} devices not divisible by tp_size={tp_size}")
        dp_size = n // tp_size
    if dp_size * tp_size != n:
        raise ValueError(f"dp({dp_size}) * tp({tp_size}) != device count ({n})")
    if n > 1:
        try:
            mesh_devices = mesh_utils.create_device_mesh((dp_size, tp_size), devices=devices)
        except (ValueError, AssertionError):
            mesh_devices = np.asarray(devices).reshape(dp_size, tp_size)
    else:
        mesh_devices = np.asarray(devices).reshape(1, 1)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))
