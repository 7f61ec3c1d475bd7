"""Sharding rules: how parameters, optimizer state and batches lay out on
the (data, model) mesh.

Replaces the reference's DDP wrap + NCCL gradient all-reduce
(main_vl.py:298-302) with GSPMD: the batch is sharded over ``data``, matmul
weights of the transformer are megatron-sharded over ``model``, everything
else is replicated.  Under ``jax.jit`` with these shardings, XLA inserts the
gradient psum (data axis) and the TP collectives (model axis) automatically,
riding ICI.

TP rules (column/row pairs so activations stay sharded between them):
  * attention q/kv kernels, MLP fc1         -> output-dim sharded (column)
  * attention proj, MLP fc2                 -> input-dim sharded (row)
  * BERT word-embedding table + MLM bias    -> vocab-dim sharded (the 30522-
    wide MLM logits are the single biggest tensor in the step; sharding the
    vocab dim keeps the [B,T,vocab] logits distributed through the loss)

Rules silently fall back to replication when a dim is not divisible by the
model-axis size, so tp_size=1 (pure DP) is always valid.

Sequence parallelism (the CP/SP stretch axis, SURVEY.md §2c): PVLT's SRA
attention is row-parallel in the query/token dim once the (tiny) KV is
replicated, so SP is expressed as an activation sharding constraint on the
joint token axis — see mvlt_tpu/models/pvlt.py (ModelConfig.sequence_parallel)
and sequence_sharding_constraint below.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvlt_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path regex, partition spec builder taking ndim) — first match wins.
_RULES = [
    # megatron column-parallel: shard output dim
    (re.compile(r"(attn/(q|kv)|mlp/fc1)/kernel$"), lambda nd: P(*([None] * (nd - 1) + [MODEL_AXIS]))),
    (re.compile(r"(attn/(q|kv)|mlp/fc1)/bias$"), lambda nd: P(MODEL_AXIS)),
    # megatron row-parallel: shard input dim
    (re.compile(r"(attn/proj|mlp/fc2)/kernel$"), lambda nd: P(*([MODEL_AXIS] + [None] * (nd - 1)))),
    # vocab-parallel embedding + tied MLM decoder bias
    (re.compile(r"word_embeddings/embedding$"), lambda nd: P(MODEL_AXIS, None)),
    (re.compile(r"mlm_head/bias$"), lambda nd: P(MODEL_AXIS)),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path_str: str, leaf, axis_sizes: Dict[str, int]) -> P:
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 0:
        return P()
    for rx, builder in _RULES:
        if rx.search(path_str):
            spec = builder(ndim)
            # divisibility guard: fall back to replication
            for dim, axis in zip(leaf.shape, spec):
                if axis is not None and dim % axis_sizes.get(axis, 1):
                    return P()
            return spec
    return P()


def _zero1_spec(spec: P, leaf, axis_sizes: Dict[str, int]) -> P:
    """Additionally shard the first unsharded divisible dim over ``data``
    (ZeRO-1: optimizer moments are partitioned across DP replicas)."""
    data = axis_sizes.get(DATA_AXIS, 1)
    ndim = getattr(leaf, "ndim", 0)
    if data <= 1 or ndim == 0:
        return spec
    axes = list(spec) + [None] * (ndim - len(spec))
    for i, (dim, ax) in enumerate(zip(leaf.shape, axes)):
        if ax is None and dim % data == 0:
            axes[i] = DATA_AXIS
            return P(*axes)
    return spec


def _tree_shardings(mesh: Mesh, tree: Any, zero1: bool = False) -> Any:
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def f(path, leaf):
        ps = _path_str(path)
        spec = _spec_for(ps, leaf, axis_sizes)
        if zero1 and "opt_state" in ps:
            spec = _zero1_spec(spec, leaf, axis_sizes)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(f, tree)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Pytree of NamedShardings matching ``params`` (works for any pytree
    whose leaf paths end in param names — params, or optax mu/nu)."""
    return _tree_shardings(mesh, params)


def state_shardings(mesh: Mesh, state: Any, zero1: bool = False) -> Any:
    """Shardings for a full TrainState (params + batch_stats + opt_state).

    Optimizer moments (mu/nu) mirror the param tree, so the same path rules
    apply — their leaf paths contain the param path as a suffix.

    zero1=True additionally partitions every optimizer-state leaf over the
    ``data`` axis (first unsharded divisible dim): the ZeRO-1 layout.
    Params stay replicated across DP; GSPMD turns the gradient all-reduce
    into reduce-scatter + sharded adamw update + param all-gather, cutting
    optimizer-state HBM by the DP degree.  Numerics are unchanged
    (tests/test_train_step.py::test_zero1_matches_single_device)."""
    return _tree_shardings(mesh, state, zero1=zero1)


def batch_sharding(mesh: Mesh, batch: Any, stacked: bool = False) -> Any:
    """Shard every batch tensor along its batch dim over ``data`` — the
    leading dim, or dim 1 when ``stacked`` (a [k, B, ...] multi-step group,
    data/pipeline.DataLoader(stack_steps=k))."""

    def f(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0 or (stacked and ndim == 1):
            return NamedSharding(mesh, P())
        if stacked:
            return NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    return jax.tree_util.tree_map(f, batch)


def shard_batch(mesh: Mesh, batch: Any, stacked: bool = False) -> Any:
    """Assemble a device batch with data-parallel sharding.

    Single-host: a plain device_put.  Multi-host SPMD: each host holds only
    its shard of the global batch (the samplers shard by process index), so
    the global array is assembled with make_array_from_process_local_data —
    the jax analogue of DDP's per-rank batches."""
    shardings = batch_sharding(mesh, batch, stacked=stacked)
    if jax.process_count() > 1:
        import numpy as np

        def assemble(leaf, sh):
            return jax.make_array_from_process_local_data(sh, np.asarray(leaf))

        return jax.tree_util.tree_map(assemble, batch, shardings)
    return jax.device_put(batch, shardings)


def sequence_sharding_constraint(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Sequence-parallel constraint for [B, N, C] activations: tokens over
    the model axis (batch stays on data).  A no-op when the model axis is
    trivial or N doesn't divide.  SRA attention tolerates this because Q
    rows are independent given the replicated (SRA-reduced) KV; GSPMD
    inserts the gathers for the KV path, and LayerNorm reductions stay
    local (they reduce over C, which is unsharded in SP regions)."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)
    if model_size <= 1 or x.ndim != 3 or x.shape[1] % model_size:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None)))
