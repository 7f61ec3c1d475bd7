"""Train state: parameters, BatchNorm statistics, optimizer state, step.

A minimal flax.struct pytree (not flax.training.TrainState — we need the
batch_stats collection for the T2I decoder's BatchNorm, libs/vl_heads.py:152).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
        )


def create_train_state(model, tx, rng, sample_images, sample_ids) -> TrainState:
    variables = jax.jit(model.init)(rng, sample_images, sample_ids)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
