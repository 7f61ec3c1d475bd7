"""LR schedule and optimizer construction.

Reference recipe (main_vl.py:306-311): linear scaling
``lr <- lr * batch_size * world_size / 512``, timm ``create_optimizer``
(adamw, weight decay skipped for bias/1-D params) and timm cosine schedule
with warmup (warmup_lr 1e-6, min_lr 1e-5, warmup_epochs 5 defaults,
main_vl.py:68-100).

The timm scheduler steps per *epoch*; here the schedule is per-step (smooth
cosine over total steps with linear warmup) — metric-equivalent and the
standard JAX formulation (one optax schedule, no host-side mutation).
"""

from __future__ import annotations

import optax

from mvlt_tpu.config import OptimConfig


def scaled_base_lr(cfg: OptimConfig, global_batch_size: int) -> float:
    """Linear LR scaling rule (main_vl.py:306)."""
    return cfg.lr * global_batch_size / cfg.lr_batch_denom


def make_lr_schedule(cfg: OptimConfig, global_batch_size: int,
                     steps_per_epoch: int) -> optax.Schedule:
    base_lr = scaled_base_lr(cfg, global_batch_size)
    warmup_steps = max(1, cfg.warmup_epochs * steps_per_epoch)
    total_steps = max(warmup_steps + 1, cfg.epochs * steps_per_epoch)
    return optax.warmup_cosine_decay_schedule(
        init_value=cfg.warmup_lr,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=cfg.min_lr,
    )


def _decay_mask(params) -> dict:
    """timm add_weight_decay semantics: no decay for 1-D params (biases,
    LayerNorm/BatchNorm scales).  Multi-dim params — including the 3-D
    positional embeddings, which the reference does decay — get decay."""
    import jax

    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def make_optimizer(cfg: OptimConfig, global_batch_size: int,
                   steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg, global_batch_size, steps_per_epoch)
    tx = optax.adamw(
        learning_rate=schedule,
        b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
        weight_decay=cfg.weight_decay,
        mask=_decay_mask,
    )
    if cfg.clip_grad:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_grad), tx)
    return tx
