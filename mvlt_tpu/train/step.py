"""Jitted train / eval steps.

The reference's hot loop (engine_grid_masking.py:27-150) alternates input
images by step parity — even steps feed clean images, odd steps feed
grid-masked images (engine_grid_masking.py:72-78) — and computes *every*
enabled loss on whichever forward ran.  Here that alternation is a traced
``jnp.where`` on the step counter, so one compiled graph covers both
parities (no retrace, no host branching).

Behavioral cleanup (documented per SURVEY.md §3.5): when t2i is disabled the
reference's odd steps reuse stale outputs, effectively double-training each
even batch; here the clean image is used on every step instead (CLS
fine-tuning trains each batch exactly once — metric-equivalent, strictly
less wasted compute).

DP/TP note: there is no explicit pmean anywhere.  Under ``jax.jit`` with the
batch sharded over the ``data`` axis and params replicated (or
model-sharded), XLA's SPMD partitioner inserts the gradient all-reduce
itself — this replaces DDP's NCCL hook (main_vl.py:298-302).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from mvlt_tpu.config import ModelConfig
from mvlt_tpu.train.losses import compute_losses, mlm_gather_plan
from mvlt_tpu.train.state import TrainState


def make_train_step(model, cfg: ModelConfig, donate: bool = True,
                    device_masks: bool = False, mask_ratio: float = 0.5,
                    mask_patch_size: int = 16,
                    train_mode: bool = True,
                    scan_steps: int = 1,
                    grad_accum: int = 1) -> Callable[[TrainState, Dict, jax.Array], Tuple[TrainState, Dict]]:
    """Build the jitted pre-training/fine-tuning step.

    device_masks=True generates the grid masks ON DEVICE and applies the
    1e-6 fill inside the step (mvlt_tpu/data/masks.py:device_grid_masks) —
    the host batch then needs no ``masked_images`` tensor, halving image
    H2D traffic.  Metric-equivalent for training (train masks are random
    either way; validation keeps the precomputed host masks for
    reproducibility, mcloader/fashion_gen.py:170-174).

    train_mode=False reproduces the reference's fine-tune quirk
    (main_vl.py:435, set_training_mode=args.finetune==''): when initializing
    from a checkpoint the model trains in eval mode — dropout and drop-path
    OFF — which is metric-relevant for the published M-CR/S-CR results.
    Gradients still flow; only the stochastic regularizers are disabled.

    scan_steps=k>1 returns a MULTI-STEP dispatch: the jitted fn takes a
    stacked batch (every tensor with a leading [k] axis, see
    DataLoader(stack_steps=k)) and lax.scans the single-step body k times
    on device, returning per-sub-step metrics stacked [k].  Numerically
    identical to k single dispatches (the per-step RNG folds in
    ``state.step``, which advances inside the scan), but pays the host's
    per-dispatch cost once per k steps — on a 1-core host that overhead
    measured ~4 ms/step (CLAUDE.md; tools/bench_train_ablate.py vs
    tools/bench_train_step.py).  No reference analogue: torch's eager
    dispatch can't amortize this way.

    grad_accum=k>1 splits each global batch into k sequential microbatches
    inside the step (lax.scan): gradients average, BN stats thread
    through, the parity alternation and LR step stay per OPTIMIZER step.
    Peak activation memory drops ~k-fold for the same effective batch —
    the lever for growing the reference's world batch (128/device default,
    main_vl.py:31, with lr linearly scaled by world batch / 512,
    main_vl.py:306) beyond what activations allow per chip.  Loss means are
    averages of per-microbatch means (exact for the sample-mean losses;
    the MLM mean renormalizes per microbatch label count, standard
    grad-accumulation semantics).  Composes with scan_steps.
    """

    use_masked_input = cfg.loss_type.t2i  # reference alternation only matters when t2i on

    def _forward_backward(params, batch_stats, step, batch, mb_rng):
        """Grads + losses + new BN stats for one (micro)batch.  ``step`` is
        the OPTIMIZER step (the parity alternation is per optimizer step, so
        every microbatch of a step shares it)."""
        if use_masked_input:
            images = batch["images"].astype(jnp.float32)

            def _masked_images():
                # computed INSIDE the cond branch so even steps skip the
                # mask generation / fill entirely
                if device_masks:
                    from mvlt_tpu.data.masks import (device_apply_mask,
                                                     device_grid_masks)

                    mask_rng = jax.random.fold_in(mb_rng, 1)
                    masks = device_grid_masks(
                        mask_rng, images.shape[0], images.shape[1],
                        mask_ratio, mask_patch_size)
                    return device_apply_mask(images, masks)
                return batch["masked_images"].astype(jnp.float32)

            is_odd = (step % 2 == 1)
            # lax.cond, not jnp.where: a traced-scalar select still reads
            # BOTH [B,256,256,3] fp32 tensors (2x ~118 MB @ B=150) and
            # writes a third every step; cond runs only the taken branch.
            images_in = jax.lax.cond(is_odd, _masked_images, lambda: images)
        else:
            images_in = batch["images"].astype(jnp.float32)

        # Pre-transform MLM row gather: compute the static-capacity gather
        # plan from the labels and hand the row indices to the model, so the
        # MLM head adapter + BertHeadTransform run only on the ~capacity
        # labeled rows (losses.mlm_gather_plan).  The loss then scores the
        # already-gathered [1, capacity, H] hidden against the plan's labels
        # (capacity_frac=1.0 → plain chunked decode, no second gather).
        apply_kwargs = {}
        loss_batch = batch
        mlm_chunk = max(cfg.mlm_loss_chunk, 1)
        mlm_frac = cfg.mlm_capacity_frac
        if (cfg.loss_type.mlm and train_mode and cfg.mlm_loss_chunk > 0
                and cfg.mlm_capacity_frac < 1.0):
            plan = mlm_gather_plan(batch["mlm_labels"],
                                   capacity_frac=cfg.mlm_capacity_frac,
                                   chunk=mlm_chunk)
            if plan is not None:
                idx, sel_labs, mlm_chunk = plan
                apply_kwargs["mlm_row_idx"] = idx
                loss_batch = {**batch, "mlm_labels": sel_labs[None]}
                mlm_frac = 1.0

        def loss_fn(params):
            variables = {"params": params}
            has_bn = bool(batch_stats)
            if has_bn:
                variables["batch_stats"] = batch_stats
            out = model.apply(
                variables, images_in, batch["input_ids"], train=train_mode,
                mutable=["batch_stats"] if has_bn else False,
                rngs={"dropout": mb_rng}, **apply_kwargs,
            )
            if has_bn:
                out, new_model_state = out
                new_batch_stats = new_model_state["batch_stats"]
            else:
                new_batch_stats = batch_stats
            losses = compute_losses(out, loss_batch, cfg.num_super_classes,
                                    cfg.num_sub_classes,
                                    mlm_chunk=mlm_chunk,
                                    mlm_capacity_frac=mlm_frac,
                                    mlm_ce_kernel=cfg.mlm_ce_kernel)
            return losses["total_loss"], (losses, new_batch_stats)

        grads, (losses, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(params)
        return grads, losses, new_batch_stats

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(rng, state.step)

        if grad_accum == 1:
            grads, losses, new_batch_stats = _forward_backward(
                state.params, state.batch_stats, state.step, batch, step_rng)
        else:
            # split the global batch into grad_accum sequential microbatches:
            # grads/losses average (equal microbatch sizes), BN stats thread
            # sequentially (torch grad-accumulation semantics).  Peak HBM is
            # one microbatch's activations + one param-sized grad buffer.
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((grad_accum, x.shape[0] // grad_accum)
                                    + x.shape[1:]), batch)

            def body(carry, idx_mb):
                g_acc, bs = carry
                i, mb = idx_mb
                g, losses, bs = _forward_backward(
                    state.params, bs, state.step, mb,
                    jax.random.fold_in(step_rng, i))
                g_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b / grad_accum, g_acc, g)
                return (g_acc, bs), losses

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, new_batch_stats), losses = jax.lax.scan(
                body, (zeros, state.batch_stats),
                (jnp.arange(grad_accum), micro))
            losses = jax.tree_util.tree_map(lambda l: l.mean(0), losses)

        new_state = state.apply_gradients(grads).replace(batch_stats=new_batch_stats)
        return new_state, losses

    if scan_steps > 1:
        def train_scan(state: TrainState, batches: Dict[str, jnp.ndarray],
                       rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
            return jax.lax.scan(
                lambda st, b: train_step(st, b, rng), state, batches)

        return jax.jit(train_scan, donate_argnums=(0,) if donate else ())

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, cfg: ModelConfig) -> Callable[[TrainState, Dict], Dict[str, Any]]:
    """One eval forward returning the logits dict (no grad, running BN stats).

    The VL eval protocol (engine_grid_masking.py:153-333) runs three forwards
    per batch — masked-text for MLM, clean for ITM/CLS, masked-image for T2I.
    The engine layer composes them from this single-forward step so each
    variant shares the compiled graph.
    """

    def eval_step(state: TrainState, images: jnp.ndarray,
                  input_ids: jnp.ndarray) -> Dict[str, Any]:
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(variables, images.astype(jnp.float32), input_ids, train=False)
        return {k: v for k, v in out.items() if v is not None}

    return jax.jit(eval_step)
