"""Pre-training / fine-tuning objectives.

The reference computes losses inline in the engine
(engine_grid_masking.py:81-102):
  * MLM:  CrossEntropy(ignore_index=-1) over [B*T, vocab], weight 1
  * ITM:  CrossEntropy over [B, 2], weight 1
  * CLS:  CrossEntropy over 48-way + 122-way heads, weight 1 each
  * T2I:  SmoothL1(beta=1) between the reconstructed pixels and the *clean*
          image, weight 10 (MLM_LOSS_WEIGHT/ITM_LOSS_WEIGHT/T2I_LOSS_WEIGHT
          at engine_grid_masking.py:23)

Everything here is pure-jnp and jit-safe; all reductions are means so values
are batch-size invariant (and DP-invariant under pjit, where each device
computes the mean over its shard and gradients psum naturally).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

MLM_LOSS_WEIGHT = 1.0
ITM_LOSS_WEIGHT = 1.0
T2I_LOSS_WEIGHT = 10.0
MLM_IGNORE_INDEX = -1


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: Optional[int] = None) -> jnp.ndarray:
    """Mean softmax cross entropy; positions equal to ignore_index are
    excluded from the mean (torch CrossEntropyLoss(ignore_index=...)
    semantics)."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    if ignore_index is not None:
        valid = labels != ignore_index
        safe_labels = jnp.where(valid, labels, 0)
        nll = -jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(valid.sum(), 1)
        return jnp.where(valid, nll, 0.0).sum() / denom
    nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    return nll.mean()


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """torch SmoothL1Loss with default beta=1 (mean reduction)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta).mean()


def chunked_mlm_loss(hidden: jnp.ndarray, table: jnp.ndarray, bias: jnp.ndarray,
                     labels: jnp.ndarray, chunk: int = 2048) -> jnp.ndarray:
    """MLM cross entropy without materializing the [B*T, vocab] logits.

    The full-vocab logits tensor is the HBM hog of the training step
    ([150,128,30522] fp32 ≈ 2.3 GB + its gradient — OOMs a 16 GB v5e chip).
    Instead, scan over row chunks of the transformed hidden states,
    recomputing each chunk's logits in the backward pass (jax.checkpoint),
    so peak memory is one [chunk, vocab] tile.

    hidden: [B, T, H] (output of BertHeadTransform); table: [vocab, H]
    (tied word embeddings); bias: [vocab]; labels: [B, T] with -1 ignore.
    Returns the same scalar as cross_entropy(logits, labels, ignore_index=-1).
    """
    h = hidden.shape[-1]
    rows = hidden.reshape(-1, h)
    labs = labels.reshape(-1)
    n = rows.shape[0]
    pad = (-n) % chunk
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        labs = jnp.pad(labs, (0, pad), constant_values=MLM_IGNORE_INDEX)
    rows = rows.reshape(-1, chunk, h)
    labs = labs.reshape(-1, chunk)

    @jax.checkpoint
    def chunk_fn(carry, xs):
        r, l = xs
        logits = jnp.einsum("ch,vh->cv", r, table.astype(r.dtype),
                            preferred_element_type=jnp.float32) + bias
        # nll = logsumexp(logits) - logits[label]: same value as
        # -log_softmax(logits)[label] but never materializes the second
        # [chunk, vocab] fp32 array (125 MB/chunk here), which the fwd AND
        # the remat recompute would each write+read back from HBM.
        m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1)) + m[:, 0]
        valid = l != MLM_IGNORE_INDEX
        safe = jnp.where(valid, l, 0)
        picked = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
        nll = lse - picked
        s, c = carry
        return (s + jnp.where(valid, nll, 0.0).sum(), c + valid.sum()), None

    (total, count), _ = jax.lax.scan(chunk_fn, (jnp.float32(0.0), jnp.int32(0)),
                                     (rows, labs))
    return total / jnp.maximum(count, 1)


def _mlm_decode_loss(hidden, table, bias, labels, chunk: int,
                     use_kernel: bool) -> jnp.ndarray:
    """Route the MLM decode: the fused vocab-tiled CE kernel
    (ops/mlm_ce.py — logits never materialized in HBM) on TPU when enabled,
    else the XLA chunked reference decode."""
    if use_kernel and jax.default_backend() == "tpu":
        from mvlt_tpu.ops.mlm_ce import fused_mlm_loss

        return fused_mlm_loss(hidden, table, bias, labels)
    return chunked_mlm_loss(hidden, table, bias, labels, chunk=chunk)


def mlm_gather_plan(labels: jnp.ndarray, capacity_frac: float = 0.25,
                    chunk: int = 2048):
    """Static-capacity gather plan for the labeled MLM rows.

    With word_mask_rate 0.15 over ~20-token captions padded to 128, only
    ~2-3% of the B*T rows carry a label, yet a full decode pays the
    [B*T, 30522] GEMM (plus its remat recompute and two grad GEMMs) for all
    of them.  This computes, for a [B, T] (or [B*T]) label tensor, a gather
    of the labeled rows to a STATIC capacity (XLA needs static shapes).
    Returns ``(idx, sel_labels, chunk)`` — gather row i of the flattened
    hidden stream via ``jnp.take(rows, idx, axis=0)`` and score it against
    ``sel_labels`` — or ``None`` when capacity would not shrink the stream.

    capacity = ceil(B*T * capacity_frac) rounded to 512 rows, with the
    decode chunk shrunk to a divisor so the vocab GEMM pays for ~capacity
    rows, not roundup(capacity, chunk).  Exact whenever the labeled count
    <= capacity: a Binomial(B*T, rate) count exceeds 0.25*B*T only with
    astronomically small probability for any rate <= 0.2, so 0.25 is a
    mathematically safe default.  Overflow rows (if ever) are dropped from
    the mean, never mis-labeled.

    The labeled rows are partitioned to the front WITHOUT a sort (an
    argsort over B*T rows lowers to a bitonic sort network on TPU; a
    prefix-sum + scatter is linear).  Unfilled capacity slots point at
    DISTINCT real rows (their own slot index) rather than one shared dummy
    row, so the gather's VJP scatter-add has at most 2-way collisions — the
    all-slots-into-one-row layout is the same fully-colliding-scatter
    pathology the type-embedding fix removed (CLAUDE.md).  Those slots'
    labels are forced to the ignore index, so they contribute exactly zero
    loss and zero gradient to the rows they alias.
    """
    import math

    labs = labels.reshape(-1)
    n = labs.shape[0]
    capacity = max(512, -(-int(n * capacity_frac) // 512) * 512)
    if capacity >= n:
        return None
    chunk = math.gcd(capacity, max(512, chunk // 512 * 512))
    valid = labs != MLM_IGNORE_INDEX
    pos = jnp.cumsum(valid) - 1
    dest = jnp.where(valid & (pos < capacity), pos, capacity)
    base = jnp.concatenate([jnp.arange(capacity, dtype=jnp.int32),
                            jnp.zeros((1,), jnp.int32)])
    idx = base.at[dest].set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:capacity]
    filled = jnp.arange(capacity) < jnp.minimum(valid.sum(), capacity)
    sel_labs = jnp.where(filled, jnp.take(labs, idx),
                         jnp.asarray(MLM_IGNORE_INDEX, labs.dtype))
    return idx, sel_labs, chunk


def gathered_mlm_loss(hidden: jnp.ndarray, table: jnp.ndarray, bias: jnp.ndarray,
                      labels: jnp.ndarray, capacity_frac: float = 0.25,
                      chunk: int = 2048, ce_kernel: bool = False) -> jnp.ndarray:
    """MLM cross entropy decoding ONLY the labeled rows (see
    mlm_gather_plan).  Used when the model emits the full [B, T, H] hidden
    stream; the faster path gathers BEFORE the head transform inside the
    model (PVLT.__call__'s mlm_row_idx) and calls the decode directly."""
    plan = mlm_gather_plan(labels, capacity_frac=capacity_frac, chunk=chunk)
    if plan is None:
        return _mlm_decode_loss(hidden, table, bias, labels, chunk, ce_kernel)
    idx, sel_labs, chunk = plan
    rows = hidden.reshape(-1, hidden.shape[-1])
    sel_rows = jnp.take(rows, idx, axis=0)
    return _mlm_decode_loss(sel_rows[None], table, bias, sel_labs[None],
                            chunk, ce_kernel)


def compute_losses(outputs: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                   num_super: int = 48, num_sub: int = 122,
                   mlm_chunk: int = 2048,
                   mlm_capacity_frac: float = 1.0,
                   mlm_ce_kernel: bool = False) -> Dict[str, jnp.ndarray]:
    """All enabled objectives for one step.

    batch keys (mirroring the dataset contract, mcloader/fashion_gen.py:192-209):
      images [B,H,W,3] (clean, the T2I regression target), mlm_labels [B,T]
      (-1 = unmasked), itm_labels [B] or [B,1], sup_cls_labels / sub_cls_labels.
    """
    zero = jnp.float32(0.0)
    losses = {"loss_mlm": zero, "loss_itm": zero, "loss_sup_cls": zero,
              "loss_sub_cls": zero, "loss_t2i": zero}
    total = zero

    if outputs.get("mlm_logits") is not None:
        vocab = outputs["mlm_logits"].shape[-1]
        l = MLM_LOSS_WEIGHT * cross_entropy(
            outputs["mlm_logits"].reshape(-1, vocab),
            batch["mlm_labels"].reshape(-1),
            ignore_index=MLM_IGNORE_INDEX,
        )
        losses["loss_mlm"] = l
        total = total + l
    elif outputs.get("mlm_hidden") is not None:
        if mlm_capacity_frac < 1.0:
            l = MLM_LOSS_WEIGHT * gathered_mlm_loss(
                outputs["mlm_hidden"], outputs["mlm_table"], outputs["mlm_bias"],
                batch["mlm_labels"], capacity_frac=mlm_capacity_frac,
                chunk=mlm_chunk, ce_kernel=mlm_ce_kernel)
        else:
            l = MLM_LOSS_WEIGHT * _mlm_decode_loss(
                outputs["mlm_hidden"], outputs["mlm_table"], outputs["mlm_bias"],
                batch["mlm_labels"], mlm_chunk, mlm_ce_kernel)
        losses["loss_mlm"] = l
        total = total + l

    if outputs.get("itm_logits") is not None:
        l = ITM_LOSS_WEIGHT * cross_entropy(
            outputs["itm_logits"].reshape(-1, 2), batch["itm_labels"].reshape(-1))
        losses["loss_itm"] = l
        total = total + l

    if outputs.get("sup_cls_logits") is not None:
        l_sup = cross_entropy(outputs["sup_cls_logits"].reshape(-1, num_super),
                              batch["sup_cls_labels"].reshape(-1))
        l_sub = cross_entropy(outputs["sub_cls_logits"].reshape(-1, num_sub),
                              batch["sub_cls_labels"].reshape(-1))
        losses["loss_sup_cls"] = l_sup
        losses["loss_sub_cls"] = l_sub
        total = total + l_sup + l_sub

    if outputs.get("t2i_logits") is not None:
        l = T2I_LOSS_WEIGHT * smooth_l1(outputs["t2i_logits"], batch["images"])
        losses["loss_t2i"] = l
        total = total + l

    losses["total_loss"] = total
    return losses
