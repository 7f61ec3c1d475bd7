"""Fused MLM cross-entropy kernel (ops/mlm_ce.py) vs the XLA chunked
reference (train/losses.py:chunked_mlm_loss): value and gradients, interpret
mode on CPU.  Small vocab keeps interpret-mode wall time sane; the row and
vocab counts are chosen NOT to divide the kernel tiles so the padding paths
(padded rows with -1 labels, padded vocab columns masked from the max /
softmax) are exercised."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvlt_tpu.train.losses import chunked_mlm_loss
from tests.kernel_utils import run_interpret

H = 64


def _data(rng, r, v, label_rate=0.3):
    rows = jnp.asarray(rng.standard_normal((r, H)), jnp.float32)
    table = jnp.asarray(rng.standard_normal((v, H)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((v,)) * 0.1, jnp.float32)
    labels = jnp.asarray(
        np.where(rng.random(r) < label_rate, rng.integers(0, v, r), -1),
        jnp.int32)
    return rows, table, bias, labels


@pytest.mark.parametrize("r,v", [(48, 200), (130, 700)])
def test_fused_mlm_loss_matches_chunked(r, v):
    import mvlt_tpu.ops.mlm_ce as mc

    rng = np.random.default_rng(0)
    rows, table, bias, labels = _data(rng, r, v)

    want = chunked_mlm_loss(rows[None], table, bias, labels[None], chunk=64)
    got = run_interpret(mc.fused_mlm_loss, rows[None], table, bias,
                        labels[None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fused_mlm_loss_grads_match_chunked():
    import mvlt_tpu.ops.mlm_ce as mc

    rng = np.random.default_rng(1)
    rows, table, bias, labels = _data(rng, 72, 300)

    def ref(rows, table, bias):
        return chunked_mlm_loss(rows[None], table, bias, labels[None],
                                chunk=64)

    def fused(rows, table, bias):
        return mc.fused_mlm_loss(rows[None], table, bias, labels[None])

    want = jax.grad(ref, argnums=(0, 1, 2))(rows, table, bias)
    got = run_interpret(jax.grad(fused, argnums=(0, 1, 2)),
                        rows, table, bias)
    for g, w, name in zip(got, want, ("drows", "dtable", "dbias")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-6, err_msg=name)


def test_fused_mlm_loss_all_ignored_rows():
    """No valid labels: loss 0, grads 0 (no NaN from the 0/max(count,1))."""
    import mvlt_tpu.ops.mlm_ce as mc

    rng = np.random.default_rng(2)
    rows, table, bias, _ = _data(rng, 16, 128)
    labels = jnp.full((16,), -1, jnp.int32)

    def fused(rows):
        return mc.fused_mlm_loss(rows[None], table, bias, labels[None])

    loss, grad = run_interpret(jax.value_and_grad(fused), rows)
    assert float(loss) == 0.0
    assert np.all(np.asarray(grad) == 0.0)


def test_fused_mlm_loss_bf16_rows():
    """The train path feeds bf16 hidden rows; value should track the XLA
    chunked decode at bf16 tolerance."""
    import mvlt_tpu.ops.mlm_ce as mc

    rng = np.random.default_rng(3)
    rows, table, bias, labels = _data(rng, 64, 256)
    rows16 = rows.astype(jnp.bfloat16)

    want = chunked_mlm_loss(rows16[None], table, bias, labels[None], chunk=64)
    got = run_interpret(mc.fused_mlm_loss, rows16[None], table, bias,
                        labels[None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=1e-4)
