"""Fused LN-MLP kernel equivalence vs the unfused XLA path (interpret mode
on CPU; the compiled on-device check lives in tools/tpu_attn_check.py's
sibling tools/probes/bench_fused_mlp.py)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest


from tests.kernel_utils import run_interpret as _run_interpret


@pytest.mark.parametrize("gelu", ["erf", "tanh"])
@pytest.mark.parametrize("n,d,ratio", [(96, 64, 8), (40, 320, 4)])
def test_fused_ln_mlp_matches_xla(rng, n, d, ratio, gelu):
    from mvlt_tpu.ops.fused_mlp import fused_ln_mlp

    h = d * ratio
    b = 2
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32)

    def ref(x):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        nrm = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        hid = jax.nn.gelu(nrm @ w1 + b1, approximate=gelu == "tanh")
        return x + (hid @ w2 + b2)

    want = ref(x)
    got = _run_interpret(fused_ln_mlp, x, g, be, w1, b1, w2, b2, eps=1e-6,
                         gelu=gelu)
    # each gelu form checks against its own matching XLA oracle (the
    # in-kernel erf is the A&S 7.1.26 polynomial, 1.5e-7 abs err)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_fused_ln_mlp_pack2_matches_xla(rng):
    """pack2 (two dim-64 tokens per 128-lane row, packed_ln stats, block-
    diagonal weights) must match the same XLA oracle as the padded form."""
    from mvlt_tpu.ops.fused_mlp import fused_ln_mlp

    n, d, h = 96, 64, 512
    b = 2
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32)

    def ref(x):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        nrm = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        hid = jax.nn.gelu(nrm @ w1 + b1, approximate=False)
        return x + (hid @ w2 + b2)

    want = ref(x)
    got = _run_interpret(fused_ln_mlp, x, g, be, w1, b1, w2, b2, eps=1e-6,
                         gelu="erf", pack2=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_fused_ln_mlp_pack2_grad_matches_xla(rng):
    """pack2 custom-VJP backward (block-diagonal accumulators folded after
    the grid) vs jax.grad through the XLA reference chain, with a per-row
    DropPath scale active."""
    from mvlt_tpu.ops import fused_mlp

    n, d, h = 48, 64, 256
    b = 2
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, d)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32)
    rs = jnp.asarray([2.0, 0.0], jnp.float32)
    cot = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)

    def ref_loss(x, g, be, w1, b1, w2, b2):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        nrm = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        hid = jax.nn.gelu(nrm @ w1 + b1, approximate=False)
        return jnp.sum((x + rs[:, None, None] * (hid @ w2 + b2)) * cot)

    want = jax.grad(ref_loss, argnums=tuple(range(7)))(x, g, be, w1, b1, w2, b2)

    def fused_loss(x, g, be, w1, b1, w2, b2):
        return jnp.sum(fused_mlp.fused_ln_mlp(
            x, g, be, w1, b1, w2, b2, rs, eps=1e-6, gelu="erf",
            pack2=True) * cot)

    got = _run_interpret(lambda: jax.grad(fused_loss, argnums=tuple(range(7)))(
        x, g, be, w1, b1, w2, b2))

    names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
    for gg, gw, nm in zip(got, want, names):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=5e-4, atol=5e-4, err_msg=nm)


def test_erf_approximation_accuracy():
    from mvlt_tpu.ops.fused_mlp import _erf

    import scipy.special as sp

    x = np.linspace(-6, 6, 10001).astype(np.float32)
    got = np.asarray(_erf(jnp.asarray(x)))
    want = sp.erf(x.astype(np.float64))
    # 1.5e-7 formula error + fp32 evaluation rounding
    assert np.abs(got - want).max() < 1e-6


@pytest.mark.parametrize("gelu", ["erf", "tanh"])
def test_fused_ln_mlp_grad_matches_xla(rng, gelu):
    """Custom-VJP backward kernel (dx + all weight/LN grads) vs jax.grad
    through the XLA reference chain, for both GELU forms."""
    import jax

    from mvlt_tpu.ops import fused_mlp

    n, d, h = 48, 32, 64
    b = 2
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, d)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)

    def ref_loss(x, g, be, w1, b1, w2, b2):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        nrm = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        hid = jax.nn.gelu(nrm @ w1 + b1, approximate=gelu == "tanh")
        return jnp.sum((x + (hid @ w2 + b2)) * cot)

    want = jax.grad(ref_loss, argnums=tuple(range(7)))(x, g, be, w1, b1, w2, b2)

    def fused_loss(x, g, be, w1, b1, w2, b2):
        return jnp.sum(fused_mlp.fused_ln_mlp(x, g, be, w1, b1, w2, b2,
                                              eps=1e-6, gelu=gelu) * cot)

    got = _run_interpret(lambda: jax.grad(fused_loss, argnums=tuple(range(7)))(
        x, g, be, w1, b1, w2, b2))

    names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
    for gg, gw, nm in zip(got, want, names):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=5e-4, atol=5e-4, err_msg=nm)


def test_fused_ln_mlp_row_scale(rng):
    """row_scale folds DropPath: output == x + s*mlp(ln x), grads scale."""
    import jax

    from mvlt_tpu.ops import fused_mlp

    n, d, h = 16, 32, 64
    b = 3
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    g = jnp.ones((d,), jnp.float32)
    be = jnp.zeros((d,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.1, jnp.float32)
    b1 = jnp.zeros((h,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, d)) * 0.1, jnp.float32)
    b2 = jnp.zeros((d,), jnp.float32)
    scale = jnp.asarray([0.0, 2.0, 1.0], jnp.float32)

    base = _run_interpret(fused_mlp.fused_ln_mlp, x, g, be, w1, b1, w2, b2, None)
    scaled = _run_interpret(fused_mlp.fused_ln_mlp, x, g, be, w1, b1, w2, b2, scale)
    mlp_part = np.asarray(base) - np.asarray(x)
    want = np.asarray(x) + np.asarray(scale)[:, None, None] * mlp_part
    np.testing.assert_allclose(np.asarray(scaled), want, rtol=1e-5, atol=1e-5)

    # grads: sample 0 fully dropped -> its rows contribute nothing to dw1
    def loss(w1_):
        return jnp.sum(_to_f32(fused_mlp.fused_ln_mlp(x, g, be, w1_, b1, w2, b2, scale)))

    def _to_f32(t):
        return t.astype(jnp.float32)

    grad = _run_interpret(lambda: jax.grad(loss)(w1))
    assert np.isfinite(np.asarray(grad)).all()
