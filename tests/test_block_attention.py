"""Fused block-attention megakernel equivalence (interpret mode)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest


from tests.kernel_utils import run_interpret as _run_interpret


@pytest.mark.parametrize("n,d,h,m", [(96, 64, 1, 24), (40, 128, 2, 24), (32, 256, 4, 20)])
def test_fused_block_attention_matches_xla(rng, n, d, h, m):
    from mvlt_tpu.ops.block_attention import fused_block_attention

    b = 2
    hd = d // h
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, hd)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    wq = jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32)
    bq = jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32)
    wp = jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32)
    bp = jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32)
    scale = hd ** -0.5

    def ref(x):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        normed = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        q = (normed @ wq + bq).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        return x + (o @ wp + bp)

    want = ref(x)
    got = _run_interpret(fused_block_attention, x, k, v, g, be,
                         wq, bq, wp, bp, scale=scale, eps=1e-6, num_heads=h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def _mk_params(rng, b, n, d, h, m):
    hd = d // h
    return dict(
        x=jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32),
        k=jnp.asarray(rng.normal(size=(b, h, m, hd)), jnp.float32),
        v=jnp.asarray(rng.normal(size=(b, h, m, hd)), jnp.float32),
        g=jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32),
        be=jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32),
        wq=jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32),
        bq=jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32),
        wp=jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32),
        bp=jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32),
    )


@pytest.mark.parametrize("n,d,h,m", [(96, 64, 1, 24), (40, 128, 2, 24)])
def test_fused_block_attention_grad_matches_xla(rng, n, d, h, m):
    """Custom-VJP backward kernel (dx, dk, dv + all weight/LN grads) vs
    jax.grad through the XLA reference chain — the training path
    (ModelConfig.fused_attn_train)."""
    from mvlt_tpu.ops import block_attention as ba

    b, hd = 2, d // h
    p = _mk_params(rng, b, n, d, h, m)
    scale = hd ** -0.5
    cot = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    row_scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(b,)), jnp.float32)

    argnames = ["x", "k", "v", "g", "be", "wq", "bq", "wp", "bp"]

    def ref_loss(*args):
        out = ba._xla_block_attention(*args, row_scale, scale, 1e-6, h)
        return jnp.sum(out * cot)

    want = jax.grad(ref_loss, argnums=tuple(range(9)))(*[p[a] for a in argnames])

    def fused_loss(*args):
        out = ba.fused_block_attention(*args, row_scale, scale=scale,
                                       eps=1e-6, num_heads=h)
        return jnp.sum(out * cot)

    got = _run_interpret(lambda: jax.grad(fused_loss, argnums=tuple(range(9)))(
        *[p[a] for a in argnames]))

    for gg, gw, nm in zip(got, want, ["dx", "dk", "dv", "dgamma", "dbeta",
                                      "dwq", "dbq", "dwp", "dbp"]):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=5e-4, atol=5e-4, err_msg=nm)


def test_fused_block_attention_row_scale(rng):
    """row_scale folds DropPath: out == x + s * attn_branch(x)."""
    from mvlt_tpu.ops.block_attention import fused_block_attention

    b, n, d, h, m = 3, 32, 64, 1, 16
    p = _mk_params(rng, b, n, d, h, m)
    scale = (d // h) ** -0.5
    s = jnp.asarray([0.0, 2.0, 1.0], jnp.float32)
    kw = dict(scale=scale, eps=1e-6, num_heads=h)
    args = (p["x"], p["k"], p["v"], p["g"], p["be"], p["wq"], p["bq"],
            p["wp"], p["bp"])

    base = _run_interpret(fused_block_attention, *args, **kw)
    scaled = _run_interpret(fused_block_attention, *args, s, **kw)
    branch = np.asarray(base) - np.asarray(p["x"])
    want = np.asarray(p["x"]) + np.asarray(s)[:, None, None] * branch
    np.testing.assert_allclose(np.asarray(scaled), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,d,h,m", [(96, 64, 1, 24), (40, 128, 2, 24)])
def test_fused_block_attention_grad_stats_matches_xla(rng, n, d, h, m):
    """save_stats=True (ModelConfig.fused_attn_stats): the forward persists
    LN/softmax statistics and the backward rebuilds nhat/P from them —
    grads must match the XLA reference chain exactly like the recompute
    backward does."""
    from mvlt_tpu.ops import block_attention as ba

    b, hd = 2, d // h
    p = _mk_params(rng, b, n, d, h, m)
    scale = hd ** -0.5
    cot = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    row_scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(b,)), jnp.float32)

    argnames = ["x", "k", "v", "g", "be", "wq", "bq", "wp", "bp"]

    def ref_loss(*args):
        out = ba._xla_block_attention(*args, row_scale, scale, 1e-6, h)
        return jnp.sum(out * cot)

    want = jax.grad(ref_loss, argnums=tuple(range(9)))(*[p[a] for a in argnames])

    def fused_loss(*args):
        out = ba.fused_block_attention(*args, row_scale, scale=scale,
                                       eps=1e-6, num_heads=h, save_stats=True)
        return jnp.sum(out * cot)

    got = _run_interpret(lambda: jax.grad(fused_loss, argnums=tuple(range(9)))(
        *[p[a] for a in argnames]))

    for gg, gw, nm in zip(got, want, ["dx", "dk", "dv", "dgamma", "dbeta",
                                      "dwq", "dbq", "dwp", "dbp"]):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=5e-4, atol=5e-4, err_msg=nm)


def test_fused_block_attention_stats_forward_unchanged(rng):
    """The stats-emitting forward must return the same primal output as
    the plain forward (the side output is pure bookkeeping)."""
    from mvlt_tpu.ops.block_attention import fused_block_attention

    b, n, d, h, m = 2, 64, 64, 1, 16
    p = _mk_params(rng, b, n, d, h, m)
    scale = (d // h) ** -0.5
    args = (p["x"], p["k"], p["v"], p["g"], p["be"], p["wq"], p["bq"],
            p["wp"], p["bp"])
    kw = dict(scale=scale, eps=1e-6, num_heads=h)

    def plain():
        out, _ = jax.vjp(lambda x: fused_block_attention(
            x, *args[1:], **kw), p["x"])
        return out

    def stats():
        out, _ = jax.vjp(lambda x: fused_block_attention(
            x, *args[1:], **kw, save_stats=True), p["x"])
        return out

    np.testing.assert_allclose(np.asarray(_run_interpret(stats)),
                               np.asarray(_run_interpret(plain)),
                               rtol=1e-6, atol=1e-6)


def test_fused_block_attention_stats_xla_fallback(rng):
    """save_stats at XLA-fallback shapes: the fwd gate skips the side
    output and the backward takes the XLA path; grads still match."""
    from mvlt_tpu.ops import block_attention as ba

    b, n, d, h, m = 1, 16, 64, 1, 8
    p = _mk_params(rng, b, n, d, h, m)
    scale = (d // h) ** -0.5
    cot = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    rs = jnp.asarray([0.7], jnp.float32)

    def fused_loss(x):
        out = ba.fused_block_attention(x, p["k"], p["v"], p["g"], p["be"],
                                       p["wq"], p["bq"], p["wp"], p["bp"],
                                       rs, scale=scale, eps=1e-6, num_heads=h,
                                       save_stats=True)
        return jnp.sum(out * cot)

    def ref_loss(x):
        out = ba._xla_block_attention(x, p["k"], p["v"], p["g"], p["be"],
                                      p["wq"], p["bq"], p["wp"], p["bp"],
                                      rs, scale, 1e-6, h)
        return jnp.sum(out * cot)

    want = jax.grad(ref_loss)(p["x"])
    with mock.patch.object(ba, "_BWD_FIXED_BUDGET", 0):  # force the fallback
        got = _run_interpret(lambda: jax.grad(fused_loss)(p["x"]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_fused_block_attention_bwd_xla_fallback(rng):
    """Shapes whose fixed VMEM blocks exceed the budget take the XLA
    fallback; grads must still match the reference chain."""
    from mvlt_tpu.ops import block_attention as ba

    b, n, d, h, m = 1, 16, 64, 1, 8
    p = _mk_params(rng, b, n, d, h, m)
    scale = (d // h) ** -0.5
    cot = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    rs = jnp.asarray([0.7], jnp.float32)

    def fused_loss(x):
        out = ba.fused_block_attention(x, p["k"], p["v"], p["g"], p["be"],
                                       p["wq"], p["bq"], p["wp"], p["bp"],
                                       rs, scale=scale, eps=1e-6, num_heads=h)
        return jnp.sum(out * cot)

    def ref_loss(x):
        out = ba._xla_block_attention(x, p["k"], p["v"], p["g"], p["be"],
                                      p["wq"], p["bq"], p["wp"], p["bp"],
                                      rs, scale, 1e-6, h)
        return jnp.sum(out * cot)

    want = jax.grad(ref_loss)(p["x"])
    with mock.patch.object(ba, "_BWD_FIXED_BUDGET", 0):  # force the fallback
        got = _run_interpret(lambda: jax.grad(fused_loss)(p["x"]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
