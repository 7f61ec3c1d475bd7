"""Fused LN -> space-to-depth -> SR contraction -> SR-LN kernel equivalence
(ops/sr_kv.py, interpret mode) against the unfused XLA expression, including
the lane-padded-stream contract, plus the Block-level _sr_kv vs _xla_kv
equivalence (same K/V tensors from both front ends)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _run_interpret(fn, *args, **kwargs):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        return fn(*args, **kwargs)


def _ref(x, g1, b1, kern, bias, gs, bs, dim, hw, sr, eps1, eps_sr):
    """XLA reference: masked-stat LN1 -> s2d transpose -> GEMM -> LN."""
    b, n, d_in = x.shape
    h, w = hw
    xf = x.astype(jnp.float32)
    mu = xf.sum(-1, keepdims=True) / dim
    var = jnp.where(jax.lax.broadcasted_iota(jnp.int32, xf.shape, 2) < dim,
                    (xf - mu) ** 2, 0.0).sum(-1, keepdims=True) / dim
    g = jnp.zeros((d_in,), jnp.float32).at[:dim].set(g1)
    bb = jnp.zeros((d_in,), jnp.float32).at[:dim].set(b1)
    normed = (xf - mu) * jax.lax.rsqrt(var + eps1) * g + bb
    vis = normed[:, : h * w, :dim].reshape(b, h // sr, sr, w // sr, sr, dim)
    vis = vis.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, (h // sr) * (w // sr), sr * sr * dim)
    out = vis @ kern.reshape(sr * sr * dim, dim) + bias
    muo = out.mean(-1, keepdims=True)
    varo = out.var(-1, keepdims=True)
    return (out - muo) * jax.lax.rsqrt(varo + eps_sr) * gs + bs


@pytest.mark.parametrize("dim,hw,sr", [(64, (16, 16), 8), (128, (8, 8), 4),
                                       (320, (8, 8), 2)])
def test_fused_ln_sr_matches_xla(dim, hw, sr):
    from mvlt_tpu.ops.sr_kv import fused_ln_sr

    rng = np.random.default_rng(0)
    b, t = 2, 12
    h, w = hw
    d_pad = -(-dim // 128) * 128
    n = h * w + t
    x = jnp.pad(jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32),
                ((0, 0), (0, 0), (0, d_pad - dim)))
    g1 = jnp.asarray(rng.normal(size=(dim,)) * 0.1 + 1.0, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(dim,)) * 0.1, jnp.float32)
    kern = jnp.asarray(rng.normal(size=(sr, sr, dim, dim)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(dim,)) * 0.1, jnp.float32)
    gs = jnp.asarray(rng.normal(size=(dim,)) * 0.1 + 1.0, jnp.float32)
    bs = jnp.asarray(rng.normal(size=(dim,)) * 0.1, jnp.float32)

    got = _run_interpret(
        fused_ln_sr, x, g1, b1, kern, bias, gs, bs,
        dim=dim, hw=hw, sr=sr, eps1=1e-6, eps_sr=1e-5)
    want = _ref(x, g1, b1, kern, bias, gs, bs, dim, hw, sr, 1e-6, 1e-5)

    assert got.shape == (b, (h // sr) * (w // sr), d_pad)
    np.testing.assert_allclose(np.asarray(got[:, :, :dim]),
                               np.asarray(want), rtol=2e-4, atol=2e-4)
    # the stream pad-lane invariant: padded output lanes exactly zero
    if d_pad != dim:
        assert np.all(np.asarray(got[:, :, dim:]) == 0.0)


def test_block_sr_kv_matches_xla_kv():
    """_sr_kv (fused front end) and _xla_kv(padded_out=True) must produce the
    same K/V tensors and kv_len for an sr>1 block on a lane-padded stream."""
    from mvlt_tpu.models.pvlt import Block

    rng = np.random.default_rng(1)
    dim, heads, sr, hw, t = 64, 1, 8, (16, 16), 12
    h, w = hw
    n = h * w + t
    d_pad = 128
    block = Block(dim=dim, num_heads=heads, mlp_ratio=4.0, sr_ratio=sr,
                  qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
                  ln_eps=1e-6, sr_ln_eps=1e-5,
                  use_pallas=False, dtype=jnp.float32)
    x_init = jnp.asarray(rng.normal(size=(2, n, dim)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x_init, hw, t)
    xp = jnp.pad(x_init, ((0, 0), (0, 0), (0, d_pad - dim)))

    k1, v1, m1 = _run_interpret(
        block.apply, variables, xp, hw, method=Block._sr_kv)
    k2, v2, m2 = block.apply(variables, xp, hw, method=Block._xla_kv,
                             padded_out=True)
    assert m1 == m2
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=2e-4, atol=2e-4)
