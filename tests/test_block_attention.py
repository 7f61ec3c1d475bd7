"""Fused block-attention megakernel equivalence (interpret mode)."""

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
    got = _run_interpret(fused_block_attention.__wrapped__, x, k, v, g, be,
                         wq, bq, wp, bp, scale=scale, eps=1e-6, num_heads=h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)
