"""Fused K/V-path kernel equivalence (ops/sr_kv.py, interpret mode): the
Block-level _sr_kv (LN1 + space-to-depth + SR contraction + SR-LN + text
re-concat + K/V projections in ONE kernel) against _xla_kv(padded_out=True),
the unfused XLA expression of the same path, across sr ratios and head
counts, on a lane-padded stream."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest


from tests.kernel_utils import run_interpret as _run_interpret


@pytest.mark.parametrize("dim,heads,sr,hw,t", [
    (64, 1, 8, (16, 16), 12),     # stage-1-like: lane-padded, single head
    (320, 5, 2, (8, 8), 12),      # stage-3-like: multi-head, padded lanes
    (128, 2, 1, (8, 8), 12),      # stage-4-like: sr == 1, no SR params
])
def test_block_sr_kv_matches_xla_kv(dim, heads, sr, hw, t):
    """_sr_kv (whole K/V path in one kernel) and _xla_kv(padded_out=True)
    must produce the same K/V tensors and kv_len on a lane-padded stream,
    at every sr ratio the full-kernel path dispatches."""
    from mvlt_tpu.models.pvlt import Block

    rng = np.random.default_rng(1)
    h, w = hw
    n = h * w + t
    d_pad = -(-dim // 128) * 128
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
    assert k1.shape == k2.shape
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=2e-4, atol=2e-4)
