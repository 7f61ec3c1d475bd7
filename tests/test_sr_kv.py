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


@pytest.mark.parametrize("dim,heads,sr,hw,t", [
    (128, 2, 4, (8, 8), 12),      # stage-2-like: one full pair
    (320, 5, 2, (8, 8), 12),      # stage-3-like: odd heads (dummy hi half)
    (128, 2, 1, (8, 8), 12),      # stage-4-like: sr == 1
])
def test_sr_kv_head_pair_layout(dim, heads, sr, hw, t):
    """head_pair=True must emit exactly the hp2 paired re-layout of the
    unpaired output: stripe s rows 0:M_pad = head 2s (lanes 0:hd), rows
    M_pad:2*M_pad = head 2s+1 shifted to lanes 64:64+hd (zeros for the odd
    tail) — the contract fused_block(kv_paired=True) consumes."""
    from mvlt_tpu.models.pvlt import Block

    rng = np.random.default_rng(3)
    h, w = hw
    n = h * w + t
    hd = dim // heads
    d_pad = -(-dim // 128) * 128
    block = Block(dim=dim, num_heads=heads, mlp_ratio=4.0, sr_ratio=sr,
                  qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
                  ln_eps=1e-6, sr_ln_eps=1e-5,
                  use_pallas=False, dtype=jnp.float32)
    x_init = jnp.asarray(rng.normal(size=(2, n, dim)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x_init, hw, t)
    xp = jnp.pad(x_init, ((0, 0), (0, 0), (0, d_pad - dim)))

    k0, v0, m0 = _run_interpret(
        block.apply, variables, xp, hw, method=Block._sr_kv)
    kp, vp, mp = _run_interpret(
        block.apply, variables, xp, hw, True, method=Block._sr_kv)
    assert mp == m0
    n_str = (heads + 1) // 2
    m_pad = k0.shape[2]
    assert kp.shape == (2, n_str, 2 * m_pad, 128)

    def paired_of(a):
        a = np.asarray(a)
        if heads % 2:
            a = np.concatenate([a, np.zeros_like(a[:, :1])], axis=1)
        lo = a[:, 0::2]
        hi = np.zeros_like(lo)
        hi[..., 64:64 + hd] = a[:, 1::2, :, :hd]
        return np.concatenate([lo, hi], axis=2)

    np.testing.assert_allclose(np.asarray(kp), paired_of(k0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vp), paired_of(v0),
                               rtol=1e-5, atol=1e-5)


def reference_kv(params, x, hw, t, *, dim, heads, sr, linear_sr=False,
                 eps1=1e-6, eps_sr=1e-5):
    """The K/V front end written directly from the reference math
    (libs/pvlt.py:100-121): LN1 over the joint stream, then for the visual
    tokens either a strided conv SR (kernel=stride=sr) + LN, or PVT-v2's
    linear SRA (adaptive-avg-pool to 7x7 + LN + GELU), text tokens
    re-concatenated untouched, then the joint KV projection split into
    per-head K and V.  Plain jnp only — the ORACLE the three optimized
    implementations (_xla_kv's two branches, ops/sr_kv.py, and
    ops/block_packed.py's packed front end) are pinned against, so their
    shared semantics has exactly one written-down definition."""
    h, w = hw
    b = x.shape[0]

    def ln(z, scale, bias, eps):
        mu = z.mean(-1, keepdims=True)
        var = ((z - mu) ** 2).mean(-1, keepdims=True)
        return (z - mu) / jnp.sqrt(var + eps) * scale + bias

    normed = ln(x, params["norm1"]["scale"], params["norm1"]["bias"], eps1)
    vis, txt = normed[:, : h * w], normed[:, h * w:]
    ap = params["attn"]
    if linear_sr:
        # PVT-v2 linear SRA: avg-pool the visual grid to a fixed p x p
        # (window == stride == h//p), 1x1 conv, LN, erf GELU
        p = 7
        wy, wx = h // p, w // p
        grid = vis.reshape(b, p, wy, p, wx, dim).mean(axis=(2, 4))
        red = grid.reshape(b, p * p, dim) @ ap["sr"]["kernel"][0, 0] \
            + ap["sr"]["bias"]
        red = ln(red, ap["norm"]["scale"], ap["norm"]["bias"], eps_sr)
        red = jax.nn.gelu(red, approximate=False)
    elif sr > 1:
        grid = vis.reshape(b, h, w, dim)
        red = jax.lax.conv_general_dilated(
            grid, ap["sr"]["kernel"], window_strides=(sr, sr),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + ap["sr"]["bias"]
        red = red.reshape(b, (h // sr) * (w // sr), dim)
        red = ln(red, ap["norm"]["scale"], ap["norm"]["bias"], eps_sr)
    else:
        red = vis
    kv_in = jnp.concatenate([red, txt], axis=1)
    kv = kv_in @ ap["kv"]["kernel"]
    if "bias" in ap["kv"]:
        kv = kv + ap["kv"]["bias"]
    m = kv_in.shape[1]
    hd = dim // heads
    kv = kv.reshape(b, m, 2, heads, hd).transpose(2, 0, 3, 1, 4)
    return kv[0], kv[1], m


@pytest.mark.parametrize("dim,heads,sr,hw,t,linear", [
    (64, 1, 8, (16, 16), 12, False),   # conv-SR stage-1-like
    (320, 5, 2, (8, 8), 12, False),    # conv-SR multi-head
    (128, 2, 1, (8, 8), 12, False),    # sr == 1 passthrough
    (64, 1, 8, (14, 14), 12, True),    # PVT-v2 linear SRA
])
def test_xla_kv_matches_reference_oracle(dim, heads, sr, hw, t, linear):
    """_xla_kv (both branches, the root the kernel tests chain from) against
    the plain-jnp reference oracle — closes the pairwise-only verification
    loop over the triplicated K/V math (round-3 review)."""
    from mvlt_tpu.models.pvlt import Block

    rng = np.random.default_rng(5)
    h, w = hw
    n = h * w + t
    block = Block(dim=dim, num_heads=heads, mlp_ratio=4.0, sr_ratio=sr,
                  qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
                  ln_eps=1e-6, sr_ln_eps=1e-5, linear_sr=linear,
                  use_pallas=False, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, n, dim)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x, hw, t)

    k_ref, v_ref, m_ref = reference_kv(
        variables["params"], x, hw, t, dim=dim, heads=heads, sr=sr,
        linear_sr=linear)
    k, v, m = block.apply(variables, x, hw, method=Block._xla_kv)
    assert m == m_ref and k.shape == k_ref.shape
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=2e-5, atol=2e-5)
