"""Fused DWConv-MLP kernel equivalence (interpret mode) vs the module math
(models/pvlt.py:DWConvMlp with a leading LayerNorm and residual, the v2
block's MLP half)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest


from tests.kernel_utils import run_interpret as _run_interpret


def _ref(x, g, be, w1, b1, kdw, bdw, w2, b2, hw, eps):
    """Unfused: x + fc2(gelu_erf(dwconv_visual(fc1(LN(x)))))."""
    h, w = hw
    bsz, n, c = x.shape
    xf = x.astype(jnp.float32)
    normed = ((xf - xf.mean(-1, keepdims=True))
              * jax.lax.rsqrt(xf.var(-1, keepdims=True) + eps) * g + be)
    hid = normed @ w1 + b1
    vis = hid[:, : h * w].reshape(bsz, h, w, -1)
    vis = jax.lax.conv_general_dilated(
        vis, kdw, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=w1.shape[1]) + bdw
    hid = jnp.concatenate([vis.reshape(bsz, h * w, -1), hid[:, h * w:]], axis=1)
    act = jax.nn.gelu(hid, approximate=False)
    return x + act @ w2 + b2


def _params(rng, c, hid):
    return dict(
        g=jnp.asarray(rng.normal(1.0, 0.1, (c,)), jnp.float32),
        be=jnp.asarray(rng.normal(0.0, 0.1, (c,)), jnp.float32),
        w1=jnp.asarray(rng.normal(0, 0.05, (c, hid)), jnp.float32),
        b1=jnp.asarray(rng.normal(0, 0.05, (hid,)), jnp.float32),
        kdw=jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, hid)), jnp.float32),
        bdw=jnp.asarray(rng.normal(0, 0.05, (hid,)), jnp.float32),
        w2=jnp.asarray(rng.normal(0, 0.05, (hid, c)), jnp.float32),
        b2=jnp.asarray(rng.normal(0, 0.05, (c,)), jnp.float32),
    )


@pytest.mark.parametrize("c,hid,hw,t", [
    (64, 512, (16, 16), 24),    # stage-1-like: lane-padded C, chunked hidden
    (128, 256, (8, 8), 8),      # exact lane width
    (96, 384, (8, 16), 16),     # non-128 C and hidden
])
def test_fused_dwconv_mlp_matches_module(c, hid, hw, t):
    from mvlt_tpu.ops.dwconv_mlp import fused_dwconv_mlp

    rng = np.random.default_rng(5)
    h, w = hw
    n = h * w + t
    x = jnp.asarray(rng.normal(size=(2, n, c)), jnp.float32)
    p = _params(rng, c, hid)

    want = _ref(x, p["g"], p["be"], p["w1"], p["b1"], p["kdw"], p["bdw"],
                p["w2"], p["b2"], hw, 1e-6)
    got = _run_interpret(
        fused_dwconv_mlp, x, p["g"], p["be"], p["w1"], p["b1"],
        p["kdw"], p["bdw"], p["w2"], p["b2"], hw=hw, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_dwconv_mlp_forces_chunking():
    """A hidden width big enough to force multiple chunks still matches
    (accumulator init/emit across the chunk grid)."""
    from mvlt_tpu.ops import dwconv_mlp as mod

    rng = np.random.default_rng(7)
    c, hid, hw, t = 64, 512, (16, 16), 24
    h, w = hw
    n = h * w + t
    x = jnp.asarray(rng.normal(size=(1, n, c)), jnp.float32)
    p = _params(rng, c, hid)
    want = _ref(x, p["g"], p["be"], p["w1"], p["b1"], p["kdw"], p["bdw"],
                p["w2"], p["b2"], hw, 1e-6)
    with mock.patch.object(mod, "_VMEM_BUDGET", 1 * 1024 * 1024):
        got = _run_interpret(
            mod.fused_dwconv_mlp, x, p["g"], p["be"], p["w1"], p["b1"],
            p["kdw"], p["bdw"], p["w2"], p["b2"], hw=hw, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
