"""Whole-block megakernel equivalence (interpret mode).

Checks ops/block_fused.fused_block against the unfused XLA expression of a
pre-LN transformer block (attention with precomputed KV + MLP, residuals),
including the lane-padded-stream contract the PVLT stage loop relies on.
"""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest


from tests.kernel_utils import run_interpret as _run_interpret


def _ref_block(x, k, v, g1, be1, wq, bq, wp, bp, g2, be2, w1, b1, w2, b2,
               scale, eps1, eps2, nh, gelu="erf"):
    """Unfused block: x + proj(attn(LN1 x)) then + mlp(LN2 .)."""
    from mvlt_tpu.models.heads import erf_gelu

    b, n, d = x.shape
    hd = d // nh
    act = erf_gelu if gelu == "erf" else (
        lambda t: jax.nn.gelu(t, approximate=True))

    def ln(t, g, be, eps):
        tf = t.astype(jnp.float32)
        mu = tf.mean(-1, keepdims=True)
        var = tf.var(-1, keepdims=True)
        return (tf - mu) * jax.lax.rsqrt(var + eps) * g + be

    normed = ln(x, g1, be1, eps1)
    q = (normed @ wq + bq).reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k.astype(jnp.float32)) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("bhnm,bhmd->bhnd", probs, v.astype(jnp.float32))
    attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)
    h = x.astype(jnp.float32) + (attn @ wp + bp)
    normed2 = ln(h, g2, be2, eps2)
    y = act(normed2 @ w1 + b1) @ w2 + b2
    return h + y


def _mk(rng, n, d, h, m, hidden):
    b = 2
    hd = d // h
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
    return dict(
        x=jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32),
        k=mk(b, h, m, hd), v=mk(b, h, m, hd),
        g1=mk(d) + 1.0, be1=mk(d),
        wq=mk(d, d), bq=mk(d), wp=mk(d, d), bp=mk(d),
        g2=mk(d) + 1.0, be2=mk(d),
        w1=mk(d, hidden), b1=mk(hidden), w2=mk(hidden, d), b2=mk(d),
    )


@pytest.mark.parametrize("gelu", ["erf", "tanh"])
@pytest.mark.parametrize("n,d,h,m,hidden", [
    (96, 64, 1, 24, 512),      # stage-1-like: lane pad 64->128, mlp x8
    (48, 128, 2, 24, 256),     # aligned dim
    (32, 320, 5, 20, 640),     # stage-3-like: 320->384 pad
])
def test_fused_block_matches_xla(rng, n, d, h, m, hidden, gelu):
    """Both GELU forms check against their own matching XLA oracle
    (ModelConfig.kernel_gelu policy, ops/kernel_math.py)."""
    from mvlt_tpu.ops.block_fused import fused_block

    p = _mk(rng, n, d, h, m, hidden)
    scale = (d // h) ** -0.5
    want = _ref_block(p["x"], p["k"], p["v"], p["g1"], p["be1"], p["wq"],
                      p["bq"], p["wp"], p["bp"], p["g2"], p["be2"], p["w1"],
                      p["b1"], p["w2"], p["b2"], scale, 1e-6, 1e-6, h,
                      gelu=gelu)
    got = _run_interpret(
        fused_block, p["x"], p["k"], p["v"], p["g1"], p["be1"], p["wq"],
        p["bq"], p["wp"], p["bp"], p["g2"], p["be2"], p["w1"], p["b1"],
        p["w2"], p["b2"], scale=scale, eps1=1e-6, eps2=1e-6, num_heads=h,
        gelu=gelu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n,d,h,m,hidden", [
    (48, 128, 2, 24, 256),     # stage-2-like: one full pair
    (32, 320, 5, 20, 640),     # stage-3-like: odd heads (dummy hi half)
    (32, 512, 8, 24, 1024),    # stage-4-like: four pairs
])
def test_fused_block_head_pair_matches_xla(rng, n, d, h, m, hidden):
    """hp2 (two 64-wide heads per 128-lane stripe, ops/kernel_math.
    softmax_av_pair) must match the same XLA oracle as the per-head form,
    including the odd-head-count dummy half."""
    from mvlt_tpu.ops.block_fused import fused_block

    p = _mk(rng, n, d, h, m, hidden)
    scale = (d // h) ** -0.5
    want = _ref_block(p["x"], p["k"], p["v"], p["g1"], p["be1"], p["wq"],
                      p["bq"], p["wp"], p["bp"], p["g2"], p["be2"], p["w1"],
                      p["b1"], p["w2"], p["b2"], scale, 1e-6, 1e-6, h)
    got = _run_interpret(
        fused_block, p["x"], p["k"], p["v"], p["g1"], p["be1"], p["wq"],
        p["bq"], p["wp"], p["bp"], p["g2"], p["be2"], p["w1"], p["b1"],
        p["w2"], p["b2"], scale=scale, eps1=1e-6, eps2=1e-6, num_heads=h,
        gelu="erf", head_pair=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_block_head_pair_padded_stream(rng):
    """hp2 on a lane-padded stream (the stage-3 320->384 case): live lanes
    match the unpadded hp2 run, pad lanes stay exactly zero."""
    from mvlt_tpu.ops.block_fused import fused_block

    n, d, h, m, hidden = 32, 320, 5, 20, 640
    p = _mk(rng, n, d, h, m, hidden)
    scale = (d // h) ** -0.5
    kw = dict(scale=scale, eps1=1e-6, eps2=1e-6, num_heads=h, head_pair=True)
    args = (p["k"], p["v"], p["g1"], p["be1"], p["wq"], p["bq"], p["wp"],
            p["bp"], p["g2"], p["be2"], p["w1"], p["b1"], p["w2"], p["b2"])

    base = _run_interpret(fused_block, p["x"], *args, **kw)
    xp = jnp.pad(p["x"], ((0, 0), (0, 0), (0, 384 - d)))
    padded = _run_interpret(fused_block, xp, *args, dim=d, **kw)

    assert padded.shape == (p["x"].shape[0], n, 384)
    np.testing.assert_allclose(np.asarray(padded[..., :d]),
                               np.asarray(base), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(padded[..., d:]), 0.0)


def test_fused_block_padded_stream(rng):
    """The lane-padded contract: feeding [B, N, 128] with dim=64 (zeros in
    the pad lanes) must produce the same values in the live lanes and keep
    the pad lanes exactly zero."""
    from mvlt_tpu.ops.block_fused import fused_block

    n, d, h, m, hidden = 96, 64, 1, 24, 256
    p = _mk(rng, n, d, h, m, hidden)
    scale = (d // h) ** -0.5
    kw = dict(scale=scale, eps1=1e-6, eps2=1e-6, num_heads=h)
    args = (p["k"], p["v"], p["g1"], p["be1"], p["wq"], p["bq"], p["wp"],
            p["bp"], p["g2"], p["be2"], p["w1"], p["b1"], p["w2"], p["b2"])

    base = _run_interpret(fused_block, p["x"], *args, **kw)
    xp = jnp.pad(p["x"], ((0, 0), (0, 0), (0, 128 - d)))
    padded = _run_interpret(fused_block, xp, *args, dim=d, **kw)

    assert padded.shape == (p["x"].shape[0], n, 128)
    np.testing.assert_allclose(np.asarray(padded[..., :d]),
                               np.asarray(base), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(padded[..., d:]), 0.0)


def test_fused_block_ln_next_handoff(rng):
    """ln_next: the kernel's second output must equal LN(out) under the
    next block's norm params (the stage-loop KV handoff)."""
    from mvlt_tpu.ops.block_fused import fused_block

    n, d, h, m, hidden = 64, 64, 1, 24, 128
    p = _mk(rng, n, d, h, m, hidden)
    scale = (d // h) ** -0.5
    kw = dict(scale=scale, eps1=1e-6, eps2=1e-6, num_heads=h)
    args = (p["k"], p["v"], p["g1"], p["be1"], p["wq"], p["bq"], p["wp"],
            p["bp"], p["g2"], p["be2"], p["w1"], p["b1"], p["w2"], p["b2"])
    gn = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    ben = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)

    base = _run_interpret(fused_block, p["x"], *args, **kw)
    out, out_next = _run_interpret(fused_block, p["x"], *args, (gn, ben), **kw)

    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
    of = np.asarray(out, np.float64)
    mu = of.mean(-1, keepdims=True)
    var = of.var(-1, keepdims=True)
    want = (of - mu) / np.sqrt(var + 1e-6) * np.asarray(gn) + np.asarray(ben)
    np.testing.assert_allclose(np.asarray(out_next), want, rtol=2e-4, atol=2e-4)
