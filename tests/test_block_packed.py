"""pack2 stage-1 serving path (ops/block_packed.py, interpret mode): the
packed whole-block kernel and packed SR-KV front end against their unpacked
counterparts, plus the model-level routing test (ModelConfig.pack_stage1)
against the plain XLA forward."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.kernel_utils import run_interpret as _run_interpret


def _pack(x):
    b, n, d = x.shape
    return x.reshape(b, n // 2, 2 * d)


def test_fused_block_p2_matches_unpacked():
    """fused_block_p2 on the packed stream == fused_block on the same tokens
    (identical math, two layouts), including the kv_len logit mask."""
    from mvlt_tpu.ops.block_fused import fused_block
    from mvlt_tpu.ops.block_packed import fused_block_p2

    rng = np.random.default_rng(3)
    b, n, dim, hidden, m = 2, 64, 64, 256, 37
    m_pad = 128

    x = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)
    # K/V in the producer layout: values in lanes 0:dim, bias-valued pad rows
    # emulated as garbage that the kv_len mask must hide
    kv = rng.normal(size=(2, b, 1, m_pad, 128)).astype(np.float32)
    kv[:, :, :, :, dim:] = 0.0
    k, v = jnp.asarray(kv[0]), jnp.asarray(kv[1])

    p = {
        name: jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
        for name, shape in [
            ("g1", (dim,)), ("b1", (dim,)), ("wq", (dim, dim)), ("bq", (dim,)),
            ("wp", (dim, dim)), ("bp", (dim,)), ("g2", (dim,)), ("b2", (dim,)),
            ("w1", (dim, hidden)), ("bm1", (hidden,)),
            ("w2", (hidden, dim)), ("bm2", (dim,)),
        ]
    }
    p["g1"] = p["g1"] + 1.0
    p["g2"] = p["g2"] + 1.0
    args = (p["g1"], p["b1"], p["wq"], p["bq"], p["wp"], p["bp"],
            p["g2"], p["b2"], p["w1"], p["bm1"], p["w2"], p["bm2"])

    want = _run_interpret(
        fused_block, x, k, v, *args,
        scale=dim ** -0.5, eps1=1e-6, eps2=1e-6, num_heads=1, dim=dim,
        kv_len=m, gelu="erf")
    got = _run_interpret(
        fused_block_p2, _pack(x), k, v, *args,
        scale=dim ** -0.5, eps1=1e-6, eps2=1e-6, dim=dim, kv_len=m,
        gelu="erf")
    got = np.asarray(got).reshape(b, n, dim)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_block_p2_rejects_bad_width():
    from mvlt_tpu.ops.block_packed import fused_block_p2

    x = jnp.zeros((1, 8, 64), jnp.float32)  # unpacked width
    k = v = jnp.zeros((1, 1, 128, 128), jnp.float32)
    z64 = jnp.zeros((64,), jnp.float32)
    with pytest.raises(ValueError, match="pack2"):
        fused_block_p2(x, k, v, z64, z64, jnp.zeros((64, 64)), z64,
                       jnp.zeros((64, 64)), z64, z64, z64,
                       jnp.zeros((64, 256)), jnp.zeros((256,)),
                       jnp.zeros((256, 64)), z64,
                       scale=0.125, eps1=1e-6, eps2=1e-6, dim=64, kv_len=100)


@pytest.mark.parametrize("sr,hw,t", [
    (8, (16, 16), 12),   # stage-1-like
    (2, (8, 8), 16),     # smallest even sr
])
def test_sr_kv_p2_matches_unpacked(sr, hw, t):
    """The packed SR-KV front end must emit the SAME K/V rows as the
    unpacked kernel: visual rows identical in order, text rows in the
    documented even-tokens-first permutation (softmax-invariant)."""
    from mvlt_tpu.models.pvlt import Block

    dim, heads = 64, 1
    rng = np.random.default_rng(5)
    h, w = hw
    n = h * w + t
    block = Block(dim=dim, num_heads=heads, mlp_ratio=4.0, sr_ratio=sr,
                  qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
                  ln_eps=1e-6, sr_ln_eps=1e-5,
                  use_pallas=False, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, n, dim)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x, hw, t)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 128 - dim)))

    k1, v1, m1 = _run_interpret(
        block.apply, variables, xp, hw, method=Block._sr_kv)
    k2, v2, m2 = _run_interpret(
        block.apply, variables, x.reshape(2, n // 2, 2 * dim), hw, t,
        method=Block._sr_kv_p2)
    assert m1 == m2
    p = (h // sr) * (w // sr)
    # packed text order: even tokens first, then odd
    perm = (list(range(p))
            + [p + 2 * i for i in range(t // 2)]
            + [p + 2 * i + 1 for i in range(t // 2)])
    for a1, a2 in ((k1, k2), (v1, v2)):
        np.testing.assert_allclose(np.asarray(a2)[:, :, :m1],
                                   np.asarray(a1)[:, :, perm],
                                   rtol=2e-4, atol=2e-4)


def test_fused_attention_p2_matches_padded():
    """fused_attention_p2 (packed stream) == fused_block_attention_padded
    (lane-padded stream) on the same tokens — the v2 serving block's
    attention half in both layouts, including the kv_len mask."""
    from mvlt_tpu.ops.block_attention import fused_block_attention_padded
    from mvlt_tpu.ops.block_packed import fused_attention_p2

    rng = np.random.default_rng(11)
    b, n, dim, m = 2, 64, 64, 37
    m_pad = 128

    x = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)
    kv = rng.normal(size=(2, b, 1, m_pad, 128)).astype(np.float32)
    kv[:, :, :, :, dim:] = 0.0       # producer layout: values in lanes 0:dim
    k, v = jnp.asarray(kv[0]), jnp.asarray(kv[1])
    g = jnp.asarray(rng.normal(size=(dim,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(dim,)) * 0.1, jnp.float32)
    wq = jnp.asarray(rng.normal(size=(dim, dim)) * 0.1, jnp.float32)
    bq = jnp.asarray(rng.normal(size=(dim,)) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.normal(size=(dim, dim)) * 0.1, jnp.float32)
    bp = jnp.asarray(rng.normal(size=(dim,)) * 0.1, jnp.float32)

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 128 - dim)))
    want = _run_interpret(
        fused_block_attention_padded, xp, k, v, g, be, wq, bq, wp, bp,
        scale=dim ** -0.5, eps=1e-6, num_heads=1, dim=dim, kv_len=m)
    got = _run_interpret(
        fused_attention_p2, _pack(x), k, v, g, be, wq, bq, wp, bp,
        scale=dim ** -0.5, eps=1e-6, dim=dim, kv_len=m)
    np.testing.assert_allclose(np.asarray(got).reshape(b, n, dim),
                               np.asarray(want)[:, :, :dim],
                               rtol=2e-4, atol=2e-4)


def test_fused_dwconv_mlp_p2_matches_unpacked():
    """fused_dwconv_mlp_p2 == fused_dwconv_mlp on the same tokens: the
    packed 3x3 halo (18 shifted products crossing the lane halves) must
    reproduce the unpacked 9-shift depthwise conv exactly, text rows
    bypassing the conv in both layouts."""
    from mvlt_tpu.ops.dwconv_mlp import fused_dwconv_mlp, fused_dwconv_mlp_p2

    rng = np.random.default_rng(13)
    b, h, w, t, dim, hid = 2, 16, 16, 16, 64, 256
    n = h * w + t

    x = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(dim,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(dim,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(dim, hid)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(hid,)) * 0.1, jnp.float32)
    kdw = jnp.asarray(rng.normal(size=(3, 3, 1, hid)) * 0.3, jnp.float32)
    bdw = jnp.asarray(rng.normal(size=(hid,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(hid, dim)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(dim,)) * 0.1, jnp.float32)

    want = _run_interpret(
        fused_dwconv_mlp, x, g, be, w1, b1, kdw, bdw, w2, b2,
        hw=(h, w), eps=1e-6, gelu="erf")
    got = _run_interpret(
        fused_dwconv_mlp_p2, _pack(x), g, be, w1, b1, kdw, bdw, w2, b2,
        hw=(h, w), eps=1e-6, gelu="erf", dim=dim)
    np.testing.assert_allclose(np.asarray(got).reshape(b, n, dim),
                               np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_dwconv_mlp_p2_rejects_bad_shapes():
    from mvlt_tpu.ops.dwconv_mlp import fused_dwconv_mlp_p2

    z64 = jnp.zeros((64,), jnp.float32)
    args = (z64 + 1.0, z64, jnp.zeros((64, 256)), jnp.zeros((256,)),
            jnp.zeros((3, 3, 1, 256)), jnp.zeros((256,)),
            jnp.zeros((256, 64)), z64)
    with pytest.raises(ValueError, match="pack2"):   # unpacked width
        fused_dwconv_mlp_p2(jnp.zeros((1, 272, 64)), *args,
                            hw=(16, 16), eps=1e-6, dim=64)
    with pytest.raises(ValueError, match="pack2"):   # no text tail
        fused_dwconv_mlp_p2(jnp.zeros((1, 128, 128)), *args,
                            hw=(16, 16), eps=1e-6, dim=64)


def _model(block_attn: str, use_pallas: bool, pack: bool):
    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.models import create_model

    cfg = ModelConfig(
        img_size=64, embed_dims=(64, 32, 64, 128), num_heads=(1, 2, 2, 4),
        mlp_ratios=(4, 4, 2, 2), token_hidden_size=32, num_text_tokens=16,
        vocab_size=64, max_position_embeddings=32, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=use_pallas,
        drop_path_rate=0.0, kernel_gelu="erf",
        loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
        block_attn_kernel=block_attn, pack_stage1=pack,
    )
    return create_model(cfg)


def test_pack_stage1_routing_matches_xla():
    """Full-model forward with pack_stage1=True (stage-1 dim 64 packed, all
    other stages on the lane-padded 'full' path) == plain XLA forward."""
    rng = np.random.default_rng(17)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)

    base = _model("none", use_pallas=False, pack=False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), imgs, ids)
    want = np.asarray(base.apply(variables, imgs, ids, train=False)["itm_logits"])

    packed = _model("full", use_pallas=True, pack=True)
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        got = _run_interpret(
            lambda: packed.apply(variables, imgs, ids, train=False)["itm_logits"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
