"""Attention-core equivalence tests (SURVEY.md §7 hard-part 3).

The Pallas fused kernel must match the einsum reference path on the exact
Q/KV shape regime of PVLT (joint [HW+T] queries, SRA-reduced KV), including
the KV-length padding mask.  On CPU the kernel runs in interpreter mode.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvlt_tpu.ops.attention import _attention_xla


def _fused_interpret(q, k, v, scale):
    """Run the Pallas kernel in interpreter mode (CPU-safe)."""
    from unittest import mock

    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    with mock.patch.object(pl, "pallas_call", patched):
        from mvlt_tpu.ops import pallas_attention

        return pallas_attention.fused_attention.__wrapped__(q, k, v, scale=scale)


# PVLT stage shapes @ 256 input (SURVEY.md §3.2): (N, M, heads, head_dim)
STAGE_SHAPES = [
    (4224, 192, 1, 64),   # stage 1 (sr 8)
    (1152, 192, 2, 64),   # stage 2 (sr 4)
    (384, 192, 5, 64),    # stage 3 (sr 2)
    (192, 192, 8, 64),    # stage 4 (full)
]


@pytest.mark.parametrize("n,m,h,d", [STAGE_SHAPES[2], STAGE_SHAPES[3]])
def test_fused_matches_xla_fp32(rng, n, m, h, d):
    b = 2
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    scale = d ** -0.5
    want = _attention_xla(q, k, v, scale)
    got = _fused_interpret(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_odd_shapes(rng):
    """Non-tile-aligned N and M exercise the padding/mask paths."""
    b, h, n, m, d = 1, 2, 100, 37, 16
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    want = _attention_xla(q, k, v, 0.25)
    got = _fused_interpret(q, k, v, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_bf16(rng):
    b, h, n, m, d = 1, 2, 256, 192, 64
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.bfloat16)
    want = _attention_xla(q, k, v, d ** -0.5).astype(jnp.float32)
    got = _fused_interpret(q, k, v, d ** -0.5).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_sra_attention_module_matches_manual(rng):
    """JointSRAttention (sr>1) against a hand-rolled numpy reference of the
    split-downsample-concat attention (libs/pvlt.py:95-121)."""
    from flax import linen as nn

    from mvlt_tpu.models.pvlt import JointSRAttention

    b, hgrid, wgrid, t, c, heads, sr = 2, 8, 8, 4, 16, 2, 2
    n = hgrid * wgrid + t
    x = rng.normal(size=(b, n, c)).astype(np.float32)

    attn = JointSRAttention(dim=c, num_heads=heads, sr_ratio=sr, qkv_bias=True,
                            use_pallas=False)
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(x), (hgrid, wgrid), t)
    got = np.asarray(attn.apply(variables, jnp.asarray(x), (hgrid, wgrid), t))

    p = variables["params"]
    # manual: q over all tokens
    q = x @ np.asarray(p["q"]["kernel"]) + np.asarray(p["q"]["bias"])
    # visual tokens -> grid -> strided conv (kernel sr x sr, stride sr)
    vis = x[:, : hgrid * wgrid].reshape(b, hgrid, wgrid, c)
    kern = np.asarray(p["sr"]["kernel"])  # [sr, sr, c, c]
    out_h, out_w = hgrid // sr, wgrid // sr
    red = np.zeros((b, out_h, out_w, c), np.float32)
    for i in range(out_h):
        for j in range(out_w):
            patch = vis[:, i * sr:(i + 1) * sr, j * sr:(j + 1) * sr, :]
            red[:, i, j] = np.einsum("bhwc,hwcd->bd", patch, kern)
    red = red + np.asarray(p["sr"]["bias"])
    red = red.reshape(b, out_h * out_w, c)
    # LN (eps 1e-5)
    mu = red.mean(-1, keepdims=True)
    var = red.var(-1, keepdims=True)
    red = (red - mu) / np.sqrt(var + 1e-5)
    red = red * np.asarray(p["norm"]["scale"]) + np.asarray(p["norm"]["bias"])
    kv_in = np.concatenate([red, x[:, hgrid * wgrid:]], axis=1)
    kv = kv_in @ np.asarray(p["kv"]["kernel"]) + np.asarray(p["kv"]["bias"])
    m = kv_in.shape[1]
    kv = kv.reshape(b, m, 2, heads, c // heads).transpose(2, 0, 3, 1, 4)
    kmat, vmat = kv[0], kv[1]
    qh = q.reshape(b, n, heads, c // heads).transpose(0, 2, 1, 3)
    logits = np.einsum("bhnd,bhmd->bhnm", qh, kmat) * (c // heads) ** -0.5
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    out = np.einsum("bhnm,bhmd->bhnd", probs, vmat).transpose(0, 2, 1, 3).reshape(b, n, c)
    want = out @ np.asarray(p["proj"]["kernel"]) + np.asarray(p["proj"]["bias"])

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_attention_grad_matches_xla(rng):
    """Custom-VJP backward kernel vs jax.grad through the einsum path."""
    from unittest import mock

    import jax.experimental.pallas as pl

    b, h, n, m, d = 1, 2, 64, 24, 16
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    scale = d ** -0.5
    cotangent = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(_attention_xla(q, k, v, scale) * cotangent)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(pl, "pallas_call", patched):
        from mvlt_tpu.ops.pallas_attention import fused_attention_vjp

        def loss_fused(q, k, v):
            return jnp.sum(fused_attention_vjp(q, k, v, scale) * cotangent)

        got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)

    for g_got, g_want, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_fused_attention_grad_multi_tile(rng):
    """dk/dv accumulation across multiple q-tiles (forces n_tiles > 1 by
    patching the logits budget)."""
    from unittest import mock

    import jax.experimental.pallas as pl
    from mvlt_tpu.ops import pallas_attention

    b, h, n, m, d = 1, 1, 512, 16, 8
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(_attention_xla(q, k, v, 0.3) * cot)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(pl, "pallas_call", patched), \
         mock.patch.object(pallas_attention, "_LOGITS_BUDGET", 128 * 128 * 4):
        def loss_fused(q, k, v):
            return jnp.sum(pallas_attention.fused_attention_vjp(q, k, v, 0.3) * cot)

        got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)

    for g_got, g_want, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


class TestAttnProbDropout:
    """Attention-prob dropout (libs/pvlt.py:88, 96): implemented on the XLA
    einsum path; identity at eval; training applies a real mask + 1/keep
    scale with grads flowing."""

    def _model(self, rate):
        from mvlt_tpu.config import LossType, ModelConfig
        from mvlt_tpu.models import create_model

        cfg = ModelConfig(
            img_size=64, embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 2, 4),
            mlp_ratios=(2, 2, 2, 2), token_hidden_size=32, num_text_tokens=16,
            vocab_size=64, max_position_embeddings=32, itg_channel=8,
            compute_dtype="float32", use_pallas_attention=False,
            drop_path_rate=0.0, attn_drop_rate=rate,
            loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False))
        return cfg, create_model(cfg)

    def test_eval_identical_to_no_dropout(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        cfg, m0 = self._model(0.0)
        _, m1 = self._model(0.3)
        imgs = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                           jnp.float32)
        ids = jnp.asarray(np.random.default_rng(1).integers(
            0, cfg.vocab_size, (2, 16)), jnp.int32)
        v = jax.jit(m0.init)(jax.random.PRNGKey(0), imgs, ids)
        a = m0.apply(v, imgs, ids, train=False)["itm_logits"]
        b = m1.apply(v, imgs, ids, train=False)["itm_logits"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_applies_dropout_with_finite_grads(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        cfg, model = self._model(0.5)
        imgs = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                           jnp.float32)
        ids = jnp.asarray(np.random.default_rng(1).integers(
            0, cfg.vocab_size, (2, 16)), jnp.int32)
        v = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, ids)

        def loss(params, key):
            out = model.apply({**v, "params": params}, imgs, ids, train=True,
                              rngs={"dropout": key})
            return out["itm_logits"].sum()

        l1, g = jax.value_and_grad(loss)(v["params"], jax.random.PRNGKey(1))
        l2 = loss(v["params"], jax.random.PRNGKey(2))
        l0 = model.apply(v, imgs, ids, train=False)["itm_logits"].sum()
        # different dropout keys -> different losses, and both differ from eval
        assert l1 != l2 and l1 != l0
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))
