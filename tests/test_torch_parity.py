"""Numerical parity of converted layers against real torch ops (CPU).

torch here is the oracle for the layer semantics the reference relies on
(Linear/Conv2d/LayerNorm/GELU/BatchNorm/SmoothL1/CrossEntropy and HF
BertEmbeddings); the converter's layout transforms must make the flax layers
reproduce them to float32 precision.  This substitutes for golden-value
tests against the published checkpoints (not downloadable in this
environment) — it validates the exact transform rules those conversions use.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

RTOL, ATOL = 1e-5, 1e-5


def t2n(t):
    return t.detach().cpu().numpy()


def test_dense_matches_linear(rng):
    lin = torch.nn.Linear(12, 7)
    x = rng.normal(size=(3, 5, 12)).astype(np.float32)
    want = t2n(lin(torch.from_numpy(x)))
    dense = nn.Dense(7)
    params = {"kernel": jnp.asarray(t2n(lin.weight).T), "bias": jnp.asarray(t2n(lin.bias))}
    got = dense.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_conv_matches_conv2d(rng):
    conv = torch.nn.Conv2d(3, 8, kernel_size=4, stride=4)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    want = t2n(conv(torch.from_numpy(x)))  # NCHW
    fconv = nn.Conv(8, kernel_size=(4, 4), strides=(4, 4))
    params = {"kernel": jnp.asarray(t2n(conv.weight).transpose(2, 3, 1, 0)),
              "bias": jnp.asarray(t2n(conv.bias))}
    got = fconv.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=RTOL, atol=1e-4)


def test_conv3x3_padding1(rng):
    conv = torch.nn.Conv2d(5, 6, kernel_size=3, padding=1, bias=False)
    x = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    want = t2n(conv(torch.from_numpy(x)))
    fconv = nn.Conv(6, kernel_size=(3, 3), padding=1, use_bias=False)
    params = {"kernel": jnp.asarray(t2n(conv.weight).transpose(2, 3, 1, 0))}
    got = fconv.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=RTOL, atol=1e-4)


@pytest.mark.parametrize("eps", [1e-5, 1e-6, 1e-12])
def test_layernorm_eps(rng, eps):
    ln = torch.nn.LayerNorm(16, eps=eps)
    with torch.no_grad():
        ln.weight.uniform_(0.5, 1.5)
        ln.bias.uniform_(-0.5, 0.5)
    x = rng.normal(size=(4, 16)).astype(np.float32)
    want = t2n(ln(torch.from_numpy(x)))
    fln = nn.LayerNorm(epsilon=eps)
    params = {"scale": jnp.asarray(t2n(ln.weight)), "bias": jnp.asarray(t2n(ln.bias))}
    got = fln.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_erf_gelu(rng):
    from mvlt_tpu.models.heads import erf_gelu

    x = rng.normal(size=(100,)).astype(np.float32) * 3
    want = t2n(torch.nn.functional.gelu(torch.from_numpy(x)))  # exact erf form
    got = erf_gelu(jnp.asarray(x))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_batchnorm_eval_matches(rng):
    bn = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-0.5, 0.5)
        bn.running_mean.uniform_(-1, 1)
        bn.running_var.uniform_(0.5, 2.0)
    bn.eval()
    x = rng.normal(size=(2, 6, 4, 4)).astype(np.float32)
    want = t2n(bn(torch.from_numpy(x)))
    fbn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.asarray(t2n(bn.weight)), "bias": jnp.asarray(t2n(bn.bias))},
        "batch_stats": {"mean": jnp.asarray(t2n(bn.running_mean)),
                        "var": jnp.asarray(t2n(bn.running_var))},
    }
    got = fbn.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=RTOL, atol=1e-4)


def test_bert_embeddings_parity(rng):
    """My BertEmbeddings vs HF's, weights converted with the converter's
    naming (text_embeddings.* keys)."""
    transformers = pytest.importorskip("transformers")
    from transformers.models.bert.modeling_bert import BertConfig, BertEmbeddings as HFBertEmbeddings

    from mvlt_tpu.convert.torch_to_jax import convert_state_dict
    from mvlt_tpu.models.bert_embeddings import BertEmbeddings

    hf_cfg = BertConfig(vocab_size=128, hidden_size=24, max_position_embeddings=32,
                        type_vocab_size=2, hidden_dropout_prob=0.0, layer_norm_eps=1e-12)
    hf = HFBertEmbeddings(hf_cfg).eval()

    ids = rng.integers(0, 128, (3, 16))
    want = t2n(hf(torch.from_numpy(ids)))

    mine = BertEmbeddings(vocab_size=128, hidden_size=24, max_position_embeddings=32,
                          type_vocab_size=2, dropout_rate=0.0)
    template = mine.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32))["params"]
    sd = {f"text_embeddings.{k}": t2n(v) for k, v in hf.state_dict().items()}
    params, _, report = convert_state_dict(
        sd, {"text_embeddings": template}, verbose=False)
    assert not report["unmapped"], report["unmapped"]
    got = mine.apply({"params": params["text_embeddings"]}, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_cross_entropy_ignore_index(rng):
    from mvlt_tpu.train.losses import cross_entropy

    logits = rng.normal(size=(10, 7)).astype(np.float32)
    labels = rng.integers(0, 7, (10,))
    labels[::3] = -1
    want = torch.nn.CrossEntropyLoss(ignore_index=-1)(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), ignore_index=-1))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # all-ignored edge case: torch returns nan; ours returns 0 (the engine
    # never hits this — every caption has maskable tokens — but 0 keeps
    # training robust).  Just check it doesn't blow up:
    assert np.isfinite(float(cross_entropy(jnp.asarray(logits),
                                           jnp.asarray(np.full(10, -1)), ignore_index=-1)))


def test_smooth_l1(rng):
    from mvlt_tpu.train.losses import smooth_l1

    a = rng.normal(size=(50,)).astype(np.float32) * 2
    b = rng.normal(size=(50,)).astype(np.float32)
    want = torch.nn.SmoothL1Loss()(torch.from_numpy(a), torch.from_numpy(b)).item()
    got = float(smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_upsample_align_corners(rng):
    from mvlt_tpu.ops.upsample import upsample_bilinear_align_corners

    x = rng.normal(size=(2, 4, 6, 3)).astype(np.float32)
    for scale in (2, 8):
        want = t2n(torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=scale,
            mode="bilinear", align_corners=True))
        got = upsample_bilinear_align_corners(jnp.asarray(x), scale)
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5)


def test_pos_embed_resize_matches_interpolate(rng):
    """_resize_pos_embed vs torch F.interpolate(align_corners=False)
    (libs/pvlt.py:291-297 semantics)."""
    from mvlt_tpu.models.pvlt import _resize_pos_embed

    c, gh, gw, h, w = 5, 7, 7, 8, 8
    pos = rng.normal(size=(1, gh * gw, c)).astype(np.float32)
    want = t2n(torch.nn.functional.interpolate(
        torch.from_numpy(pos.reshape(1, gh, gw, c).transpose(0, 3, 1, 2)),
        size=(h, w), mode="bilinear"))
    got = _resize_pos_embed(jnp.asarray(pos), (gh, gw), (h, w))
    got2d = np.asarray(got).reshape(1, h, w, c).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got2d, want, rtol=1e-4, atol=1e-5)
