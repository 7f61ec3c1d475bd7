"""Model-level routing test for the v1 'full' serving path — the headline
bench.py configuration: stage-level lane-padded stream + whole-block
megakernel (ops/block_fused.py) + fused SR-KV front end (ops/sr_kv.py).

The gates require jax.default_backend() == 'tpu'; forcing them open under
interpret mode checks the stage-padding plumbing, the per-block param
wiring, and the SR-KV layout contract against the plain XLA forward."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from tests.kernel_utils import run_interpret


def _model(block_attn: str, use_pallas: bool, head_pair: bool = False):
    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.models import create_model

    cfg = ModelConfig(
        img_size=64, embed_dims=(16, 32, 64, 128), num_heads=(1, 2, 2, 4),
        mlp_ratios=(4, 4, 2, 2), token_hidden_size=32, num_text_tokens=16,
        vocab_size=64, max_position_embeddings=32, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=use_pallas,
        drop_path_rate=0.0, kernel_gelu="erf",
        loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
        block_attn_kernel=block_attn, head_pair_attn=head_pair,
    )
    return create_model(cfg)


def test_v1_full_kernel_path_matches_xla():
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)

    base = _model("none", use_pallas=False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), imgs, ids)
    want = np.asarray(base.apply(variables, imgs, ids, train=False)["itm_logits"])

    full = _model("full", use_pallas=True)
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        got = run_interpret(
            lambda: full.apply(variables, imgs, ids, train=False)["itm_logits"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_v1_full_head_pair_matches_xla():
    """hp2 end-to-end routing: head_pair_attn engages the paired SR-KV
    producer (ops/sr_kv.py head_pair) + fused_block(head_pair, kv_paired)
    at every multi-head stage; output must match the plain XLA forward."""
    rng = np.random.default_rng(12)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)

    base = _model("none", use_pallas=False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), imgs, ids)
    want = np.asarray(base.apply(variables, imgs, ids, train=False)["itm_logits"])

    hp2 = _model("full", use_pallas=True, head_pair=True)
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        got = run_interpret(
            lambda: hp2.apply(variables, imgs, ids, train=False)["itm_logits"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
