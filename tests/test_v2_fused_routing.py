"""Model-level routing test for the v2 fused serving paths.

The v2 kernel gates require jax.default_backend() == 'tpu', so on the CPU
test mesh the fused wiring (param-tree paths, argument order into
ops/dwconv_mlp.py and the fused attention half) never executes — a wiring
bug would only surface on hardware at flip time.  Here we force the gates
open (backend mock + pallas interpret mode) and check the WHOLE v2 model
forward against the unfused path."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from tests.kernel_utils import run_interpret


def _model(dwconv_kernel: bool, block_attn: str, linear_sr: bool = False,
           use_pallas: bool = True):
    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.models import create_model

    cfg = ModelConfig(
        name="pvlt_v2_tiny", variant="v2", linear_sr=linear_sr,
        img_size=64, embed_dims=(16, 32, 64, 128), num_heads=(1, 2, 2, 4),
        mlp_ratios=(4, 4, 2, 2), token_hidden_size=32, num_text_tokens=16,
        vocab_size=64, max_position_embeddings=32, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=use_pallas,
        drop_path_rate=0.0, kernel_gelu="erf",
        loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
        dwconv_mlp_kernel=dwconv_kernel, block_attn_kernel=block_attn,
    )
    return create_model(cfg)


def _check(linear_sr: bool):
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)

    base = _model(dwconv_kernel=False, block_attn="none",
                  linear_sr=linear_sr, use_pallas=False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), imgs, ids)
    want = np.asarray(base.apply(variables, imgs, ids, train=False)["itm_logits"])

    fused = _model(dwconv_kernel=True, block_attn="mega", linear_sr=linear_sr)
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        got = run_interpret(
            lambda: fused.apply(variables, imgs, ids, train=False)["itm_logits"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_v2_fused_serving_paths_match_unfused():
    _check(linear_sr=False)   # conv-SR K/V front end (s2d+GEMM branch)


def test_v2_linear_sr_fused_serving_paths_match_unfused():
    _check(linear_sr=True)    # avg-pool linear-SRA K/V front end


def test_v2_full_stage_stream_matches_unfused():
    """The v2 whole-stage fused path (block_attn='full': lane-padded stream
    -> SR-KV kernel + padded attention half + padded DWConv-MLP kernel).
    At img_size=64 stages 1-2 satisfy the 8-aligned-grid gate and run fused
    while stages 3-4 fall back to the modular path — exercising both the
    fused wiring and the per-stage gate in one forward."""
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)

    base = _model(dwconv_kernel=False, block_attn="none", use_pallas=False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), imgs, ids)
    want = np.asarray(base.apply(variables, imgs, ids, train=False)["itm_logits"])

    fused = _model(dwconv_kernel=True, block_attn="full")
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        got = run_interpret(
            lambda: fused.apply(variables, imgs, ids, train=False)["itm_logits"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_v2_pack_stage1_routing_matches_xla():
    """The v2 PACKED stage-1 path (pack_stage1 + block_attn='full' with a
    dim-64 single-head stage 1): packed SR-KV + packed attention half +
    packed DWConv-MLP, gates forced open, against the plain XLA forward."""
    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.models import create_model

    def build(use_pallas, pack):
        cfg = ModelConfig(
            name="pvlt_v2_tiny", variant="v2",
            img_size=64, embed_dims=(64, 32, 64, 128), num_heads=(1, 2, 2, 4),
            mlp_ratios=(4, 4, 2, 2), token_hidden_size=32, num_text_tokens=16,
            vocab_size=64, max_position_embeddings=32, itg_channel=8,
            compute_dtype="float32", use_pallas_attention=use_pallas,
            drop_path_rate=0.0, kernel_gelu="erf",
            loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
            dwconv_mlp_kernel=True, block_attn_kernel="full",
            pack_stage1=pack,
        )
        return create_model(cfg)

    rng = np.random.default_rng(23)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)

    base = build(use_pallas=False, pack=False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), imgs, ids)
    want = np.asarray(base.apply(variables, imgs, ids, train=False)["itm_logits"])

    packed = build(use_pallas=True, pack=True)
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        got = run_interpret(
            lambda: packed.apply(variables, imgs, ids, train=False)["itm_logits"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
