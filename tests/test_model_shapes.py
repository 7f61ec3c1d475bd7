"""Golden shape-law tests for the PVLT forward pass.

The expected shapes come from the reference shape walk (SURVEY.md §3.2;
libs/pvlt.py:322-356): for img_size input, pvlt produces per-stage image
feature grids of /4 /8 /16 /32 with dims 64/128/320/512, four [B, T, dim]
text feature streams, and head logits mlm [B,T,vocab] / itm [B,1,2] /
sup [B,1,48] / sub [B,1,122] / t2i [B,H,W,3] (NHWC here).

Tests run on a *micro* config (small vocab/hidden/text-len) because this box
has one CPU core and full-size XLA compiles take minutes; the architecture
code paths are identical.  Full-size shapes are exercised on TPU by bench.py
and __graft_entry__.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model

B = 2


def micro_cfg(**kw):
    base = dict(
        name="pvlt_tiny",
        img_size=64,            # grids 16/8/4/2
        embed_dims=(8, 16, 32, 64),
        num_heads=(1, 2, 2, 4),
        mlp_ratios=(2, 2, 2, 2),
        token_hidden_size=32,
        num_text_tokens=16,
        vocab_size=64,
        max_position_embeddings=32,
        itg_channel=8,
        compute_dtype="float32",
        use_pallas_attention=False,
        drop_path_rate=0.0,
        loss_type=LossType(itm=True, mlm=True, t2i=True, cls=True),
    )
    base.update(kw)
    return ModelConfig(**base)


def init_and_run(cfg, batch=B, train=False):
    model = create_model(cfg)
    imgs = jnp.zeros((batch, cfg.img_size, cfg.img_size, 3), jnp.float32)
    ids = jnp.zeros((batch, cfg.num_text_tokens), jnp.int32)
    variables = jax.jit(model.init, static_argnames=())(jax.random.PRNGKey(0), imgs, ids)
    out = model.apply(variables, imgs, ids, train=train,
                      mutable=["batch_stats"] if train else False,
                      rngs={"dropout": jax.random.PRNGKey(1)} if train else None)
    return variables, out


@pytest.fixture(scope="module")
def base_run():
    cfg = micro_cfg()
    variables, out = init_and_run(cfg)
    return cfg, variables, out


def test_forward_logit_shapes(base_run):
    cfg, _, out = base_run
    assert out["mlm_logits"].shape == (B, cfg.num_text_tokens, cfg.vocab_size)
    assert out["itm_logits"].shape == (B, 1, 2)
    assert out["sup_cls_logits"].shape == (B, 1, 48)
    assert out["sub_cls_logits"].shape == (B, 1, 122)
    assert out["t2i_logits"].shape == (B, cfg.img_size, cfg.img_size, 3)


def test_disabled_heads_return_none():
    cfg = micro_cfg(loss_type=LossType(itm=False, mlm=False, t2i=False, cls=True))
    _, out = init_and_run(cfg)
    assert out["mlm_logits"] is None
    assert out["itm_logits"] is None
    assert out["t2i_logits"] is None
    assert out["sup_cls_logits"].shape == (B, 1, 48)


def test_nchw_inputs_accepted(base_run):
    """The reference API feeds NCHW images (engine_grid_masking.py:42); the
    model accepts either layout and produces identical logits."""
    cfg, variables, out1 = base_run
    model = create_model(cfg)
    imgs = jnp.zeros((B, cfg.img_size, cfg.img_size, 3), jnp.float32)
    ids = jnp.zeros((B, cfg.num_text_tokens), jnp.int32)
    out2 = model.apply(variables, imgs.transpose(0, 3, 1, 2), ids)
    np.testing.assert_allclose(out1["itm_logits"], out2["itm_logits"], rtol=1e-6)


def test_pos_embed_param_shapes(base_run):
    """Stage-4 pos embed carries the +1 PVT cls slot (libs/pvlt.py:209)."""
    cfg, variables, _ = base_run
    p = variables["params"]
    g1 = cfg.img_size // cfg.patch_size
    assert p["pos_embed1"].shape == (1, g1 * g1, cfg.embed_dims[0])
    g4 = g1 // 8
    assert p["pos_embed4"].shape == (1, g4 * g4 + 1, cfg.embed_dims[3])
    for i in range(1, 5):
        assert p[f"text_pos_embed{i}"].shape[1] == cfg.num_text_tokens


def test_resolution_generalization(base_run):
    """Pos embeds bilinearly resize for off-config resolutions
    (libs/pvlt.py:291-297): init at 64, run at 128."""
    cfg, variables, _ = base_run
    model = create_model(cfg)
    ids = jnp.zeros((1, cfg.num_text_tokens), jnp.int32)
    imgs128 = jnp.zeros((1, 128, 128, 3), jnp.float32)
    out = model.apply(variables, imgs128, ids)
    assert out["itm_logits"].shape == (1, 1, 2)
    assert out["t2i_logits"].shape == (1, 128, 128, 3)


def test_train_mode_runs_with_batchstats():
    cfg = micro_cfg(drop_path_rate=0.1)
    _, (out, mutated) = init_and_run(cfg, train=True)
    assert "batch_stats" in mutated
    assert jnp.isfinite(out["t2i_logits"]).all()


def test_mlm_decoder_weight_tied(base_run):
    """MLM decoder shares the BERT word-embedding table
    (libs/vl_heads.py:62): no separate [vocab, hidden] decoder kernel
    exists, and perturbing the embedding table changes MLM logits."""
    cfg, variables, out1 = base_run
    assert "mlm_decoder" not in variables["params"].get("mlm_head", {})
    model = create_model(cfg)
    imgs = jnp.zeros((B, cfg.img_size, cfg.img_size, 3), jnp.float32)
    ids = jnp.zeros((B, cfg.num_text_tokens), jnp.int32)
    mutated = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    emb = mutated["params"]["text_embeddings"]["word_embeddings"]["embedding"]
    mutated["params"]["text_embeddings"]["word_embeddings"]["embedding"] = emb + 1.0
    out2 = model.apply(mutated, imgs, ids)
    assert not np.allclose(out1["mlm_logits"], out2["mlm_logits"])


def test_registry_depths():
    from mvlt_tpu.models import MODEL_REGISTRY

    assert MODEL_REGISTRY["pvlt_small"]["depths"] == (3, 4, 6, 3)
    assert MODEL_REGISTRY["pvlt_medium"]["depths"] == (3, 4, 18, 3)
    assert MODEL_REGISTRY["pvlt_large"]["depths"] == (3, 8, 27, 3)
    cfg = dataclasses.replace(micro_cfg(), name="pvlt_small")
    model = create_model(cfg)
    assert model.cfg.depths == (3, 4, 6, 3)


def test_attn_drop_init_ok():
    """attn_drop is implemented on the XLA path as of round 4 (prob-dropout
    in JointSRAttention); a nonzero rate must construct and init cleanly.
    The dropout semantics themselves are covered by
    tests/test_attention.py::TestAttnProbDropout, and unsupported combos
    (swin) reject at create_model time (tests/test_config.py)."""
    import jax
    import jax.numpy as jnp

    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.models import create_model

    cfg = ModelConfig(
        img_size=32, embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 2, 4),
        mlp_ratios=(2, 2, 2, 2), token_hidden_size=32, num_text_tokens=8,
        vocab_size=64, max_position_embeddings=16, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=False,
        attn_drop_rate=0.1,
        loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False))
    model = create_model(cfg)
    imgs = jnp.zeros((1, 32, 32, 3), jnp.float32)
    ids = jnp.zeros((1, 8), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), imgs, ids)
    assert v["params"] is not None
