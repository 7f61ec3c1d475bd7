"""PVT-v2 backbone variant tests (overlap patch embed, DWConv MLP,
linear SRA)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model


def v2_cfg(**kw):
    base = dict(
        name="pvlt_v2_tiny",
        img_size=64, embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 2, 4),
        mlp_ratios=(2, 2, 2, 2), token_hidden_size=32, num_text_tokens=16,
        vocab_size=64, max_position_embeddings=32, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=False, drop_path_rate=0.0,
        loss_type=LossType(itm=True, mlm=False, t2i=True, cls=False),
        # pool window must divide the stage grids (16/8/4/2 here)
        # linear variant overrides below use pool 2
    )
    base.update(kw)
    return ModelConfig(**base)


def run(cfg, img=64):
    model = create_model(cfg)
    imgs = jnp.asarray(np.random.default_rng(0).random((2, img, img, 3)), jnp.float32)
    ids = jnp.zeros((2, cfg.num_text_tokens), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, ids)
    return model, variables, model.apply(variables, imgs, ids)


def test_v2_forward_shapes():
    cfg = v2_cfg()
    model, variables, out = run(cfg)
    assert model.cfg.variant == "v2"
    assert out["itm_logits"].shape == (2, 1, 2)
    assert out["t2i_logits"].shape == (2, 64, 64, 3)
    # overlap patch embed produces the same /4 /8 /16 /32 grids
    p = variables["params"]
    assert p["patch_embed1"]["proj"]["kernel"].shape == (7, 7, 3, 8)
    assert p["patch_embed2"]["proj"]["kernel"].shape == (3, 3, 8, 16)
    # DWConv MLP present
    assert "dwconv" in p["block1_0"]["mlp"]


def test_v2_registry():
    from mvlt_tpu.models import MODEL_REGISTRY

    assert MODEL_REGISTRY["pvlt_v2_small"]["variant"] == "v2"
    assert MODEL_REGISTRY["pvlt_v2_linear_tiny"]["linear_sr"] is True


def test_v2_linear_sr():
    # pool=2 divides all stage grids of the 64-px micro config
    cfg = dataclasses.replace(v2_cfg(name="pvlt_v2_linear_tiny"))
    model = create_model(cfg)
    assert model.cfg.linear_sr
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ids = jnp.zeros((1, 16), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, ids)
    out = model.apply(variables, imgs, ids)
    assert out["itm_logits"].shape == (1, 1, 2)


def test_v2_xla_kv_linear_sr_matches_module_math():
    """_xla_kv's linear_sr branch (the K/V front end feeding the fused
    attention-half kernel for v2 serving) must reproduce the module's
    linear-SRA construction: avg-pool -> 1x1 conv -> LN -> erf-GELU ->
    text re-concat -> KV projection."""
    from flax import linen as nn

    from mvlt_tpu.models.pvlt import Block

    rng = np.random.default_rng(3)
    dim, heads, hw, t = 64, 2, (16, 16), 12
    h, w = hw
    n = h * w + t
    block = Block(dim=dim, num_heads=heads, mlp_ratio=2.0, sr_ratio=4,
                  qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
                  ln_eps=1e-6, sr_ln_eps=1e-5, variant="v2", linear_sr=True,
                  use_pallas=False, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, n, dim)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x, hw, t)

    k, v, m = block.apply(variables, x, hw, method=Block._xla_kv)

    # reference: module math on LN1(x)
    p = variables["params"]
    xf = x.astype(jnp.float32)
    normed = ((xf - xf.mean(-1, keepdims=True))
              * jax.lax.rsqrt(xf.var(-1, keepdims=True) + 1e-6)
              * p["norm1"]["scale"] + p["norm1"]["bias"])
    pool = min(7, h, w)
    win = (h // pool, w // pool)
    vis = normed[:, : h * w].reshape(2, h, w, dim)
    vis = nn.avg_pool(vis, window_shape=win, strides=win)
    vis = jnp.einsum("bhwc,co->bhwo", vis,
                     p["attn"]["sr"]["kernel"][0, 0]) + p["attn"]["sr"]["bias"]
    vis = vis.reshape(2, -1, dim)
    vis = ((vis - vis.mean(-1, keepdims=True))
           * jax.lax.rsqrt(vis.var(-1, keepdims=True) + 1e-5)
           * p["attn"]["norm"]["scale"] + p["attn"]["norm"]["bias"])
    vis = jax.nn.gelu(vis, approximate=False)
    kv_in = jnp.concatenate([vis, normed[:, h * w :]], axis=1)
    kv = kv_in @ p["attn"]["kv"]["kernel"] + p["attn"]["kv"]["bias"]
    mm = kv_in.shape[1]
    kv = kv.reshape(2, mm, 2, heads, dim // heads).transpose(2, 0, 3, 1, 4)

    assert m == mm
    np.testing.assert_allclose(np.asarray(k), np.asarray(kv[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v), np.asarray(kv[1]),
                               rtol=2e-4, atol=2e-4)
