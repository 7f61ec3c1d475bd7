"""Sequence parallelism: sharding the joint token axis over the model axis
must not change the forward (GSPMD handles the KV-path gathers)."""

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model
from mvlt_tpu.parallel import make_mesh, shard_batch


def micro_cfg():
    return ModelConfig(
        img_size=32, embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 2, 4),
        mlp_ratios=(2, 2, 2, 2), token_hidden_size=32, num_text_tokens=16,
        vocab_size=64, max_position_embeddings=32, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=False, drop_path_rate=0.0,
        loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
    )
    # token counts per stage: 8*8+16=80, 4*4+16=32, 2*2+16=20, 1+16=17
    # (80 and 32 divide by model=2; 20/17 fall back to replication)


def test_sp_forward_matches_unsharded(rng):
    cfg = micro_cfg()
    imgs = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (4, 16)), jnp.int32)

    base = create_model(cfg)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), imgs, ids)
    want = np.asarray(base.apply(variables, imgs, ids)["itm_logits"])

    mesh = make_mesh(dp_size=2, tp_size=4)
    sp_model = create_model(cfg, sp_mesh=mesh)

    @jax.jit
    def f(variables, imgs, ids):
        return sp_model.apply(variables, imgs, ids)["itm_logits"]

    sharded = shard_batch(mesh, {"images": imgs, "ids": ids})
    got = np.asarray(f(variables, sharded["images"], sharded["ids"]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
