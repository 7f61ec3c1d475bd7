"""Data-axis-sharded eval == unsharded eval (VERDICT round 1, Missing #4).

The reference evaluates serially on rank 0 (engine_grid_masking.py:337-393),
idling world-1 devices; here every eval batch shards over the mesh's data
axis with the ragged tail padded + masked.  These tests pin exactness: the
dp8 sharded run must reproduce the unsharded metrics (accuracy counts
bit-exact, losses to float tolerance) on a dataset sized to force a ragged
final batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def mesh8():
    from mvlt_tpu.parallel import make_mesh

    return make_mesh(dp_size=8, tp_size=1)


@pytest.fixture(scope="module")
def vl_setup():
    from mvlt_tpu.config import DataConfig, LossType, ModelConfig
    from mvlt_tpu.models import create_model

    cfg = ModelConfig(
        img_size=32, embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 2, 4),
        mlp_ratios=(2, 2, 2, 2), token_hidden_size=32, num_text_tokens=16,
        vocab_size=30522, max_position_embeddings=64, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=False,
        loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False))
    dcfg = DataConfig(input_size=32, num_text_tokens=16, synthetic=True)
    model = create_model(cfg)
    imgs = jnp.zeros((1, 32, 32, 3), jnp.float32)
    ids = jnp.zeros((1, 16), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, ids)
    return cfg, dcfg, model, variables


def _vl_loader(dcfg, batch):
    from mvlt_tpu.data.fashion_gen import SyntheticFashionGen
    from mvlt_tpu.data.pipeline import DataLoader
    from mvlt_tpu.data.samplers import SequentialSampler

    ds = SyntheticFashionGen(dcfg, size=28, seed=3)  # 28 = ragged vs any batch
    return DataLoader(ds, SequentialSampler(len(ds)), batch,
                      num_workers=0, drop_last=False)


def test_vl_eval_sharded_matches_unsharded(vl_setup, mesh8):
    from mvlt_tpu.eval.vl_eval import evaluate_vl, make_vl_eval_fn

    cfg, dcfg, model, variables = vl_setup
    eval_fn = make_vl_eval_fn(model, cfg)
    # batch 12 -> batches of 12, 12, 4: final batch pads 4 -> 8 on the mesh
    plain = evaluate_vl(eval_fn, variables, _vl_loader(dcfg, 12), mesh=None,
                        is_main=False)
    sharded = evaluate_vl(eval_fn, variables, _vl_loader(dcfg, 12), mesh=mesh8,
                          is_main=False)
    assert sharded["mlm_acc"] == plain["mlm_acc"]         # count-exact
    assert sharded["itm_acc"] == plain["itm_acc"]
    np.testing.assert_allclose(sharded["total_loss"], plain["total_loss"], rtol=1e-5)
    np.testing.assert_allclose(sharded["t2i_psnr"], plain["t2i_psnr"], rtol=1e-5)


def test_vl_eval_batches_actually_sharded(vl_setup, mesh8, capsys):
    """The jitted eval fn must receive data-axis-sharded arrays (not
    replicated ones) — assert on the placed sharding itself."""
    from mvlt_tpu.eval.vl_eval import pad_eval_batch
    from mvlt_tpu.parallel.sharding import shard_batch

    feed = {"images": np.zeros((4, 8, 8, 3), np.float32),
            "mlm_labels": np.zeros((4, 16), np.int32)}
    feed = pad_eval_batch(feed, 8)
    assert feed["images"].shape[0] == 8
    assert feed["valid"].tolist() == [1, 1, 1, 1, 0, 0, 0, 0]
    placed = shard_batch(mesh8, feed)
    spec = placed["images"].sharding.spec
    assert spec[0] == "data"


def test_retrieval_sharded_matches_unsharded(mesh8):
    from mvlt_tpu.eval.retrieval import evaluate_retrieval

    rng = np.random.default_rng(0)
    C, H, T = 7, 8, 6  # 7 candidates per bundle (stand-in for 101)
    bundles = [
        {"images_101": rng.random((q, C, H, H, 3)).astype(np.float32),
         "ori_input_ids_101": rng.integers(0, 50, (q, C, T)).astype(np.int32)}
        for q in (3, 3, 2)  # 8 queries, ragged vs dp=8 per-step
    ]

    def scorer(images, ids):
        # deterministic pseudo-ITM score from the inputs
        return jnp.asarray(images).reshape(images.shape[0], -1).mean(-1) \
            + 0.01 * jnp.asarray(ids).sum(-1)

    plain = evaluate_retrieval(scorer, bundles, mesh=None, is_main=False)
    sharded = evaluate_retrieval(scorer, bundles, mesh=mesh8, is_main=False)
    assert plain == sharded
    assert plain["num_queries"] == 8


def test_recognition_sharded_matches_unsharded(mesh8, tmp_path):
    from mvlt_tpu.eval.recognition import evaluate_recognition

    rng = np.random.default_rng(1)
    batches = [
        {"images": rng.random((b, 8, 8, 3)).astype(np.float32),
         "ori_input_ids": rng.integers(0, 50, (b, 6)).astype(np.int32),
         "sup_cls_labels": rng.integers(0, 4, (b,)).astype(np.int32),
         "sub_cls_labels": rng.integers(0, 6, (b,)).astype(np.int32)}
        for b in (8, 8, 5)  # ragged tail
    ]

    def scorer(images, ids):
        flat = jnp.asarray(images).reshape(images.shape[0], -1)
        return (flat.mean(-1) * 40).astype(jnp.int32) % 4, \
               (jnp.asarray(ids).sum(-1)).astype(jnp.int32) % 6

    plain = evaluate_recognition(scorer, batches, num_super=4, num_sub=6,
                                 mesh=None, is_main=False)
    sharded = evaluate_recognition(scorer, batches, num_super=4, num_sub=6,
                                   mesh=mesh8, is_main=False)
    assert plain == sharded
