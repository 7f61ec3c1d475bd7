"""Train-step tests: loss decreases, parity alternation, DP invariance.

DP invariance is the key distributed-correctness property (the reference
gets it from DDP's gradient all-reduce; here from GSPMD): a step on an
8-device data-parallel mesh must produce the same parameters as the same
step on one device.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvlt_tpu.config import LossType, ModelConfig, OptimConfig
from mvlt_tpu.models import create_model
from mvlt_tpu.parallel import make_mesh, shard_batch, state_shardings
from mvlt_tpu.train.schedule import make_optimizer
from mvlt_tpu.train.state import create_train_state
from mvlt_tpu.train.step import make_train_step

B = 8
IMG = 32
T = 16


def micro_cfg(**kw):
    base = dict(
        img_size=IMG, embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 2, 4),
        mlp_ratios=(2, 2, 2, 2), token_hidden_size=32, num_text_tokens=T,
        vocab_size=64, max_position_embeddings=32, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=False, drop_path_rate=0.0,
        loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False),
    )
    base.update(kw)
    return ModelConfig(**base)


def make_batch(rng, b=B):
    imgs = rng.random((b, IMG, IMG, 3)).astype(np.float32)
    return {
        "images": imgs,
        "masked_images": np.where(rng.random((b, IMG, IMG, 1)) < 0.5, 1e-6, imgs).astype(np.float32),
        "input_ids": rng.integers(0, 64, (b, T)).astype(np.int32),
        "ori_input_ids": rng.integers(0, 64, (b, T)).astype(np.int32),
        "mlm_labels": np.where(rng.random((b, T)) < 0.15,
                               rng.integers(0, 64, (b, T)), -1).astype(np.int32),
        "itm_labels": rng.integers(0, 2, (b,)).astype(np.int32),
        "sup_cls_labels": rng.integers(0, 48, (b,)).astype(np.int32),
        "sub_cls_labels": rng.integers(0, 122, (b,)).astype(np.int32),
    }


@pytest.fixture(scope="module")
def setup(request):
    cfg = micro_cfg()
    model = create_model(cfg)
    tx = make_optimizer(OptimConfig(epochs=2, warmup_epochs=0, batch_size=B), B, 10)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((B, IMG, IMG, 3), jnp.float32)
    ids = jnp.zeros((B, T), jnp.int32)
    state = create_train_state(model, tx, rng, imgs, ids)
    return cfg, model, state


def test_loss_decreases(setup):
    cfg, model, state = setup
    step = make_train_step(model, cfg, donate=False)
    rng = jax.random.PRNGKey(1)
    batch = make_batch(np.random.default_rng(0))
    first = None
    for i in range(8):
        state, losses = step(state, batch, rng)
        total = float(losses["total_loss"])
        assert np.isfinite(total)
        if i == 0:
            first = total
    assert float(losses["total_loss"]) < first, "loss did not decrease on a fixed batch"


def test_parity_alternation(setup):
    """Even steps consume clean images, odd steps masked images: with
    radically different masked images, the t2i loss must differ across
    parities."""
    cfg, model, state = setup
    step = make_train_step(model, cfg, donate=False)
    rng = jax.random.PRNGKey(1)
    batch = make_batch(np.random.default_rng(0))
    batch["masked_images"] = np.full_like(batch["images"], 1e-6)
    assert int(state.step) % 2 == 0
    _, even_losses = step(state, batch, rng)
    state_odd = state.replace(step=state.step + 1)
    _, odd_losses = step(state_odd, batch, rng)
    assert abs(float(even_losses["loss_t2i"]) - float(odd_losses["loss_t2i"])) > 1e-6


def test_dp_matches_single_device(setup):
    """Same batch, same init: 8-way DP step == single-device step."""
    cfg, model, state = setup
    batch = make_batch(np.random.default_rng(2))
    rng = jax.random.PRNGKey(3)

    step = make_train_step(model, cfg, donate=False)
    s_single, losses_single = step(state, batch, rng)

    mesh = make_mesh(dp_size=8, tp_size=1)
    sharded_state = jax.device_put(state, state_shardings(mesh, state))
    sharded_batch = shard_batch(mesh, batch)
    s_dp, losses_dp = step(sharded_state, sharded_batch, rng)

    np.testing.assert_allclose(float(losses_single["total_loss"]),
                               float(losses_dp["total_loss"]), rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(s_single.params)
    p2 = jax.tree_util.tree_leaves(jax.device_get(s_dp.params))
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_tp_matches_single_device(setup):
    """DP4 x TP2 mesh step == single-device step (model-sharded matmuls)."""
    cfg, model, state = setup
    batch = make_batch(np.random.default_rng(4))
    rng = jax.random.PRNGKey(5)

    step = make_train_step(model, cfg, donate=False)
    s_single, _ = step(state, batch, rng)

    mesh = make_mesh(dp_size=4, tp_size=2)
    sharded_state = jax.device_put(state, state_shardings(mesh, state))
    sharded_batch = shard_batch(mesh, batch)
    s_tp, _ = step(sharded_state, sharded_batch, rng)

    p1 = jax.tree_util.tree_leaves(s_single.params)
    p2 = jax.tree_util.tree_leaves(jax.device_get(s_tp.params))
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_cls_only_finetune_step(setup):
    """loss_type cls-only (dws_mvlt_ft_exp48): every step trains CLS on
    clean images (the stale-output quirk is deliberately fixed,
    SURVEY.md §3.5)."""
    cfg = micro_cfg(loss_type=LossType(itm=False, mlm=False, t2i=False, cls=True))
    model = create_model(cfg)
    tx = make_optimizer(OptimConfig(epochs=2, warmup_epochs=0, batch_size=B), B, 10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((B, IMG, IMG, 3)), jnp.zeros((B, T), jnp.int32))
    step = make_train_step(model, cfg, donate=False)
    batch = make_batch(np.random.default_rng(1))
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert float(losses["loss_sup_cls"]) > 0
    assert float(losses["loss_t2i"]) == 0
    assert float(losses["loss_mlm"]) == 0


def test_chunked_mlm_loss_matches_dense(rng):
    """chunked_mlm_loss == cross_entropy over the materialized logits."""
    import jax
    import jax.numpy as jnp

    from mvlt_tpu.train.losses import chunked_mlm_loss, cross_entropy

    bsz, t, h, vocab = 3, 10, 16, 50
    hidden = jnp.asarray(rng.normal(size=(bsz, t, h)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(vocab, h)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(vocab,)), jnp.float32)
    labels = jnp.asarray(np.where(rng.random((bsz, t)) < 0.3,
                                  rng.integers(0, vocab, (bsz, t)), -1), jnp.int32)
    logits = jnp.einsum("bth,vh->btv", hidden, table) + bias
    want = cross_entropy(logits.reshape(-1, vocab), labels.reshape(-1), ignore_index=-1)
    got = chunked_mlm_loss(hidden, table, bias, labels, chunk=8)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    # differentiable (checkpointed scan)
    g = jax.grad(lambda hh: chunked_mlm_loss(hh, table, bias, labels, chunk=8))(hidden)
    assert np.isfinite(np.asarray(g)).all()


def test_train_forward_skips_mlm_decode(setup):
    """With mlm_loss_chunk set, the training forward exposes mlm_hidden and
    no full-vocab logits (the eval forward still decodes)."""
    cfg, model, state = setup
    batch = make_batch(np.random.default_rng(5))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out, _ = model.apply(variables, jnp.asarray(batch["images"]),
                         jnp.asarray(batch["input_ids"]), train=True,
                         mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
    assert out["mlm_logits"] is None
    assert out["mlm_hidden"].shape == (B, T, cfg.token_hidden_size)
    out_eval = model.apply(variables, jnp.asarray(batch["images"]),
                           jnp.asarray(batch["input_ids"]), train=False)
    assert out_eval["mlm_logits"].shape == (B, T, cfg.vocab_size)


def test_device_masks_step(setup):
    """device_masks=True runs without masked_images in the batch and the
    odd-step t2i loss reflects on-device masking."""
    cfg, model, state = setup
    step = make_train_step(model, cfg, donate=False, device_masks=True,
                           mask_ratio=0.5, mask_patch_size=16)
    batch = make_batch(np.random.default_rng(7))
    del batch["masked_images"]
    state_odd = state.replace(step=state.step + 1)
    _, losses = step(state_odd, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(losses["total_loss"]))
    assert float(losses["loss_t2i"]) > 0


def test_gathered_mlm_loss_matches_dense(rng):
    """gathered_mlm_loss == full decode (value AND gradient) whenever the
    labeled count fits the capacity; only labeled rows get hidden grads."""
    import jax
    import jax.numpy as jnp

    from mvlt_tpu.train.losses import (chunked_mlm_loss, cross_entropy,
                                       gathered_mlm_loss)

    B, T, H, V = 3, 16, 8, 24
    hidden = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(V, H)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)), jnp.float32)
    labels = np.where(rng.random((B, T)) < 0.15, rng.integers(0, V, (B, T)), -1)
    labels = jnp.asarray(labels, jnp.int32)

    want = chunked_mlm_loss(hidden, table, bias, labels, chunk=8)
    got = gathered_mlm_loss(hidden, table, bias, labels,
                            capacity_frac=0.25, chunk=8)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    g_want = jax.grad(lambda h: chunked_mlm_loss(h, table, bias, labels, chunk=8))(hidden)
    g_got = jax.grad(lambda h: gathered_mlm_loss(
        h, table, bias, labels, capacity_frac=0.25, chunk=8))(hidden)
    np.testing.assert_allclose(g_got, g_want, rtol=1e-5, atol=1e-7)
    # unlabeled rows carry zero hidden gradient
    assert float(jnp.abs(jnp.where((labels == -1)[..., None], g_got, 0.0)).max()) == 0.0


def test_pretransform_mlm_gather_matches_full(setup):
    """The pre-transform MLM row gather (mlm_row_idx into the model, so the
    head adapter + BertHeadTransform run only on capacity rows) must produce
    the same loss and the same updated parameters as the full-stream decode.
    Needs B*T > 512 for the static capacity to actually shrink the stream."""
    b = 40  # n = 40*16 = 640 rows > 512 -> capacity 512 active
    batch = make_batch(np.random.default_rng(41), b=b)
    rng = jax.random.PRNGKey(43)

    cfg_g = micro_cfg(mlm_capacity_frac=0.25)
    cfg_f = micro_cfg(mlm_capacity_frac=1.0)
    model = create_model(cfg_g)
    tx = make_optimizer(OptimConfig(epochs=2, warmup_epochs=0, batch_size=b), b, 10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((b, IMG, IMG, 3), jnp.float32),
                               jnp.zeros((b, T), jnp.int32))

    # sanity: the plan is actually active at these shapes
    from mvlt_tpu.train.losses import mlm_gather_plan
    assert mlm_gather_plan(jnp.asarray(batch["mlm_labels"])) is not None

    s_g, l_g = make_train_step(model, cfg_g, donate=False)(state, batch, rng)
    s_f, l_f = make_train_step(create_model(cfg_f), cfg_f, donate=False)(state, batch, rng)

    np.testing.assert_allclose(float(l_g["loss_mlm"]), float(l_f["loss_mlm"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(l_g["total_loss"]), float(l_f["total_loss"]),
                               rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(s_g.params),
                    jax.tree_util.tree_leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=1e-6)


def test_gathered_mlm_loss_capacity_one_falls_back(rng):
    """capacity_frac >= 1 routes to the exact full decode."""
    import jax.numpy as jnp

    from mvlt_tpu.train.losses import chunked_mlm_loss, gathered_mlm_loss

    hidden = jnp.asarray(rng.normal(size=(2, 8, 4)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(12, 4)), jnp.float32)
    bias = jnp.zeros((12,), jnp.float32)
    labels = jnp.asarray(rng.integers(-1, 12, (2, 8)), jnp.int32)
    want = chunked_mlm_loss(hidden, table, bias, labels, chunk=4)
    got = gathered_mlm_loss(hidden, table, bias, labels, capacity_frac=1.0, chunk=4)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_hybrid_mesh_matches_single_device(setup):
    """Multi-slice hybrid mesh (2 simulated slices x dp2 x tp2): the train
    step over a DCN-aware device layout == single-device step.  Covers
    make_hybrid_mesh's CPU/simulated-slice fallback (the real-slice branch
    needs hardware with slice_index, exercised only on pods)."""
    from mvlt_tpu.parallel.mesh import make_hybrid_mesh

    cfg, model, state = setup
    batch = make_batch(np.random.default_rng(6))
    rng = jax.random.PRNGKey(7)

    step = make_train_step(model, cfg, donate=False)
    s_single, _ = step(state, batch, rng)

    mesh = make_hybrid_mesh(tp_size=2, n_slices=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    # model (tp) groups must not straddle a slice boundary: with 8 devices
    # in 2 slices, each tp pair must come from the same half of the list
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert (ids[:, 0] // 4 == ids[:, 1] // 4).all()

    sharded_state = jax.device_put(state, state_shardings(mesh, state))
    sharded_batch = shard_batch(mesh, batch)
    s_h, _ = step(sharded_state, sharded_batch, rng)

    p1 = jax.tree_util.tree_leaves(s_single.params)
    p2 = jax.tree_util.tree_leaves(jax.device_get(s_h.params))
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_hybrid_mesh_validation():
    from mvlt_tpu.parallel.mesh import make_hybrid_mesh

    with pytest.raises(ValueError, match="not divisible"):
        make_hybrid_mesh(tp_size=1, n_slices=3)
    with pytest.raises(ValueError, match="not divisible"):
        make_hybrid_mesh(tp_size=3, n_slices=2)


def test_scan_steps_matches_single_dispatch(setup):
    """make_train_step(scan_steps=2) on a [2, B, ...]-stacked batch must be
    numerically identical to two single-step dispatches (the per-step RNG
    folds in state.step, which advances inside the scan), and the metrics
    come back stacked per sub-step."""
    cfg, model, state = setup
    rng = jax.random.PRNGKey(9)
    r = np.random.default_rng(11)
    b0, b1 = make_batch(r), make_batch(r)

    step = make_train_step(model, cfg, donate=False)
    s_ref, m0 = step(state, b0, rng)
    s_ref, m1 = step(s_ref, b1, rng)

    scan = make_train_step(model, cfg, donate=False, scan_steps=2)
    stacked = {k: np.stack([b0[k], b1[k]]) for k in b0}
    s_scan, m = scan(state, stacked, rng)

    assert m["total_loss"].shape == (2,)
    np.testing.assert_allclose(float(m["total_loss"][0]), float(m0["total_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m["total_loss"][1]), float(m1["total_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(jax.device_get(s_scan.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_scan_steps_dp_sharded(setup):
    """The multi-step dispatch under a DP8 mesh with stacked-batch sharding
    (axis 1 = data) matches the single-device result."""
    cfg, model, state = setup
    rng = jax.random.PRNGKey(13)
    r = np.random.default_rng(17)
    b0, b1 = make_batch(r), make_batch(r)
    stacked = {k: np.stack([b0[k], b1[k]]) for k in b0}

    scan = make_train_step(model, cfg, donate=False, scan_steps=2)
    s_single, m_single = scan(state, stacked, rng)

    mesh = make_mesh(dp_size=8, tp_size=1)
    sharded_state = jax.device_put(state, state_shardings(mesh, state))
    sharded = shard_batch(mesh, stacked, stacked=True)
    s_dp, m_dp = scan(sharded_state, sharded, rng)

    np.testing.assert_allclose(np.asarray(m_single["total_loss"]),
                               np.asarray(m_dp["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(jax.device_get(s_dp.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_grad_accum_matches_manual_average(setup):
    """grad_accum=2 must apply the average of the two microbatches' grads
    (and average their loss rows): compare against a manual two-halves
    computation through the same forward."""
    cfg, model, state = setup
    rng = jax.random.PRNGKey(21)
    r = np.random.default_rng(23)
    batch = make_batch(r, b=B)

    accum = make_train_step(model, cfg, donate=False, grad_accum=2)
    s_accum, losses = accum(state, batch, rng)

    # manual: per-microbatch grads through an instrumented single step with
    # the SAME rng derivation (fold_in(step_rng, i)) and threaded BN stats
    from mvlt_tpu.train.losses import compute_losses

    step_rng = jax.random.fold_in(rng, state.step)
    halves = [{k: v[:B // 2] for k, v in batch.items()},
              {k: v[B // 2:] for k, v in batch.items()}]
    grads_sum = None
    bs = state.batch_stats
    for i, half in enumerate(halves):
        mb_rng = jax.random.fold_in(step_rng, i)
        images_in = jnp.asarray(half["images"], jnp.float32)  # step 0: clean

        def loss_fn(params, bs=bs, half=half, images_in=images_in, mb_rng=mb_rng):
            variables = {"params": params, "batch_stats": bs}
            out, new_ms = model.apply(
                variables, images_in, jnp.asarray(half["input_ids"]),
                train=True, mutable=["batch_stats"], rngs={"dropout": mb_rng})
            losses = compute_losses(out, half, cfg.num_super_classes,
                                    cfg.num_sub_classes,
                                    mlm_chunk=max(cfg.mlm_loss_chunk, 1),
                                    mlm_capacity_frac=cfg.mlm_capacity_frac)
            return losses["total_loss"], new_ms["batch_stats"]

        g, bs = jax.grad(loss_fn, has_aux=True)(state.params)
        grads_sum = g if grads_sum is None else jax.tree_util.tree_map(
            jnp.add, grads_sum, g)
    grads_manual = jax.tree_util.tree_map(lambda x: x / 2, grads_sum)
    s_manual = state.apply_gradients(grads_manual)

    for a, b in zip(jax.tree_util.tree_leaves(s_manual.params),
                    jax.tree_util.tree_leaves(jax.device_get(s_accum.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    assert np.isfinite(float(losses["total_loss"]))


def test_grad_accum_dp_sharded(setup):
    """grad_accum under a DP8 mesh: microbatch reshape keeps the data
    sharding valid and matches the single-device result."""
    cfg, model, state = setup
    rng = jax.random.PRNGKey(29)
    batch = make_batch(np.random.default_rng(31), b=16)

    accum = make_train_step(model, cfg, donate=False, grad_accum=2)
    s_single, m_single = accum(state, batch, rng)

    mesh = make_mesh(dp_size=8, tp_size=1)
    sharded_state = jax.device_put(state, state_shardings(mesh, state))
    s_dp, m_dp = accum(sharded_state, shard_batch(mesh, batch), rng)

    np.testing.assert_allclose(float(m_single["total_loss"]),
                               float(m_dp["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(jax.device_get(s_dp.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_zero1_matches_single_device(setup):
    """ZeRO-1 layout (optimizer moments partitioned over data) must leave
    the training numerics untouched: DP8+zero1 step == single-device step,
    and the moment leaves really are data-sharded."""
    from mvlt_tpu.parallel.sharding import DATA_AXIS

    cfg, model, state = setup
    batch = make_batch(np.random.default_rng(41))
    rng = jax.random.PRNGKey(43)

    step = make_train_step(model, cfg, donate=False)
    s_single, _ = step(state, batch, rng)

    mesh = make_mesh(dp_size=8, tp_size=1)
    shardings = state_shardings(mesh, state, zero1=True)
    # at least the big moment tensors must carry the data axis
    specs = [sh.spec for sh in jax.tree_util.tree_leaves(
        shardings.opt_state, is_leaf=lambda x: hasattr(x, "spec"))]
    assert any(DATA_AXIS in [a for a in sp if a is not None] for sp in specs)

    sharded_state = jax.device_put(state, shardings)
    s_z, _ = step(sharded_state, shard_batch(mesh, batch), rng)

    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(jax.device_get(s_z.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    # the updated moments keep their zero1 placement (no silent re-layout)
    new_specs = [x.sharding.spec for x in jax.tree_util.tree_leaves(s_z.opt_state)
                 if hasattr(x, "sharding")]
    assert any(DATA_AXIS in [a for a in sp if a is not None] for sp in new_specs)
