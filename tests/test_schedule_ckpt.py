"""LR schedule + checkpoint-policy tests."""

import numpy as np
import pytest

from mvlt_tpu.config import OptimConfig
from mvlt_tpu.train.schedule import make_lr_schedule, make_optimizer, scaled_base_lr


def test_linear_lr_scaling():
    """lr <- lr * global_batch / 512 (main_vl.py:306)."""
    cfg = OptimConfig(lr=2.5e-4)
    assert scaled_base_lr(cfg, 512) == pytest.approx(2.5e-4)
    assert scaled_base_lr(cfg, 1024) == pytest.approx(5e-4)
    assert scaled_base_lr(cfg, 150) == pytest.approx(2.5e-4 * 150 / 512)


def test_schedule_shape():
    cfg = OptimConfig(lr=2.5e-4, warmup_lr=1e-6, min_lr=1e-5,
                      warmup_epochs=5, epochs=100)
    steps_per_epoch = 10
    sched = make_lr_schedule(cfg, 512, steps_per_epoch)
    assert float(sched(0)) == pytest.approx(1e-6, rel=1e-3)
    peak_step = 5 * steps_per_epoch
    assert float(sched(peak_step)) == pytest.approx(2.5e-4, rel=1e-3)
    # monotone decay after warmup
    vals = [float(sched(s)) for s in range(peak_step, 100 * steps_per_epoch, 50)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert float(sched(100 * steps_per_epoch)) == pytest.approx(1e-5, rel=1e-2)


def test_weight_decay_mask():
    import jax.numpy as jnp
    import optax

    from mvlt_tpu.train.schedule import _decay_mask

    params = {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "ln": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
        "pos_embed1": jnp.ones((1, 8, 4)),
    }
    mask = _decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["ln"]["scale"] is False
    assert mask["pos_embed1"] is True  # reference decays pos embeds (3-D)


def test_checkpoint_policy(tmp_path):
    """Two-phase policy (main_vl.py:441-498): every epoch for the first 2/3,
    then best-quality-only updates to 'best'."""
    import jax.numpy as jnp
    import optax

    from mvlt_tpu.train.state import TrainState
    from mvlt_tpu.utils.checkpoint import CheckpointManager

    tx = optax.sgd(1e-3)
    params = {"w": jnp.ones((4,))}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params), tx=tx)

    ckpt = CheckpointManager(str(tmp_path))
    total = 9
    # first 2/3 (epochs 0..5): always saved, no quality needed
    assert ckpt.save_epoch(state, 0, total)
    assert ckpt.save_epoch(state, 5, total)
    # last third: saved as best only on improvement
    assert ckpt.save_epoch(state.replace(step=state.step + 1), 6, total, quality_score=1.0)
    assert not ckpt.save_epoch(state, 7, total, quality_score=0.5)  # worse
    assert ckpt.save_epoch(state.replace(step=state.step + 3), 8, total, quality_score=2.0)

    # restore 'best' -> the epoch-8 state (step 3)
    restored, start_epoch = ckpt.restore(state, "best")
    assert int(restored.step) == 3
    assert start_epoch == 9

    # restore 'last' -> epoch 8 regardless
    restored, start_epoch = ckpt.restore(state, "last")
    assert start_epoch == 9


def test_checkpoint_restore_missing_raises(tmp_path):
    """An explicit resume target that doesn't exist must error loudly, not
    silently restart from scratch (the reference's torch.load would raise)."""
    import jax.numpy as jnp
    import optax
    import pytest

    from mvlt_tpu.train.state import TrainState
    from mvlt_tpu.utils.checkpoint import CheckpointManager

    tx = optax.sgd(1e-3)
    params = {"w": jnp.ones((4,))}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params), tx=tx)
    ckpt = CheckpointManager(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        ckpt.restore(state)
    with pytest.raises(FileNotFoundError):
        ckpt.restore(state, str(tmp_path / "nonexistent_run"))


def test_checkpoint_async_meta_after_wait(tmp_path):
    """Saves are async, but the meta sidecar appears as soon as the data
    commits — WITHOUT any wait() call — so a crash during the next epoch
    still resumes at the epoch just saved; and the round-trip is exact."""
    import os
    import time as _time

    import jax.numpy as jnp
    import optax

    from mvlt_tpu.train.state import TrainState
    from mvlt_tpu.utils.checkpoint import CheckpointManager

    tx = optax.sgd(1e-3)
    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    state = TrainState(step=jnp.asarray(7, jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params), tx=tx)

    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save_epoch(state, 0, 9)
    meta_path = os.path.join(str(tmp_path), "checkpoint", "last.json")
    # the watcher thread writes the meta once the save lands — no wait()
    deadline = _time.time() + 30
    while not os.path.exists(meta_path) and _time.time() < deadline:
        _time.sleep(0.05)
    assert os.path.exists(meta_path)
    ckpt.wait()
    assert not ckpt._pending_meta

    # restore (which waits internally) round-trips the state
    fresh = TrainState(step=jnp.zeros((), jnp.int32),
                       params={"w": jnp.zeros((4,), jnp.float32)},
                       batch_stats={}, opt_state=tx.init(params), tx=tx)
    restored, start_epoch = ckpt.restore(fresh, "last")
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(4, dtype=np.float32))
    assert start_epoch == 1


def test_checkpoint_sharded_roundtrip(tmp_path):
    """Multi-chip resume: state sharded over a DP4xTP2 mesh saves and
    restores with values intact and the template's shardings preserved
    (orbax restores to the abstract template's placement)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mvlt_tpu.parallel import make_mesh, state_shardings
    from mvlt_tpu.train.state import TrainState
    from mvlt_tpu.utils.checkpoint import CheckpointManager

    tx = optax.adamw(1e-3)
    params = {"mlp": {"fc1": {"kernel": jnp.arange(64 * 128, dtype=jnp.float32)
                              .reshape(64, 128) / 100.0,
                              "bias": jnp.ones((128,))}}}
    state = TrainState(step=jnp.asarray(11, jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params), tx=tx)
    mesh = make_mesh(dp_size=4, tp_size=2)
    shardings = state_shardings(mesh, state, zero1=True)
    sharded = jax.device_put(state, shardings)
    # fc1 kernel is column-parallel over the model axis
    assert "model" in str(sharded.params["mlp"]["fc1"]["kernel"].sharding.spec)

    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save_epoch(sharded, 0, 9)
    ckpt.wait()

    # fresh sharded template (as cli.py builds on resume)
    fresh = jax.device_put(
        TrainState(step=jnp.zeros((), jnp.int32),
                   params=jax.tree_util.tree_map(jnp.zeros_like, params),
                   batch_stats={}, opt_state=tx.init(params), tx=tx),
        shardings)
    restored, start_epoch = ckpt.restore(fresh, "last")
    assert start_epoch == 1
    assert int(restored.step) == 11
    np.testing.assert_array_equal(
        np.asarray(restored.params["mlp"]["fc1"]["kernel"]),
        np.asarray(params["mlp"]["fc1"]["kernel"]))
    # placement survived the round-trip
    assert "model" in str(restored.params["mlp"]["fc1"]["kernel"].sharding.spec)
