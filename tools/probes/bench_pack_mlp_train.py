"""A/B: ModelConfig.pack_mlp_train (packed two-tokens-per-row fused LN-MLP
kernel at dim=64, forward + custom-VJP backward) on the REAL train step.

VERDICT r4 #2b: serving's pack2 layout halved stage-1 stream bytes; this
measures the training analogue.  Methodology = tools/bench_train_step.py
(donate=True, pipelined dispatch, slope between two iteration counts,
np.asarray-forced final loss — block_until_ready does not force on this
backend).  Run as `python -m tools.probes.bench_pack_mlp_train`.
"""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()
from mvlt_tpu.config import LossType, ModelConfig, OptimConfig
from mvlt_tpu.models import create_model
from mvlt_tpu.train.schedule import make_optimizer
from mvlt_tpu.train.state import create_train_state
from mvlt_tpu.train.step import make_train_step

B = 150
for pack in (False, True):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=True,
                      drop_path_rate=0.1, remat=False, pack_mlp_train=pack)
    model = create_model(cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
    masked = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 30522, (B, 128)), jnp.int32)
    batch = dict(images=imgs, masked_images=masked, input_ids=ids,
                 mlm_labels=jnp.asarray(np.where(rng.random((B, 128)) < 0.15,
                     rng.integers(0, 30522, (B, 128)), -1), jnp.int32),
                 itm_labels=jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32))
    tx = make_optimizer(OptimConfig(epochs=150, batch_size=B), B, 1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), imgs[:2], ids[:2])
    step = make_train_step(model, cfg, donate=True)
    key = jax.random.PRNGKey(1)
    # warm + OOM check (strict sync)
    state, losses = step(state, batch, key)
    print(f"pack_mlp_train={pack} warm loss: {float(losses['total_loss']):.4f}",
          flush=True)
    state, losses = step(state, batch, key)
    _ = float(losses["total_loss"])
    ts = {}
    for N in (4, 12):
        t0 = time.perf_counter()
        for _ in range(N):
            state, losses = step(state, batch, key)
        np.asarray(losses["total_loss"])
        ts[N] = time.perf_counter() - t0
    dt = (ts[12] - ts[4]) / 8
    print(f"pack_mlp_train={pack}: {dt*1000:.1f} ms/step, {B/dt:.0f} pairs/s",
          flush=True)
