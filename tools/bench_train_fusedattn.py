"""A/B: fused attention half-block custom VJP in training ON vs OFF.

Decides ModelConfig.fused_attn_train the same way bench_train_fusedmlp.py
decided fused_mlp_train: full train step at the reference recipe batch,
donate=True + pipelined dispatch, forced-fetch slope between two loop
lengths (the only honest per-step timing on this rig — CLAUDE.md).

``python -m tools.bench_train_fusedattn``
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.config import LossType, ModelConfig, OptimConfig
from mvlt_tpu.models.pvlt import PVLT
from mvlt_tpu.train.schedule import make_optimizer
from mvlt_tpu.train.state import create_train_state
from mvlt_tpu.train.step import make_train_step

B = 150
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
masked = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, 30522, (B, 128)), jnp.int32)
batch = dict(images=imgs, masked_images=masked, input_ids=ids,
             mlm_labels=jnp.asarray(np.where(rng.random((B, 128)) < 0.15,
                 rng.integers(0, 30522, (B, 128)), -1), jnp.int32),
             itm_labels=jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32))


def run(tag, **over):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=True,
                      drop_path_rate=0.1)
    cfg = dataclasses.replace(cfg, **over)
    model = PVLT(cfg)
    tx = make_optimizer(OptimConfig(epochs=150, batch_size=B), B, 1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), imgs[:2], ids[:2])
    step = make_train_step(model, cfg, donate=True)
    key = jax.random.PRNGKey(1)
    # strict-sync warmup first: pipelined dispatch masks OOMs (CLAUDE.md)
    state, losses = step(state, batch, key)
    loss0 = float(np.asarray(losses["total_loss"]))
    ts = {}
    for N in (4, 12):
        t0 = time.perf_counter()
        for _ in range(N):
            state, losses = step(state, batch, key)
        np.asarray(losses["total_loss"])
        ts[N] = time.perf_counter() - t0
    dt = (ts[12] - ts[4]) / 8 * 1000
    print(f"{tag}: {dt:.1f} ms/step, {B / dt * 1000:.0f} pairs/s "
          f"(warm loss {loss0:.4f})", flush=True)
    return dt


run("fused_attn_train=False          ", fused_attn_train=False)
run("fused_attn_train=True  recompute", fused_attn_train=True,
    fused_attn_stats=False)
run("fused_attn_train=True  stats    ", fused_attn_train=True,
    fused_attn_stats=True)
