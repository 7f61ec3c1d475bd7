"""A/B: single-step dispatch vs multi-step scan dispatch (steps_per_dispatch)
for the full pretrain objective @ B=150 bf16 — the real engine pattern
(donate=True, pipelined dispatch), distinct staged batches, final metric
forced with np.asarray (CLAUDE.md lazy-backend rules).

``python -m tools.bench_train_scan [k ...]`` (default 1 4)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()  # fail fast if the TPU tunnel is dead

from mvlt_tpu.config import LossType, ModelConfig, OptimConfig
from mvlt_tpu.models import create_model
from mvlt_tpu.train.schedule import make_optimizer
from mvlt_tpu.train.state import create_train_state
from mvlt_tpu.train.step import make_train_step

B = 150
N_BATCHES = 8  # distinct single batches; divided by k for stacked groups
               # (HBM: a [4,150,256,256,3] fp32 pair is ~950 MB — 8 such
               # groups would not fit a 16 GB chip)

cfg = ModelConfig(loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False),
                  compute_dtype="bfloat16", use_pallas_attention=True,
                  drop_path_rate=0.1)
model = create_model(cfg)
rng = np.random.default_rng(0)
imgs0 = jnp.asarray(rng.random((2, 256, 256, 3)), jnp.float32)
ids0 = jnp.asarray(rng.integers(0, 30522, (2, 128)), jnp.int32)
tx = make_optimizer(OptimConfig(epochs=150, batch_size=B), B, 1000)


def make_batches(k):
    """Device-staged distinct batches; with k>1 each is a [k,B,...] stack."""
    out = []
    for i in range(max(2, N_BATCHES // k)):
        r = np.random.default_rng(100 + i)
        shape = (k, B) if k > 1 else (B,)
        out.append(dict(
            images=jnp.asarray(r.random(shape + (256, 256, 3)), jnp.float32),
            masked_images=jnp.asarray(r.random(shape + (256, 256, 3)), jnp.float32),
            input_ids=jnp.asarray(r.integers(0, 30522, shape + (128,)), jnp.int32),
            mlm_labels=jnp.asarray(np.where(r.random(shape + (128,)) < 0.15,
                                            r.integers(0, 30522, shape + (128,)), -1), jnp.int32),
            itm_labels=jnp.asarray(r.integers(0, 2, shape), jnp.int32),
        ))
    return out


def bench(k):
    state = create_train_state(model, tx, jax.random.PRNGKey(0), imgs0, ids0)
    step = make_train_step(model, cfg, donate=True, scan_steps=k)
    key = jax.random.PRNGKey(1)
    batches = make_batches(k)
    # warm + strict-sync OOM check
    state, losses = step(state, batches[0], key)
    loss0 = np.asarray(losses["total_loss"])
    print(f"k={k} warm loss: {float(np.ravel(loss0)[0]):.4f}", flush=True)
    best = 1e9
    N = 24 // k  # dispatches per timed rep (same optimizer-step count per k)
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(N):
            state, losses = step(state, batches[i % len(batches)], key)
        np.asarray(losses["total_loss"])  # force the chain
        best = min(best, (time.perf_counter() - t0) / (N * k))
    print(f"k={k}: {best*1000:.1f} ms/step, {B/best:.0f} pairs/s", flush=True)
    del state, batches


if __name__ == "__main__":
    ks = [int(a) for a in sys.argv[1:]] or [1, 4]
    for k in ks:
        bench(k)
