"""Training-step throughput vs batch size (full mlm+itm+t2i objective).

The shipped recipe is B=150/device (reference dws_mvlt_exp21.py); this
probe asks whether per-chip training throughput keeps rising past it (fixed
per-step costs amortize; the reference's own lr rule scales linearly with
batch, main_vl.py:306, so a larger per-device batch is a legitimate serving
of the same recipe on fewer chips).  Same methodology as
tools/bench_train_step.py: donate=True, pipelined dispatch, strict-sync
warmup, forced-fetch slope.  ``python -m tools.probes.bench_train_bsweep``
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.config import LossType, ModelConfig, OptimConfig
from mvlt_tpu.models import create_model
from mvlt_tpu.train.schedule import make_optimizer
from mvlt_tpu.train.state import create_train_state
from mvlt_tpu.train.step import make_train_step

for B in (150, 202, 256, 303):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=True,
                      drop_path_rate=0.1)
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
    try:
        state, losses = step(state, batch, key)      # strict-sync OOM check
        np.asarray(losses["total_loss"])
    except Exception as e:  # noqa: BLE001 - surface OOM and continue sweep
        print(f"B={B}: FAILED ({type(e).__name__})", flush=True)
        continue
    ts = {}
    for n in (4, 12):
        t0 = time.perf_counter()
        for _ in range(n):
            state, losses = step(state, batch, key)
        np.asarray(losses["total_loss"])
        ts[n] = time.perf_counter() - t0
    slope = (ts[12] - ts[4]) / 8
    print(f"B={B}: {slope*1000:.1f} ms/step ({B/slope:.0f} pairs/s)", flush=True)
