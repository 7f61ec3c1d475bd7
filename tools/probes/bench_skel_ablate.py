"""Round-4 train-skeleton attribution @ B=150 (VERDICT r3 #4): name every
>=3 ms component of the ~12 ms "embeds/optimizer/etc" remainder and the
10.5 ms t2i head, by DIFFS OF THE REAL STEP (isolated-op probes are
untrustworthy on this rig — CLAUDE.md round-3c).

Variants (each timed with the forced-slope 4->12 harness):
  full            — baseline (canonical recipe)
  cond-input      — after the lax.cond input-select change (same code now;
                    kept as the baseline label)
  sgd             — optax.sgd instead of AdamW: optimizer update cost
  no-bert-drop    — bert_dropout=0: BertEmbeddings dropout RNG+mask cost
  mlm-frac-125    — mlm_capacity_frac 0.125: MLM decode scaling check
  no-droppath     — drop_path_rate 0: per-block RNG + row-scale cost
  frozen-wordemb  — stop_gradient on the word-embedding table feed-in is
                    not expressible without model surgery; skipped (the
                    3.3 ms figure comes from bench_opt_ablate).
Run: python -m tools.probes.bench_skel_ablate
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die

backend_or_die()
import optax

from mvlt_tpu.config import LossType, ModelConfig, OptimConfig
from mvlt_tpu.models import create_model
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


def run(tag, cfg_kw=None, sgd=False, lt=None):
    lt = lt or LossType(itm=True, mlm=True, t2i=True, cls=False)
    kw = dict(drop_path_rate=0.1)
    kw.update(cfg_kw or {})
    cfg = ModelConfig(loss_type=lt, compute_dtype="bfloat16",
                      use_pallas_attention=True, **kw)
    model = create_model(cfg)
    if sgd:
        tx = optax.sgd(1e-4)
    else:
        tx = make_optimizer(OptimConfig(epochs=150, batch_size=B), B, 1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), imgs[:2], ids[:2])
    step = make_train_step(model, cfg, donate=True)
    key = jax.random.PRNGKey(1)
    state, losses = step(state, batch, key)
    np.asarray(losses["total_loss"])
    ts = {}
    for N in (4, 12):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _i in range(N):
                state, losses = step(state, batch, key)
            np.asarray(losses["total_loss"])
            best = min(best, time.perf_counter() - t0)
        ts[N] = best
    slope = (ts[12] - ts[4]) / 8
    print(f"{tag}: {slope*1000:.1f} ms/step ({B/slope:.0f} pairs/s)", flush=True)


import sys

_ALL = {
    "full": lambda: run("full (cond-input)"),
    "sgd": lambda: run("sgd", sgd=True),
    "no-bert-drop": lambda: run("no-bert-drop", cfg_kw=dict(bert_dropout=0.0)),
    "no-droppath": lambda: run("no-droppath", cfg_kw=dict(drop_path_rate=0.0)),
    "mlm-frac-125": lambda: run("mlm-frac-125",
                                cfg_kw=dict(mlm_capacity_frac=0.125)),
    # separate the mlm-frac-125 win: chunk-size-only at the default
    # capacity (gcd(5120, 512) = 512), capacity-only at the binomially
    # safe 0.16 (capacity 3072, chunk gcd = 1024), and both
    "mlm-chunk-512": lambda: run("mlm-chunk-512",
                                 cfg_kw=dict(mlm_loss_chunk=512)),
    "mlm-frac-16": lambda: run("mlm-frac-16",
                               cfg_kw=dict(mlm_capacity_frac=0.16)),
    "mlm-frac-16-chunk-512": lambda: run(
        "mlm-frac-16-chunk-512",
        cfg_kw=dict(mlm_capacity_frac=0.16, mlm_loss_chunk=512)),
    "no-t2i": lambda: run("no-t2i",
                          lt=LossType(itm=True, mlm=True, t2i=False,
                                      cls=False)),
    "itm-only": lambda: run("itm-only",
                            lt=LossType(itm=True, mlm=False, t2i=False,
                                        cls=False)),
}
for name in (sys.argv[1:] or _ALL):
    _ALL[name]()
