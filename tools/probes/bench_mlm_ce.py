"""Round-4 fused MLM-CE kernel (ops/mlm_ce.py) on-device check + train A/B.

1. Parity at the REAL decode shapes (capacity rows x 30522 vocab x 768):
   loss value and all three grads vs the XLA chunked decode.
2. The decision measurement: diff the REAL train step (mlm_ce_kernel on vs
   off) under the forced-slope harness @ B=150 — isolated-op probes are
   untrustworthy on this rig (CLAUDE.md round-3c).

Run: python -m tools.probes.bench_mlm_ce
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die

backend_or_die()

from mvlt_tpu.config import LossType, ModelConfig, OptimConfig
from mvlt_tpu.models import create_model
from mvlt_tpu.train.losses import chunked_mlm_loss
from mvlt_tpu.train.schedule import make_optimizer
from mvlt_tpu.train.state import create_train_state
from mvlt_tpu.train.step import make_train_step
from mvlt_tpu.ops.mlm_ce import fused_mlm_loss

# ---- 1. kernel parity at real shapes ----
R, V, H = 3072, 30522, 768
rng = np.random.default_rng(0)
rows = jnp.asarray(rng.standard_normal((R, H)) * 0.5, jnp.bfloat16)
table = jnp.asarray(rng.standard_normal((V, H)) * 0.02, jnp.float32)
bias = jnp.asarray(rng.standard_normal((V,)) * 0.1, jnp.float32)
labels = jnp.asarray(np.where(rng.random(R) < 0.5,
                              rng.integers(0, V, R), -1), jnp.int32)

ref_f = jax.jit(lambda r, t, b: chunked_mlm_loss(r[None], t, b, labels[None],
                                                 chunk=1024))
ker_f = jax.jit(lambda r, t, b: fused_mlm_loss(r[None], t, b, labels[None]))
want, wgrads = jax.value_and_grad(ref_f, argnums=(0, 1, 2))(rows, table, bias)
got, ggrads = jax.value_and_grad(ker_f, argnums=(0, 1, 2))(rows, table, bias)
print(f"loss ref {float(want):.6f} kernel {float(got):.6f} "
      f"(diff {abs(float(want) - float(got)):.2e})", flush=True)
for w, g, name in zip(wgrads, ggrads, ("drows", "dtable", "dbias")):
    w, g = np.asarray(w, np.float32), np.asarray(g, np.float32)
    rel = np.abs(g - w).max() / (np.abs(w).max() + 1e-12)
    print(f"{name}: rel-err {rel:.2e} {'OK' if rel < 2e-2 else 'FAIL'}",
          flush=True)

# ---- 2. real-train-step A/B @ B=150 ----
B = 150
imgs = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
masked = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, V, (B, 128)), jnp.int32)
batch = dict(images=imgs, masked_images=masked, input_ids=ids,
             mlm_labels=jnp.asarray(np.where(rng.random((B, 128)) < 0.15,
                 rng.integers(0, V, (B, 128)), -1), jnp.int32),
             itm_labels=jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32))


def run(tag, ce_kernel):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=True, t2i=True,
                                         cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=True,
                      drop_path_rate=0.1, mlm_ce_kernel=ce_kernel)
    model = create_model(cfg)
    tx = make_optimizer(OptimConfig(epochs=150, batch_size=B), B, 1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), imgs[:2],
                               ids[:2])
    step = make_train_step(model, cfg, donate=True)
    key = jax.random.PRNGKey(1)
    state, losses = step(state, batch, key)
    print(f"{tag}: warm loss {float(np.asarray(losses['total_loss'])):.4f}",
          flush=True)
    ts = {}
    for n in (4, 12):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _i in range(n):
                state, losses = step(state, batch, key)
            np.asarray(losses["total_loss"])
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    slope = (ts[12] - ts[4]) / 8
    print(f"{tag}: {slope*1000:.1f} ms/step ({B/slope:.0f} pairs/s)",
          flush=True)


run("xla-chunked", False)
run("ce-kernel", True)
