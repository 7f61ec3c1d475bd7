"""Train-path fused-MLP A/B on TPU: correctness (losses + grads match the
XLA-autodiff path) then honest timing at the reference batch (B=150).

Re-gates the ModelConfig.fused_mlp_train decision under the forced-fetch
methodology (the original 690-vs-711 decision used pre-2026-08-16 timing).
``python -m tools.bench_train_fusedmlp``
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

B = 150
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
masked = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, 30522, (B, 128)), jnp.int32)
batch = dict(images=imgs, masked_images=masked, input_ids=ids,
             mlm_labels=jnp.asarray(np.where(rng.random((B, 128)) < 0.15,
                 rng.integers(0, 30522, (B, 128)), -1), jnp.int32),
             itm_labels=jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32))


def build(fused, drop_path=0.1):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=True,
                      drop_path_rate=drop_path, fused_mlp_train=fused)
    model = create_model(cfg)
    tx = make_optimizer(OptimConfig(epochs=150, batch_size=B), B, 1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), imgs[:2], ids[:2])
    return cfg, model, state


# --- correctness: with drop_path 0 the two paths must agree bit-closely ---
key = jax.random.PRNGKey(1)
losses_by_path = {}
params_by_path = {}
for fused in (False, True):
    cfg, model, state = build(fused, drop_path=0.0)
    step = make_train_step(model, cfg, donate=False)
    new_state, losses = step(state, batch, key)
    losses_by_path[fused] = float(losses["total_loss"])
    params_by_path[fused] = jax.device_get(
        new_state.params["block1_0"]["mlp"]["fc1"]["kernel"])
print(f"loss xla={losses_by_path[False]:.6f} fused={losses_by_path[True]:.6f}")
dw = np.abs(params_by_path[False] - params_by_path[True]).max()
print(f"fc1 kernel post-step max diff: {dw:.2e}")
assert abs(losses_by_path[False] - losses_by_path[True]) < 5e-3
assert dw < 5e-5, "fused-MLP training path diverges from XLA autodiff"

# --- timing at the reference recipe (drop_path 0.1) ---
for fused in (False, True):
    cfg, model, state = build(fused)
    step = make_train_step(model, cfg, donate=True)
    state, losses = step(state, batch, key)
    np.asarray(losses["total_loss"])
    ts = {}
    for N in (5, 15):
        t0 = time.perf_counter()
        for _ in range(N):
            state, losses = step(state, batch, key)
        np.asarray(losses["total_loss"])  # forces the whole state chain
        ts[N] = time.perf_counter() - t0
    slope = (ts[15] - ts[5]) / 10
    print(f"fused_mlp_train={fused}: {slope*1000:.1f} ms/step "
          f"({B/slope:.0f} pairs/s)", flush=True)
