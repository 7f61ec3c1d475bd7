"""Differential probe: optimizer + embedding-grad cost inside the REAL step.

Isolated-op probes are untrustworthy on this backend (even the in-jit scan
harness gave an AdamW-40M number bigger than the whole 124 ms train step —
tools/probes/bench_embed_grad.py).  This probe diffs the real train step
instead, under the exact bench_train_ablate methodology:

  1. adamw       — the shipped recipe (clip_grad defaults to None), ~124 ms
  2. adamw+noemb — word-embedding grad leaf zeroed before the update, so
                   XLA DCEs both the input-gather scatter-add and the tied
                   MLM decoder's dense dE GEMM (and the table's moments stop
                   being computed from real grads, though AdamW still
                   updates them)
  3. sgd         — plain SGD (optimizer work ~ 1 read+write of params)
  4. sgd+noemb   — both removed

delta(1,3) = AdamW-vs-SGD moment cost over the whole tree;
delta(3,4) = word-embedding backward (scatter + dense tied grad);
delta(1,2) vs delta(3,4) = how much of the emb backward hides under AdamW.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die

backend_or_die()
from mvlt_tpu.config import LossType, ModelConfig, OptimConfig
from mvlt_tpu.models.pvlt import PVLT
from mvlt_tpu.train.losses import compute_losses
from mvlt_tpu.train.schedule import make_optimizer
from mvlt_tpu.train.state import create_train_state

B = 150
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
masked = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, 30522, (B, 128)), jnp.int32)
batch = dict(images=imgs, masked_images=masked, input_ids=ids,
             mlm_labels=jnp.asarray(np.where(rng.random((B, 128)) < 0.15,
                 rng.integers(0, 30522, (B, 128)), -1), jnp.int32),
             itm_labels=jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32))

cfg = ModelConfig(loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False),
                  compute_dtype="bfloat16", use_pallas_attention=True,
                  drop_path_rate=0.1)
model = PVLT(cfg)


def make_step(tx, zero_word_emb):
    def train_step(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        is_odd = (state.step % 2 == 1)
        images_in = jnp.where(is_odd, batch["masked_images"], batch["images"])

        def loss_fn(params):
            out, new_ms = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images_in, batch["input_ids"], train=True,
                mutable=["batch_stats"], rngs={"dropout": step_rng})
            losses = compute_losses(out, batch, cfg.num_super_classes,
                                    cfg.num_sub_classes,
                                    mlm_chunk=cfg.mlm_loss_chunk,
                                    mlm_capacity_frac=cfg.mlm_capacity_frac)
            return losses["total_loss"], (losses, new_ms["batch_stats"])

        grads, (losses, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        if zero_word_emb:
            we = grads["text_embeddings"]["word_embeddings"]
            we["embedding"] = jnp.zeros_like(we["embedding"])
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return new_state, losses

    return jax.jit(train_step, donate_argnums=(0,))


def run(tag, tx, zero_word_emb=False):
    state = create_train_state(model, tx, jax.random.PRNGKey(0), imgs[:2], ids[:2])
    step = make_step(tx, zero_word_emb)
    key = jax.random.PRNGKey(1)
    state, losses = step(state, batch, key)
    np.asarray(losses["total_loss"])
    ts = {}
    for N in (4, 12):
        t0 = time.perf_counter()
        for _i in range(N):
            state, losses = step(state, batch, key)
        np.asarray(losses["total_loss"])
        ts[N] = time.perf_counter() - t0
    slope = (ts[12] - ts[4]) / 8
    print(f"{tag}: {slope*1000:.1f} ms/step ({B/slope:.0f} pairs/s)", flush=True)


ocfg = OptimConfig(epochs=150, batch_size=B)
run("1 adamw          ", make_optimizer(ocfg, B, 1000))
run("2 adamw, no emb g", make_optimizer(ocfg, B, 1000), zero_word_emb=True)
run("3 sgd            ", optax.sgd(1e-4))
run("4 sgd, no emb gr ", optax.sgd(1e-4), zero_word_emb=True)
