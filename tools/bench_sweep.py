"""Bench variants: sync-per-iter vs pipelined dispatch, batch sweep."""
import time, json
import jax, jax.numpy as jnp, numpy as np
from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model

cfg = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                  compute_dtype="bfloat16", use_pallas_attention=True)
model = create_model(cfg)
rng = np.random.default_rng(0)

def build(batch):
    images = jnp.asarray(rng.random((batch, 256, 256, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 128)), jnp.int32)
    return images, ids

images, ids = build(202)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1], ids[:1])

@jax.jit
def itm_score(images, ids):
    out = model.apply(variables, images, ids, train=False)
    return jax.nn.softmax(out["itm_logits"].reshape(-1, 2).astype(jnp.float32), axis=-1)[:, 1]

for batch in (101, 202, 404, 808):
    images, ids = build(batch)
    itm_score(images, ids).block_until_ready()  # compile
    # sync mode
    t0 = time.perf_counter()
    for _ in range(10):
        itm_score(images, ids).block_until_ready()
    sync = 10*batch/(time.perf_counter()-t0)
    # pipelined mode
    t0 = time.perf_counter()
    outs = [itm_score(images, ids) for _ in range(10)]
    outs[-1].block_until_ready()
    pipe = 10*batch/(time.perf_counter()-t0)
    print(f"batch {batch}: sync {sync:.0f} pairs/s   pipelined {pipe:.0f} pairs/s", flush=True)
