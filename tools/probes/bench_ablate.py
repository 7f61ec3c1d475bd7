import time
import jax, jax.numpy as jnp, numpy as np
from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model

rng = np.random.default_rng(0)
BATCH = 404
images = jnp.asarray(rng.random((BATCH, 256, 256, 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, 30522, (BATCH, 128)), jnp.int32)

def run(tag, **kw):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                      compute_dtype="bfloat16", **kw)
    model = create_model(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1], ids[:1])
    @jax.jit
    def f(images, ids):
        out = model.apply(variables, images, ids, train=False)
        return out["itm_logits"]
    f(images, ids).block_until_ready()
    t0 = time.perf_counter()
    outs = [f(images, ids) for _ in range(10)]
    outs[-1].block_until_ready()
    dt = time.perf_counter() - t0
    print(f"{tag}: {10*BATCH/dt:.0f} pairs/s  ({dt/10*1000:.1f} ms/iter)", flush=True)

run("pallas bf16", use_pallas_attention=True)
run("xla    bf16", use_pallas_attention=False)
