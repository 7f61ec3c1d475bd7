import dataclasses, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model

rng = np.random.default_rng(0)
B = 404
images = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, 30522, (B, 128)), jnp.int32)

def run(tag, depths):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=False,
                      depths=depths)
    model = create_model.__wrapped__(cfg) if hasattr(create_model, '__wrapped__') else None
    from mvlt_tpu.models.pvlt import PVLT
    model = PVLT(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1], ids[:1])
    @jax.jit
    def f(images, ids):
        return model.apply(variables, images, ids, train=False)["itm_logits"]
    f(images, ids).block_until_ready()
    t0 = time.perf_counter()
    outs = [f(images, ids) for _ in range(10)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0)/10*1000
    print(f"{tag}: {dt:.1f} ms/iter", flush=True)
    return dt

base = run("depths 2222", (2,2,2,2))
run("depths 0222 (no stage1 blocks)", (0,2,2,2))
run("depths 2022", (2,0,2,2))
run("depths 2202", (2,2,0,2))
run("depths 2220", (2,2,2,0))
run("depths 0000 (embeds+heads only)", (0,0,0,0))
