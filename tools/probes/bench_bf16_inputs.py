import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model

rng = np.random.default_rng(0)
B = 404
cfg = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                  compute_dtype="bfloat16", use_pallas_attention=True)
model = create_model(cfg)
ids = jnp.asarray(rng.integers(0, 30522, (B, 128)), jnp.int32)
img_f32 = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
img_bf16 = img_f32.astype(jnp.bfloat16)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), img_f32[:1], ids[:1])

def bench(images, tag):
    @jax.jit
    def f(images, ids):
        return model.apply(variables, images, ids, train=False)["itm_logits"]
    f(images, ids).block_until_ready()
    t0 = time.perf_counter()
    outs = [f(images, ids) for _ in range(10)]
    jax.block_until_ready(outs[-1])
    print(f"{tag}: {10*B/(time.perf_counter()-t0):.0f} pairs/s", flush=True)

bench(img_f32, "fp32 inputs ")
bench(img_bf16, "bf16 inputs ")
