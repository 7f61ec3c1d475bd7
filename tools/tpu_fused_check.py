"""On-device: fused (Pallas megakernels) vs unfused forward equivalence + speed."""
import dataclasses, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()  # fail fast if the TPU tunnel is dead
from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model

rng = np.random.default_rng(0)
B = 101
images = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, 30522, (B, 128)), jnp.int32)

cfg_f = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                    compute_dtype="bfloat16", use_pallas_attention=True)
cfg_u = dataclasses.replace(cfg_f, use_pallas_attention=False)
model_f, model_u = create_model(cfg_f), create_model(cfg_u)
variables = jax.jit(model_u.init)(jax.random.PRNGKey(0), images[:1], ids[:1])

def make(model):
    @jax.jit
    def f(images, ids):
        return model.apply(variables, images, ids, train=False)["itm_logits"]
    return f

f_fused, f_unfused = make(model_f), make(model_u)
a = np.asarray(f_fused(images, ids), np.float32)
b = np.asarray(f_unfused(images, ids), np.float32)
print("max |fused - unfused| on itm logits:", np.abs(a - b).max(), flush=True)

def t(f, tag):
    f(images, ids).block_until_ready()
    t0 = time.perf_counter()
    outs = [f(images, ids) for _ in range(10)]
    jax.block_until_ready(outs[-1])
    print(f"{tag}: {10*B/(time.perf_counter()-t0):.0f} pairs/s", flush=True)

t(f_unfused, "unfused XLA  ")
t(f_fused,   "fused Pallas ")
