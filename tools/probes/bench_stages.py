"""Per-piece timing: successive prefixes of the forward."""
import time
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn
from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model

rng = np.random.default_rng(0)
B = 404
images = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, 30522, (B, 128)), jnp.int32)

cfg = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                  compute_dtype="bfloat16", use_pallas_attention=False)
model = create_model(cfg)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1], ids[:1])

def timeit(f, *a):
    f(*a)[0].block_until_ready() if isinstance(f(*a), tuple) else jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    outs = [f(*a) for _ in range(10)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter()-t0)/10*1000

# full forward
@jax.jit
def full(images, ids):
    return model.apply(variables, images, ids, train=False)["itm_logits"]
print(f"full: {timeit(full, images, ids):.1f} ms")

# text embeddings only
from mvlt_tpu.models.bert_embeddings import BertEmbeddings
@jax.jit
def text_only(ids):
    return model.apply(variables, ids, train=False,
                       method=lambda m, ids, train: m.cfg and None)
# simpler: time components with separate modules using extracted params
p = variables["params"]

@jax.jit
def bert_only(ids):
    emb = BertEmbeddings(dtype=jnp.bfloat16)
    return emb.apply({"params": p["text_embeddings"]}, ids)
print(f"bert_embeddings: {timeit(bert_only, ids):.1f} ms")

# patch embed stage 1 conv only
@jax.jit
def pe1(images):
    x = nn.Conv(64, (4,4), strides=(4,4), dtype=jnp.bfloat16).apply(
        {"params": p["patch_embed1"]["proj"]}, images.astype(jnp.bfloat16))
    return x
print(f"patch_embed1 conv: {timeit(pe1, images):.1f} ms")

# one stage-1 block equivalent cost: emulate with raw matmuls
x1 = jnp.asarray(rng.random((B, 4224, 64)), jnp.bfloat16)
w_fc1 = jnp.asarray(rng.random((64, 512)), jnp.bfloat16)
w_fc2 = jnp.asarray(rng.random((512, 64)), jnp.bfloat16)
@jax.jit
def mlp1(x):
    return jax.nn.gelu(x @ w_fc1) @ w_fc2
print(f"stage1-size mlp matmul pair: {timeit(mlp1, x1):.1f} ms")
