"""Train-step cost by stage (depth ablation) and by objective.

Round-3 cost map @ B=150 (total 121.9 ms/step, 1231 pairs/s): stage1 36.0,
stage2 15.6, stage3 17.0, stage4 18.4, skeleton 34.7 (mlm loss 12.4, t2i
head+loss 10.5, embeds/optimizer/masking ~12).  Kernel attribution: the
fused-MLP VJP is the whole training-kernel win (18.8 ms); the pallas
attention VJP measures neutral vs XLA attention (CLAUDE.md round-3 notes).
"""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()  # fail fast if the TPU tunnel is dead
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
             mlm_labels=jnp.asarray(np.where(rng.random((B,128))<0.15,
                 rng.integers(0,30522,(B,128)), -1), jnp.int32),
             itm_labels=jnp.asarray(rng.integers(0,2,(B,)), jnp.int32))

def run(tag, depths=(2,2,2,2), lt=None):
    lt = lt or LossType(itm=True, mlm=True, t2i=True, cls=False)
    cfg = ModelConfig(loss_type=lt, compute_dtype="bfloat16",
                      use_pallas_attention=True, drop_path_rate=0.1, depths=depths)
    from mvlt_tpu.models.pvlt import PVLT
    model = PVLT(cfg)
    tx = make_optimizer(OptimConfig(epochs=150, batch_size=B), B, 1000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), imgs[:2], ids[:2])
    step = make_train_step(model, cfg, donate=True)
    key = jax.random.PRNGKey(1)
    state, losses = step(state, batch, key)
    np.asarray(losses["total_loss"])
    # forced-fetch slope between two loop lengths (CLAUDE.md methodology)
    ts = {}
    for N in (4, 12):
        t0 = time.perf_counter()
        for _i in range(N):
            state, losses = step(state, batch, key)
        np.asarray(losses["total_loss"])
        ts[N] = time.perf_counter() - t0
    slope = (ts[12] - ts[4]) / 8
    print(f"{tag}: {slope*1000:.1f} ms/step ({B/slope:.0f} pairs/s)", flush=True)

run("full 2222")
run("no stage1 (0222)", (0,2,2,2))
run("no stage2 (2022)", (2,0,2,2))
run("no stage3 (2202)", (2,2,0,2))
run("no stage4 (2220)", (2,2,2,0))
run("skeleton (0000)", (0,0,0,0))
run("no t2i head", lt=LossType(itm=True, mlm=True, t2i=False, cls=False))
run("no mlm", lt=LossType(itm=True, mlm=False, t2i=True, cls=False))
run("itm only", lt=LossType(itm=True, mlm=False, t2i=False, cls=False))
