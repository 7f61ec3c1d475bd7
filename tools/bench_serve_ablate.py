"""Serving-path ablation at the bench batch (B=101, bf16, Pallas kernels).

Locates where the ITM forward's wall-clock goes: per-stage block cost,
skeleton (embeds+heads), and kernel on/off deltas.  Run as
``python -m tools.bench_serve_ablate`` from the repo root.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models.pvlt import PVLT

rng = np.random.default_rng(0)
B = 101
images = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, 30522, (B, 128)), jnp.int32)


def run(tag, depths=(2, 2, 2, 2), pallas=True, kernel="modular"):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=pallas,
                      block_attn_kernel=kernel, depths=depths)
    model = PVLT(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1], ids[:1])

    @jax.jit
    def f(images, ids):
        return model.apply(variables, images, ids, train=False)["itm_logits"]

    f(images, ids).block_until_ready()
    t0 = time.perf_counter()
    outs = [f(images, ids) for _ in range(20)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / 20 * 1000
    print(f"{tag}: {dt:.2f} ms/iter  ({B/dt*1000:.0f} pairs/s)", flush=True)
    return dt


base = run("serving 2222 modular")
run("0222 (no stage1)", (0, 2, 2, 2))
run("2022 (no stage2)", (2, 0, 2, 2))
run("2202 (no stage3)", (2, 2, 0, 2))
run("2220 (no stage4)", (2, 2, 2, 0))
run("0000 (skeleton)", (0, 0, 0, 0))
run("serving 2222 mega", kernel="mega")
run("serving 2222 xla", pallas=False)
