"""Variant + batch sweep under the scan serving harness (bench.py's
methodology: one jitted lax.scan over distinct staged batches, forced
fetch — the only timing this rig can't distort, CLAUDE.md).

``python -m tools.bench_scan_sweep``
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model

ITERS = 12
rng = np.random.default_rng(0)


def bench(tag, batch=101, kernel="none", pallas=True):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=pallas,
                      block_attn_kernel=kernel)
    model = create_model(cfg)
    images = jnp.asarray(rng.random((ITERS, batch, 256, 256, 3), np.float32))
    ids = jnp.asarray(rng.integers(0, 30522, (ITERS, batch, 128)), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0, :1], ids[0, :1])

    @jax.jit
    def serve(images, ids):
        def step(acc, b):
            im, ii = b
            out = model.apply(variables, im, ii, train=False)
            return acc + jax.nn.softmax(
                out["itm_logits"].reshape(-1, 2), axis=-1)[:, 1].sum(), None
        return jax.lax.scan(step, jnp.float32(0.0), (images, ids))[0]

    np.asarray(serve(images, ids))
    dt = min(_timed(serve, images, ids) for _ in range(3))
    print(f"{tag}: {dt/ITERS*1000:.2f} ms/batch -> {batch*ITERS/dt:.0f} pairs/s",
          flush=True)


def _timed(fn, *a):
    t0 = time.perf_counter()
    np.asarray(fn(*a))
    return time.perf_counter() - t0


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "batch":
        # batch sweep on the default ('full') serving kernel — rerun after
        # kernel-cost changes: the optimum can shift when per-step work gets
        # cheaper relative to fixed costs
        for b in (51, 101, 202, 404):
            bench(f"B={b} full", b, "full")
    else:
        bench("B=101 none   ", 101, "none")
        bench("B=101 full   ", 101, "full")
        bench("B=101 mega   ", 101, "mega")
        bench("B=101 xla    ", 101, "none", pallas=False)
        bench("B=51  none   ", 51, "none")
        bench("B=202 none   ", 202, "none")
        bench("B=303 none   ", 303, "none")
