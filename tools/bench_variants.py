"""Serving throughput across backbone variants under the SLOPE harness
(bench.py methodology: slope between two in-jit repetition counts of the
same scan, so the tunnel's fixed dispatch+fetch cost cancels — the old
divide-by-iters form read ~2 ms/iter high, VERDICT r4 weak #1) with
per-variant MFU so depth is normalized.
``python -m tools.bench_variants [name ...]``
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()  # fail fast if the TPU tunnel is dead

from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model

rng = np.random.default_rng(0)
B = 101
ITERS = 8
REPS_LO, REPS_HI = 1, 5
images = jnp.asarray(rng.random((ITERS, B, 256, 256, 3), np.float32))
ids = jnp.asarray(rng.integers(0, 30522, (ITERS, B, 128)), jnp.int32)


def bench(name):
    import os
    over = {}
    # post-measurement A/B knobs: MVLT_BLOCK_ATTN=mega|full|none,
    # MVLT_DWCONV_KERNEL=1 (the v2 fused DWConv-MLP kernel),
    # MVLT_PACK_STAGE1=0|1 (packed stage-1 stream, v1 'full' + v2 'full'),
    # MVLT_SWIN_PAIR=0 (read inside ops/swin_attention.py: disables the
    # window-pair grouped kernel form)
    if os.environ.get("MVLT_BLOCK_ATTN"):
        over["block_attn_kernel"] = os.environ["MVLT_BLOCK_ATTN"]
    if os.environ.get("MVLT_DWCONV_KERNEL") == "1":
        over["dwconv_mlp_kernel"] = True
    if os.environ.get("MVLT_PACK_STAGE1"):
        over["pack_stage1"] = os.environ["MVLT_PACK_STAGE1"] == "1"
    if over:
        print(f"[bench_variants] overrides: {over}", file=sys.stderr, flush=True)
    cfg = ModelConfig(name=name,
                      loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=True,
                      **over)
    model = create_model(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0, :1], ids[0, :1])

    def make_serve(reps):
        @jax.jit
        def serve(images, ids):
            def step(acc, b):
                im, ii = b
                out = model.apply(variables, im, ii, train=False)
                return acc + out["itm_logits"].sum(), None

            def one_pass(acc, _):
                return jax.lax.scan(step, acc, (images, ids))[0], None

            return jax.lax.scan(one_pass, jnp.float32(0.0), None,
                                length=reps)[0]
        return serve

    lo, hi = make_serve(REPS_LO), make_serve(REPS_HI)
    for _ in range(2):
        np.asarray(lo(images, ids))
        np.asarray(hi(images, ids))

    def best(fn):
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(images, ids))
            dt = min(dt, time.perf_counter() - t0)
        return dt

    dt = (best(hi) - best(lo)) / (REPS_HI - REPS_LO) / ITERS
    # per-variant MFU from the analytic FLOP model (bench.py) so deep
    # variants' honest 2x FLOPs/pair reads as efficiency, not "lag".
    # NB: resolve first — the registry preset (depths/variant) lives on the
    # model, not on the bare ModelConfig we constructed above.
    from bench import V5E_PEAK_BF16, flops_per_pair
    from mvlt_tpu.models.pvlt import resolve_model_config
    fl = flops_per_pair(resolve_model_config(cfg), 256)["backbone"]
    pairs = B / dt
    print(f"{name}: {dt * 1000:.2f} ms/batch ({pairs:.0f} pairs/s, "
          f"{fl / 1e9:.1f} GF/pair, MFU {pairs * fl / V5E_PEAK_BF16:.3f})",
          flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["pvlt_tiny", "pvlt_small", "pvlt_v2_tiny",
                             "pvlt_swin_tiny"]
    for n in names:
        bench(n)
