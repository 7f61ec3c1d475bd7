"""Serving-path ablation at the bench batch (B=101, bf16, 'full' kernel),
under the scan harness (the only timing this rig can't distort, CLAUDE.md).

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

from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()  # fail fast if the TPU tunnel is dead

from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models.pvlt import PVLT

rng = np.random.default_rng(0)
B = 101
ITERS = 12
images = jnp.asarray(rng.random((ITERS, B, 256, 256, 3), np.float32))
ids = jnp.asarray(rng.integers(0, 30522, (ITERS, B, 128)), jnp.int32)


def run(tag, depths=(2, 2, 2, 2), pallas=True, kernel="full"):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=pallas,
                      block_attn_kernel=kernel, depths=depths)
    model = PVLT(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0, :1], ids[0, :1])

    def make(reps):
        @jax.jit
        def serve(images, ids):
            def step(acc, b):
                im, ii = b
                out = model.apply(variables, im, ii, train=False)
                return acc + out["itm_logits"].sum(), None

            def one_pass(acc, _):
                return jax.lax.scan(step, acc, (images, ids))[0], None

            return jax.lax.scan(one_pass, jnp.float32(0.0), None, length=reps)[0]

        return serve

    # slope between in-jit repetition counts: each RPC carries 40-65 ms of
    # fixed tunnel dispatch cost (CLAUDE.md)
    lo, hi = make(1), make(4)
    np.asarray(lo(images, ids))
    np.asarray(hi(images, ids))

    def best(fn):
        dt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(images, ids))
            dt = min(dt, time.perf_counter() - t0)
        return dt

    dt = (best(hi) - best(lo)) / (3 * ITERS) * 1000
    print(f"{tag}: {dt:.2f} ms/batch  ({B/dt*1000:.0f} pairs/s)", flush=True)
    return dt


import sys

only = set(sys.argv[1:])  # e.g. `stages` to skip the kernel-form rows

base = run("serving 2222 full")
run("0222 (no stage1)", (0, 2, 2, 2))
run("2022 (no stage2)", (2, 0, 2, 2))
run("2202 (no stage3)", (2, 2, 0, 2))
run("2220 (no stage4)", (2, 2, 2, 0))
run("0000 (skeleton)", (0, 0, 0, 0))
if "stages" not in only:
    run("serving 2222 modular", kernel="none")
    run("serving 2222 xla", pallas=False)
