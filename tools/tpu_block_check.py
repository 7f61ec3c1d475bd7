"""On-device check: block_attn_kernel='full' (whole-block megakernel on a
lane-padded stream) vs 'none' (modular kernels) — equivalence then speed.

Run from the repo root: ``python -m tools.tpu_block_check``.
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
images = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, 30522, (B, 128)), jnp.int32)


def build(kernel):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=True,
                      block_attn_kernel=kernel)
    model = PVLT(cfg)
    return model


model_none = build("none")
variables = jax.jit(model_none.init)(jax.random.PRNGKey(0), images[:1], ids[:1])
model_full = build("full")


def timed(model, tag):
    @jax.jit
    def f(images, ids):
        return model.apply(variables, images, ids, train=False)["itm_logits"]

    probe = jax.jit(lambda o: o.sum())
    out = f(images, ids)
    np.asarray(probe(out))
    # slope between iteration counts with every output forced: this rig's
    # lazy dispatch makes block-on-last timings meaningless (CLAUDE.md)
    ts = {}
    for iters in (10, 30):
        t0 = time.perf_counter()
        outs = [f(images, ids) for _ in range(iters)]
        np.asarray(jnp.stack([probe(o) for o in outs]))
        ts[iters] = time.perf_counter() - t0
    dt = (ts[30] - ts[10]) / 20 * 1000
    print(f"{tag}: {dt:.2f} ms/iter device slope  ({B/dt*1000:.0f} pairs/s)", flush=True)
    return np.asarray(out, np.float32), dt


ref, dt_none = timed(model_none, "none (modular)")
got, dt_full = timed(model_full, "full (whole-block)")

err = np.max(np.abs(ref - got))
rel = err / (np.max(np.abs(ref)) + 1e-9)
print(f"itm_logits max abs diff: {err:.5f} (rel {rel:.5f})")
# both paths run bf16 kernels with fp32 LN/softmax/accum; small bf16-level
# divergence is expected, anything larger means a wiring bug
assert rel < 2e-2, f"full-kernel path diverges: rel={rel}"
print("OK")
