"""A/B: bf16 staging inside the whole-block kernel (halve VREG/VMEM traffic
for intermediates) vs the shipped fp32-residual kernel, measured at model
level under the scan harness.  ``python -m tools.probes.bench_block_lowp``
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models.pvlt import PVLT
from mvlt_tpu.ops import block_fused
from mvlt_tpu.ops.block_fused import _masked_ln
from mvlt_tpu.ops.fused_mlp import _erf

rng = np.random.default_rng(0)
B = 101
ITERS = 12
images = jnp.asarray(rng.random((ITERS, B, 256, 256, 3), np.float32))
ids = jnp.asarray(rng.integers(0, 30522, (ITERS, B, 128)), jnp.int32)


def _kernel_lowp(x_ref, k_ref, v_ref, wq_ref, bq_ref, wp_ref, bp_ref,
                 g1_ref, be1_ref, g2_ref, be2_ref,
                 w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                 *, scale, eps1, eps2, dim, kv_len, num_heads):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    normed = _masked_ln(xf, dim, eps1, g1_ref[0].astype(jnp.float32),
                        be1_ref[0].astype(jnp.float32)).astype(x.dtype)
    q_all = (jax.lax.dot_general(
        normed, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[0].astype(jnp.float32)).astype(x.dtype)
    m_pad = k_ref.shape[2]
    outs = []
    for h in range(num_heads):
        logits = jax.lax.dot_general(
            q_all[:, h * 128:(h + 1) * 128], k_ref[0, h],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        if kv_len < m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < kv_len, logits, -jnp.inf)
        unnorm = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
        probs = (unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)).astype(x.dtype)
        outs.append(jax.lax.dot_general(
            probs, v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype))
    attn_out = jnp.concatenate(outs, axis=-1) if num_heads > 1 else outs[0]
    # Mosaic requires 32-bit matmul accumulators (preferred_element_type
    # bf16 fails verification: "matmul acc to be 32-bit"); the staging
    # experiment is therefore acc-f32 -> immediate bf16 cast + bf16 residual
    y = (jax.lax.dot_general(
        attn_out, wp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bp_ref[0].astype(jnp.float32)).astype(x.dtype)
    hres = x + y                                            # bf16 residual
    normed2 = _masked_ln(hres.astype(jnp.float32), dim, eps2,
                         g2_ref[0].astype(jnp.float32),
                         be2_ref[0].astype(jnp.float32)).astype(x.dtype)
    hf = jax.lax.dot_general(
        normed2, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    hid = (0.5 * hf * (1.0 + _erf(hf * 0.7071067811865476))).astype(x.dtype)
    y2 = (jax.lax.dot_general(
        hid, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + b2_ref[0].astype(jnp.float32)).astype(x.dtype)
    o_ref[0] = (hres + y2).astype(o_ref.dtype)


def bench(tag):
    cfg = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                      compute_dtype="bfloat16", use_pallas_attention=True,
                      block_attn_kernel="full")
    model = PVLT(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0, :1], ids[0, :1])

    @jax.jit
    def serve(images, ids):
        def step(acc, b):
            im, ii = b
            out = model.apply(variables, im, ii, train=False)
            return acc + out["itm_logits"].sum(), None
        return jax.lax.scan(step, jnp.float32(0.0), (images, ids))[0]

    v0 = np.asarray(serve(images, ids))
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(serve(images, ids))
        dt = min(dt, time.perf_counter() - t0)
    dt = dt / ITERS * 1000
    print(f"{tag}: {dt:.2f} ms/batch ({B/dt*1000:.0f} pairs/s)  acc={v0:.3f}", flush=True)


if __name__ == "__main__":
    import sys

    # one variant per process: swapping kernels + jax.clear_caches()
    # mid-process trips an MLIR lowering-cache KeyError in this jax build
    mode = sys.argv[1] if len(sys.argv) > 1 else "base"
    if mode == "lowp":
        block_fused._kernel = _kernel_lowp
        bench("bf16-staging")
    else:
        bench("fp32-residual (shipped)")
