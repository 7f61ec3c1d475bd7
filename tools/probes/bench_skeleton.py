"""Skeleton (depths 0,0,0,0) sub-part attribution under the scan harness.

The serving ablation shows ~2.4 ms/batch outside the blocks (B=101).  Times
standalone jitted pieces: stage-1 patch embed (XLA conv vs space-to-depth
GEMM), BERT text embedding, and the per-stage concat+pos+pad glue.
``python -m tools.probes.bench_skeleton``
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

B, NBUF = 101, 8
rng = np.random.default_rng(0)


def timed(tag, fn, *xs):
    @jax.jit
    def scanned(xs):
        def step(acc, x):
            out = fn(*x) if isinstance(x, tuple) else fn(x)
            return acc + out.ravel()[:8].astype(jnp.float32).sum(), None
        return jax.lax.scan(step, jnp.float32(0.0), xs)[0]

    np.asarray(scanned(xs))
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(scanned(xs))
        dt = min(dt, time.perf_counter() - t0)
    print(f"{tag}: {dt / NBUF * 1000:.3f} ms", flush=True)


imgs = jnp.asarray(rng.random((NBUF, B, 256, 256, 3)), jnp.float32)
kern = jnp.asarray(rng.normal(size=(4, 4, 3, 64)) * 0.1, jnp.bfloat16)


def conv_patch(x):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kern, (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d_patch(x):
    xb = x.astype(jnp.bfloat16).reshape(B, 64, 4, 64, 4, 3)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, 4096, 48)
    return jnp.einsum("bpk,ko->bpo", xb, kern.reshape(48, 64),
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


timed("patch1 conv     ", conv_patch, imgs)
timed("patch1 s2d gemm ", s2d_patch, imgs)

# BERT embedding: 3 gathers + LN on [B, 128, 768]
ids = jnp.asarray(rng.integers(0, 30522, (NBUF, B, 128)), jnp.int32)
word = jnp.asarray(rng.normal(size=(30522, 768)) * 0.1, jnp.float32)
pos = jnp.asarray(rng.normal(size=(512, 768)) * 0.1, jnp.float32)


def bert_embed(ii):
    e = word[ii] + pos[None, :128]
    ef = e.astype(jnp.float32)
    mu = ef.mean(-1, keepdims=True)
    var = ef.var(-1, keepdims=True)
    return ((ef - mu) * jax.lax.rsqrt(var + 1e-12)).astype(jnp.bfloat16)


timed("bert embed      ", bert_embed, ids)

# stage-1 glue: pos add + token concat + lane pad (the stream build)
vis = jnp.asarray(rng.normal(size=(NBUF, B, 4096, 64)) * 0.1, jnp.bfloat16)
txt = jnp.asarray(rng.normal(size=(NBUF, B, 128, 64)) * 0.1, jnp.bfloat16)
pe = jnp.asarray(rng.normal(size=(1, 4096, 64)) * 0.1, jnp.bfloat16)
te = jnp.asarray(rng.normal(size=(1, 128, 64)) * 0.1, jnp.bfloat16)


def glue(v, t):
    x = jnp.concatenate([v + pe, t + te], axis=1)
    return jnp.pad(x, ((0, 0), (0, 0), (0, 64)))


def glue_fused_pad(v, t):
    z = jnp.zeros((B, 4096, 64), jnp.bfloat16)
    zt = jnp.zeros((B, 128, 64), jnp.bfloat16)
    return jnp.concatenate([
        jnp.concatenate([v + pe, z], axis=-1),
        jnp.concatenate([t + te, zt], axis=-1)], axis=1)


timed("stage1 glue     ", glue, vis, txt)
timed("stage1 glue fpad", glue_fused_pad, vis, txt)

# stage-end split + reshape (feeds the next patch embed)
stream = jnp.asarray(rng.normal(size=(NBUF, B, 4224, 128)) * 0.1, jnp.bfloat16)


def split(x):
    return x[:, :4096, :64].reshape(B, 64, 64, 64)


timed("stage1 split    ", split, stream)
