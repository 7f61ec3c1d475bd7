"""Probe: where does the skeleton's 'embeds/optimizer/etc ~12 ms' bucket go?

In-jit scan-slope methodology (CLAUDE.md: slope between two IN-JIT
repetition counts of the same scan — per-dispatch loops and block-on-last
are both invalid on this lazy tunneled backend).

Times:
  (a) embedding-table grad via XLA's gather VJP (scatter-add),
  (b) the same grad as a one-hot matmul (dE = onehot^T @ dY, MXU form),
  (c) a bare AdamW update over a 40M-param fp32 tree (optimizer floor).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die

backend_or_die()

B, T, V, D = 150, 128, 30522, 768
REPS_LO, REPS_HI = 4, 12
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
ids = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32).reshape(-1)
cot = jnp.asarray(rng.standard_normal((B * T, D)), jnp.float32)


def scan_slope(body, carry):
    """ms per body() via slope between two in-jit repetition counts."""
    fns = {n: jax.jit(lambda c, n=n: jax.lax.scan(
        lambda c, _: (body(c), None), c, None, length=n)[0]) for n in (REPS_LO, REPS_HI)}
    ts = {}
    for n, fn in fns.items():
        np.asarray(jax.tree_util.tree_leaves(fn(carry))[0]).ravel()[:1]  # compile+warm
        dt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(fn(carry))[0]).ravel()[:1]
            dt = min(dt, time.perf_counter() - t0)
        ts[n] = dt
    return (ts[REPS_HI] - ts[REPS_LO]) / (REPS_HI - REPS_LO) * 1000


def scatter_body(tab):
    def f(tab):
        return (tab[ids] * cot).sum()
    return tab + 1e-9 * jax.grad(f)(tab)


def onehot_body(tab):
    # dY made to depend on tab so the scan can't hoist the matmul
    dy = (cot + tab[0, 0]).astype(jnp.bfloat16)
    oh = jax.nn.one_hot(ids, V, dtype=jnp.bfloat16)
    g = jnp.dot(oh.T, dy, preferred_element_type=jnp.float32)
    return tab + 1e-9 * g


print(f"(a) gather-VJP scatter grad: {scan_slope(scatter_body, table):.2f} ms")
print(f"(b) one-hot matmul grad:     {scan_slope(onehot_body, table):.2f} ms")

import optax

params = {f"p{i}": jnp.asarray(rng.standard_normal((2048, 2441)), jnp.float32)
          for i in range(8)}  # 8 x 5M = 40M params
tx = optax.adamw(1e-3, weight_decay=0.05)


def adamw_body(carry):
    p, s = carry
    u, s = tx.update(p, s, p)  # grads := params (keeps the dependency chain)
    return optax.apply_updates(p, u), s


print(f"(c) AdamW update, 40M fp32:  {scan_slope(adamw_body, (params, tx.init(params))):.2f} ms")
