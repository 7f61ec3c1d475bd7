import time
import jax, jax.numpy as jnp, numpy as np
rng = np.random.default_rng(0)
R = 404*4224
w1 = jnp.asarray(rng.normal(size=(64, 512))*0.05, jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(512, 64))*0.05, jnp.bfloat16)
xs = [jnp.asarray(rng.normal(size=(R, 64)), jnp.bfloat16) for _ in range(6)]

@jax.jit
def mm(x):
    h = jax.lax.dot_general(x, w1, (((1,),(0,)),((),())), preferred_element_type=jnp.bfloat16)
    return jax.lax.dot_general(h, w2, (((1,),(0,)),((),())), preferred_element_type=jnp.bfloat16)

mm(xs[0]).block_until_ready()
t0 = time.perf_counter()
for i in range(6):
    mm(xs[i]).block_until_ready()   # 6 distinct inputs, no reuse
print(f"stage1 MLP matmuls only: {(time.perf_counter()-t0)/6*1000:.2f} ms", flush=True)

# and the attention matmuls of stage 1 (no softmax), h=1
q = [jnp.asarray(rng.normal(size=(404, 4224, 64)), jnp.bfloat16) for _ in range(6)]
k = jnp.asarray(rng.normal(size=(404, 192, 64)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(404, 192, 64)), jnp.bfloat16)
@jax.jit
def attmm(q):
    s = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jnp.einsum("bnm,bmd->bnd", s, v, preferred_element_type=jnp.float32)
attmm(q[0]).block_until_ready()
t0 = time.perf_counter()
for i in range(6):
    attmm(q[i]).block_until_ready()
print(f"stage1 attn matmuls only: {(time.perf_counter()-t0)/6*1000:.2f} ms", flush=True)

# full softmax attention XLA
@jax.jit
def attsm(q):
    s = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32) * 0.125
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bnm,bmd->bnd", p, v, preferred_element_type=jnp.float32)
attsm(q[0]).block_until_ready()
t0 = time.perf_counter()
for i in range(6):
    attsm(q[i]).block_until_ready()
print(f"stage1 attn + softmax XLA: {(time.perf_counter()-t0)/6*1000:.2f} ms", flush=True)
