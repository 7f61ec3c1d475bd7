import jax, jax.numpy as jnp, numpy as np
from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()  # fail fast if the TPU tunnel is dead
from mvlt_tpu.ops.attention import _attention_xla
from mvlt_tpu.ops.pallas_attention import fused_attention
rng = np.random.default_rng(0)
for (n, m, h, d) in [(4224,192,1,64),(1152,192,2,64),(384,192,5,64),(192,192,8,64)]:
    b = 2
    q = jnp.asarray(rng.normal(size=(b,h,n,d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b,h,m,d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b,h,m,d)), jnp.float32)
    want = np.asarray(_attention_xla(q,k,v,d**-0.5))
    got = np.asarray(fused_attention(q,k,v,scale=d**-0.5))
    err = np.abs(got-want).max()
    print(f"fp32 n={n} m={m} h={h}: max_err={err:.2e}")
    assert err < 2e-3, err
    qb,kb,vb = q.astype(jnp.bfloat16),k.astype(jnp.bfloat16),v.astype(jnp.bfloat16)
    want = np.asarray(_attention_xla(qb,kb,vb,d**-0.5)).astype(np.float32)
    got = np.asarray(fused_attention(qb,kb,vb,scale=d**-0.5)).astype(np.float32)
    err = np.abs(got-want).max()
    print(f"bf16 n={n} m={m} h={h}: max_err={err:.2e}")
    assert err < 6e-2, err
print("TPU fused-attention parity OK")
