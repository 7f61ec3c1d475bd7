"""On-device check for the v2 PACKED stage-1 serving path (round-5 queue
item 3: models/pvlt.py:_v2_fused_block_p2 — packed SR-KV + packed attention
half + packed whole-image DWConv-MLP whose 3x3 halo crosses the packed lane
halves): full-model pvlt_v2_tiny@256 forward with ModelConfig.pack_stage1
on vs off (both on the v2 'full' whole-stage path), Mosaic-compiled at the
real stage-1 shapes ([B, 2112, 128] packed stream, hidden 512), plus the
scan-slope serving timing for each.  Run as
``python -m tools.tpu_v2_pack2_check`` once the TPU is reachable; green
parity here + a bench_variants win decides whether the v2 default packs.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()

B = 101
ITERS = 8
REPS_LO, REPS_HI = 1, 5


def make(pack: bool):
    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.models import create_model

    cfg = ModelConfig(
        name="pvlt_v2_tiny", variant="v2",
        loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
        compute_dtype="bfloat16", use_pallas_attention=True,
        dwconv_mlp_kernel=True, block_attn_kernel="full",
        pack_stage1=pack,
    )
    return cfg, create_model(cfg)


def main():
    rng = np.random.default_rng(0)
    cfg, base = make(False)
    _, packed = make(True)
    images = jnp.asarray(rng.random((ITERS, B, 256, 256, 3), np.float32),
                         jnp.float32)
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (ITERS, B, cfg.num_text_tokens)),
        jnp.int32)

    t = time.perf_counter()
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), images[0, :1],
                                   ids[0, :1])
    jax.block_until_ready(variables)
    print(f"init {time.perf_counter() - t:.1f}s", flush=True)

    # ---- parity: one batch, both routings ----
    t = time.perf_counter()
    want = np.asarray(jax.jit(lambda im, ii: base.apply(
        variables, im, ii, train=False)["itm_logits"])(images[0], ids[0]),
        dtype=np.float32)
    print(f"base fwd {time.perf_counter() - t:.1f}s", flush=True)
    t = time.perf_counter()
    got = np.asarray(jax.jit(lambda im, ii: packed.apply(
        variables, im, ii, train=False)["itm_logits"])(images[0], ids[0]),
        dtype=np.float32)
    print(f"v2 pack2 fwd {time.perf_counter() - t:.1f}s", flush=True)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"v2 pack2 itm-logit rel-err {err:.2e} "
          f"{'OK' if err < 5e-2 else 'FAIL'}", flush=True)

    # ---- timing: bench.py's scan-slope harness on both paths ----
    def make_serve(model, reps):
        @jax.jit
        def serve(images, ids):
            def step(acc, batch):
                im, ii = batch
                out = model.apply(variables, im, ii, train=False)
                probs = jax.nn.softmax(
                    out["itm_logits"].reshape(-1, 2), axis=-1)[:, 1]
                return acc + probs.sum(), None

            def one_pass(acc, _):
                return jax.lax.scan(step, acc, (images, ids))[0], None

            return jax.lax.scan(one_pass, jnp.float32(0.0), None,
                                length=reps)[0]
        return serve

    for name, model in (("v2 full", base), ("v2 pack2", packed)):
        lo, hi = make_serve(model, REPS_LO), make_serve(model, REPS_HI)
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

        dt = (best(hi) - best(lo)) / (REPS_HI - REPS_LO)
        print(f"{name}: {dt / ITERS * 1e3:.2f} ms/batch = "
              f"{B * ITERS / dt:.0f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
