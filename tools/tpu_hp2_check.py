"""On-device check for hp2 head-pair striped attention (VERDICT r4 #1,
ops/block_fused.py head_pair + ops/kernel_math.softmax_av_pair): full-model
pvlt_tiny@256 forward with ModelConfig.head_pair_attn on vs off (both on the
'full' megakernel path with pack_stage1 on — the shipped default stack),
Mosaic-compiled at the real stage-2/3/4 shapes, plus the serving timing
slope for each.  Run as ``python -m tools.tpu_hp2_check`` once the TPU is
reachable; green parity here + a bench.py win is the gate for flipping
head_pair_attn on.
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


def make(hp2: bool):
    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.models import create_model

    cfg = ModelConfig(
        loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
        compute_dtype="bfloat16", use_pallas_attention=True,
        head_pair_attn=hp2,
    )
    return cfg, create_model(cfg)


def main():
    rng = np.random.default_rng(0)
    cfg, base = make(False)
    _, paired = make(True)
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
    got = np.asarray(jax.jit(lambda im, ii: paired.apply(
        variables, im, ii, train=False)["itm_logits"])(images[0], ids[0]),
        dtype=np.float32)
    print(f"hp2 fwd {time.perf_counter() - t:.1f}s", flush=True)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"hp2 itm-logit rel-err {err:.2e} "
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

    for name, model in (("base", base), ("hp2", paired)):
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
