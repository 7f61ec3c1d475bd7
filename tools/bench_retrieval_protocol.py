"""Protocol-level (host-inclusive) retrieval throughput (VERDICT r4 weak #6).

The bench.py serving headline is device-only by design (the 100 MB/s tunnel
would otherwise dominate any fresh-transfer timing — CLAUDE.md); this tool
measures the OTHER number: the real `evaluate_retrieval` loop end-to-end —
pickle bundle load + 101 JPEG decodes/crops + tokenize (the 4-worker
DataLoader), H2D transfer, the jitted ITM scorer, and the host-side ranking —
in queries/s, on synthetic 101-candidate bundles shaped exactly like the
Fashion-Gen protocol (engine_grid_masking.py:337-393).

Run as ``python -m tools.bench_retrieval_protocol [n_bundles]`` on the TPU
host.  NB: this machine has ONE CPU core and a tunneled device, so the
absolute number here is a floor for a real deployment (image decode
parallelizes across cores; H2D rides PCIe, not a tunnel) — see
docs/OPERATIONS.md for the cores-per-chip budget math.
"""
import os
import pickle
import sys
import tempfile
import time

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()

N_BUNDLES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_CAND = 101
N_IMAGES = 101  # distinct product images on disk, reused across bundles


def build_tree(root: str, rng: np.random.Generator) -> None:
    """Synthetic Fashion-Gen valid tree: real JPEGs + real bundle pickles."""
    from PIL import Image

    img_dir = os.path.join(root, "extracted_valid_images")
    os.makedirs(img_dir)
    for i in range(N_IMAGES):
        arr = rng.integers(0, 255, (256, 256, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"p{i:04d}.jpg"),
                                  quality=90)
    d = os.path.join(root, "retrieve_ITR")
    os.makedirs(d)
    words = ("wool", "coat", "silk", "dress", "denim", "jacket", "cotton",
             "shirt", "leather", "boot")
    for q in range(N_BUNDLES):
        bundle = {
            c: {"img_name": f"p{(q * 7 + c) % N_IMAGES:04d}.jpg",
                "captions": " ".join(
                    words[int(x)] for x in rng.integers(0, 10, 12))}
            for c in range(N_CAND)
        }
        with open(os.path.join(d, f"q{q:04d}.pkl"), "wb") as f:
            pickle.dump(bundle, f)


def main():
    import jax.numpy as jnp

    from mvlt_tpu.cli import _simple_loader
    from mvlt_tpu.config import DataConfig, LossType, ModelConfig
    from mvlt_tpu.data.fashion_gen import FashionGenRetrieval
    from mvlt_tpu.eval.retrieval import evaluate_retrieval, make_itm_scorer
    from mvlt_tpu.models import create_model

    rng = np.random.default_rng(0)
    cfg = ModelConfig(
        loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
        compute_dtype="bfloat16", use_pallas_attention=True)
    model = create_model(cfg)

    with tempfile.TemporaryDirectory() as root:
        t = time.perf_counter()
        build_tree(root, rng)
        print(f"tree build {time.perf_counter() - t:.1f}s", flush=True)

        dcfg = DataConfig(data_path=root)
        dataset = FashionGenRetrieval(root, dcfg, "itr")

        imgs = jnp.zeros((N_CAND, dcfg.input_size, dcfg.input_size, 3),
                         jnp.float32)
        ids = jnp.zeros((N_CAND, dcfg.num_text_tokens), jnp.int32)
        t = time.perf_counter()
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs[:1],
                                        ids[:1])
        jax.block_until_ready(variables)
        print(f"init {time.perf_counter() - t:.1f}s", flush=True)
        scorer = make_itm_scorer(model, variables)
        # warm the scorer compile outside the timed region
        np.asarray(scorer(imgs, ids))

        t0 = time.perf_counter()
        results = evaluate_retrieval(
            scorer, _simple_loader(dataset), log_every=10 ** 9)
        dt = time.perf_counter() - t0
        q = results["num_queries"]
        print(f"protocol retrieval: {q} queries in {dt:.1f}s = "
              f"{q / dt:.2f} queries/s ({q * N_CAND / dt:.0f} pairs/s "
              f"host-inclusive; 1-core host + tunneled H2D — see "
              f"docs/OPERATIONS.md)", flush=True)


if __name__ == "__main__":
    main()
