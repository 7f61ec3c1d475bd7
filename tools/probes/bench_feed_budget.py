"""Host-feed budget: loader -> REAL train step saturation (VERDICT r4
missing #3).

Measures (a) the host input pipeline alone at 1/2/4 workers (this box has
ONE core, so the worker sweep documents the thread-contention curve, not a
scaling curve), and (b) the end-to-end items/s when the same loader feeds
the canonical B=150 train step on the TPU — the number a deployment has to
budget host cores against.  Prints the implied cores-per-chip to saturate
the measured chip-side rate.  Results land in docs/OPERATIONS.md.

Run as ``python -m tools.probes.bench_feed_budget`` on the TPU host.
"""
import os
import pickle
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from mvlt_tpu.utils.backend import backend_or_die
backend_or_die()

from PIL import Image

from mvlt_tpu.config import DataConfig, LossType, ModelConfig, OptimConfig
from mvlt_tpu.data.fashion_gen import FashionGenPretrain
from mvlt_tpu.data.pipeline import DataLoader
from mvlt_tpu.data.samplers import SequentialSampler
from mvlt_tpu.models import create_model
from mvlt_tpu.train.schedule import make_optimizer
from mvlt_tpu.train.state import create_train_state
from mvlt_tpu.train.step import make_train_step

B = 150
N_ITEMS = 600


def build_tree(root, rng):
    os.makedirs(f"{root}/extracted_train_images")
    os.makedirs(f"{root}/full_train_info_PAI")
    for i in range(N_ITEMS):
        arr = np.full((512, 384, 3), 255, np.uint8)
        arr[40:470, 30:350] = rng.integers(0, 220, (430, 320, 3), np.uint8)
        Image.fromarray(arr).save(
            f"{root}/extracted_train_images/p{i:05d}_img.jpg", quality=90)
        with open(f"{root}/full_train_info_PAI/p{i:05d}_info.pkl", "wb") as f:
            pickle.dump({"img_name": f"p{i:05d}_img.jpg", "super_cls_id": 3,
                         "sub_cls_id": 7, "product_id": i,
                         "captions": "long sleeve shirt in midnight blue "
                                     "stretch cotton poplin with zip"}, f)


def main():
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as root:
        build_tree(root, rng)
        dcfg = DataConfig(input_size=256, num_text_tokens=128,
                          vocab_file="preweights/bert-base-uncased-vocab.txt",
                          use_native_image_ops=True)
        ds = FashionGenPretrain(root, "train", dcfg, itm_enabled=True)

        # (a) loader-only rate vs worker count (1-core host: contention curve)
        for w in (1, 2, 4):
            dl = DataLoader(ds, SequentialSampler(N_ITEMS), batch_size=B,
                            num_workers=w, drop_last=True)
            best = float("inf")
            for _ in range(2):          # 2nd pass on warm page cache
                t0 = time.perf_counter()
                cnt = sum(b["images"].shape[0] for b in dl)
                best = min(best, time.perf_counter() - t0)
                dl = DataLoader(ds, SequentialSampler(N_ITEMS), batch_size=B,
                                num_workers=w, drop_last=True)
            print(f"loader-only w={w}: {cnt / best:.0f} items/s", flush=True)
        host_rate = cnt / best

        # (b) loader -> real train step (device consumes while host decodes)
        cfg = ModelConfig(
            loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False),
            compute_dtype="bfloat16", use_pallas_attention=True,
            drop_path_rate=0.1)
        model = create_model(cfg)
        imgs0 = jnp.zeros((2, 256, 256, 3), jnp.float32)
        ids0 = jnp.zeros((2, cfg.num_text_tokens), jnp.int32)
        tx = make_optimizer(OptimConfig(epochs=150, batch_size=B), B, 1000)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   imgs0, ids0)
        step = make_train_step(model, cfg, donate=True)
        key = jax.random.PRNGKey(1)

        def run_epoch():
            nonlocal state
            cnt = 0
            dl = DataLoader(ds, SequentialSampler(N_ITEMS), batch_size=B,
                            num_workers=4, drop_last=True)
            t0 = time.perf_counter()
            for batch in dl:
                dev = {k: jnp.asarray(v) for k, v in batch.items()
                       if k in ("images", "masked_images", "input_ids",
                                "mlm_labels", "itm_labels")}
                state, losses = step(state, dev, key)
                cnt += B
            np.asarray(losses["total_loss"])
            return cnt / (time.perf_counter() - t0)

        run_epoch()                      # warm compile + page cache
        e2e = max(run_epoch() for _ in range(2))
        print(f"loader->train-step e2e: {e2e:.0f} items/s (w=4, 1-core host, "
              f"tunneled H2D)", flush=True)

        chip_rate = 1315.0               # BENCH_r04 canonical train pairs/s
        print(f"implied host budget: chip consumes ~{chip_rate:.0f} pairs/s; "
              f"measured {host_rate:.0f} items/s/core -> "
              f"~{chip_rate / host_rate:.1f} cores/chip to saturate "
              f"(+ H2D headroom; see docs/OPERATIONS.md)", flush=True)


if __name__ == "__main__":
    main()
