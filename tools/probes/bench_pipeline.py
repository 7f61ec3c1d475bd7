"""Host input-pipeline throughput: items/sec through the pretrain path
(image decode+crop+resize via PIL, native WordPiece, masks) with the
threaded DataLoader."""
import sys, time, tempfile, os, pickle
sys.path.insert(0, '.')
import numpy as np
from PIL import Image
import jax; jax.config.update('jax_platforms', 'cpu')

from mvlt_tpu.config import DataConfig
from mvlt_tpu.data.fashion_gen import FashionGenPretrain
from mvlt_tpu.data.pipeline import DataLoader
from mvlt_tpu.data.samplers import SequentialSampler

with tempfile.TemporaryDirectory() as root:
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/extracted_train_images")
    os.makedirs(f"{root}/full_train_info_PAI")
    n = 256
    for i in range(n):
        arr = np.full((512, 384, 3), 255, np.uint8)
        arr[40:470, 30:350] = rng.integers(0, 220, (430, 320, 3), np.uint8)
        Image.fromarray(arr).save(f"{root}/extracted_train_images/p{i:05d}_img.png")
        with open(f"{root}/full_train_info_PAI/p{i:05d}_info.pkl", "wb") as f:
            pickle.dump({"img_name": f"p{i:05d}_img.png", "super_cls_id": 3,
                         "sub_cls_id": 7, "product_id": i,
                         "captions": "long sleeve shirt in midnight blue stretch cotton poplin with zip"}, f)
    # A/B the C++ crop/resize kernel end-to-end (ADVICE/VERDICT r3: decide
    # the DataConfig.use_native_image_ops train default by a number)
    for native_img in (False, True):
        cfg = DataConfig(input_size=256, num_text_tokens=128,
                         vocab_file="preweights/bert-base-uncased-vocab.txt",
                         use_native_image_ops=native_img)
        ds = FashionGenPretrain(root, "train", cfg, itm_enabled=True)
        from mvlt_tpu.data.native import NativeTokenizer
        print(f"native tokenizer: {isinstance(ds.tokenizer, NativeTokenizer)} "
              f"native image ops: {native_img}", flush=True)
        dl = DataLoader(ds, SequentialSampler(n), batch_size=32, num_workers=8)
        best = float("inf")
        for _rep in range(2):   # second pass runs on warm page cache
            t0 = time.perf_counter()
            count = 0
            for b in dl:
                count += b["images"].shape[0]
            best = min(best, time.perf_counter() - t0)
            dl = DataLoader(ds, SequentialSampler(n), batch_size=32, num_workers=8)
        print(f"pretrain pipeline (native_img={native_img}): "
              f"{count/best:.0f} items/s ({count} items, {best:.2f}s, 1 CPU core)",
              flush=True)
