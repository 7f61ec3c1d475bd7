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
    cfg = DataConfig(input_size=256, num_text_tokens=128,
                     vocab_file="preweights/bert-base-uncased-vocab.txt")
    ds = FashionGenPretrain(root, "train", cfg, itm_enabled=True)
    from mvlt_tpu.data.native import NativeTokenizer
    print("native tokenizer:", isinstance(ds.tokenizer, NativeTokenizer), flush=True)
    dl = DataLoader(ds, SequentialSampler(n), batch_size=32, num_workers=8)
    t0 = time.perf_counter()
    count = 0
    for b in dl:
        count += b["images"].shape[0]
    dt = time.perf_counter() - t0
    print(f"pretrain pipeline: {count/dt:.0f} items/s ({count} items, {dt:.2f}s, 1 CPU core)", flush=True)
