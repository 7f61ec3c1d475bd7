"""Fashion-Gen dataset readers: pre-training, retrieval, recognition.

Reads the reference's on-disk layout (mcloader/fashion_gen.py):
  <root>/extracted_{train,valid}_images/        one image file per pair
  <root>/full_{train,valid}_info_PAI/           one pickled dict per pair
        keys: product_id, img_name, super_cls_name, super_cls_id,
              sub_cls_name, sub_cls_id, captions, ...
  <root>/retrieve_ITR/, <root>/retrieve_TIR/    pickled 101-candidate dicts
        (index 0 = ground truth) for the 1000-query retrieval protocol
  <root>/generated_valid_masking{ratio:.2f}_size{sz}_images/
        precomputed pickled pixel masks for reproducible validation

Per-item semantics reproduced from the reference:
  * ITM negative sampling: with p=0.5 swap in the text of item
    ``index + randint(50, size//2)`` (mod size) and set itm label 0
    (mcloader/fashion_gen.py:121-153);
  * image: whitespace bbox crop -> bilinear resize -> [0,1], NO
    normalization (mcloader/fashion_gen.py:108-112);
  * masked image = fill masked pixels with 1e-6 (mcloader/fashion_gen.py:176);
  * text: WordPiece + [CLS]/[SEP] + 80/10/10 masking at word_mask_rate,
    pad to num_text_tokens (mcloader/fashion_gen.py:321-409).

All datasets are deterministic functions of (seed, epoch, index) — unlike
the reference's global ``random`` state — so distributed input pipelines
are reproducible and resumable.

A ``SyntheticFashionGen`` generator with identical item schema backs tests
and benchmarking when the real dataset is absent.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from mvlt_tpu.config import DataConfig
from mvlt_tpu.data.image_ops import load_image, load_image_u8
from mvlt_tpu.data.masks import apply_mask, generate_grid_mask, generate_square_mask, generate_stroke_mask
from mvlt_tpu.data.text_masking import process_caption
from mvlt_tpu.data.tokenizer import WordPieceTokenizer, make_tokenizer


def _listdir_sorted(d: str) -> List[str]:
    return sorted(os.path.join(d, f) for f in os.listdir(d))


def _load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


class FashionGenPretrain:
    """Map-style pre-training dataset (train or valid split)."""

    def __init__(self, root: str, split: str, cfg: DataConfig,
                 itm_enabled: bool = True, seed: int = 0):
        if split not in ("train", "valid"):
            raise ValueError(f"unknown split {split!r}")
        self.cfg = cfg
        self.split = split
        self.itm_enabled = itm_enabled
        self.seed = seed
        self.epoch = 0
        self.tokenizer = make_tokenizer(cfg.vocab_file)

        img_dir = os.path.join(root, f"extracted_{split}_images")
        txt_dir = os.path.join(root, f"full_{split}_info_PAI")
        self.images = _listdir_sorted(img_dir)
        self.text_dicts = _listdir_sorted(txt_dir)
        if len(self.images) != len(self.text_dicts):
            raise ValueError(
                f"image/text count mismatch: {len(self.images)} vs {len(self.text_dicts)}")
        self.size = len(self.images)

        self.mask_dir: Optional[List[str]] = None
        if split == "valid":
            if cfg.mask_strategy == "random_grid":
                mask_root = os.path.join(
                    root, f"generated_valid_masking{cfg.mask_ratio:.2f}_size{cfg.mask_patch_size}_images")
            else:
                mask_root = os.path.join(root, "generated_valid_noise_images")
            if os.path.isdir(mask_root):
                self.mask_dir = _listdir_sorted(mask_root)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, self.epoch, index))

    def _make_mask(self, rng: np.random.Generator, index: int) -> np.ndarray:
        cfg = self.cfg
        if self.split == "valid" and self.mask_dir is not None:
            m = np.asarray(_load_pickle(self.mask_dir[index]), np.float32)
            if m.ndim == 3:  # stored CHW in the reference's pickles
                m = m[0]
            return m
        if cfg.mask_strategy == "random_grid":
            return generate_grid_mask(cfg.input_size, cfg.mask_ratio,
                                      patch_size=16, rng=rng)
        if cfg.mask_strategy == "square":
            return generate_square_mask(cfg.input_size,
                                        int(cfg.input_size // cfg.mask_ratio), rng=rng)
        if cfg.mask_strategy == "stroke":
            return generate_stroke_mask(cfg.input_size, rng=rng)
        raise ValueError(f"invalid mask_strategy {cfg.mask_strategy!r}")

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rng = self._rng(index)

        # --- ITM pairing ---------------------------------------------------
        if self.itm_enabled and rng.random() <= 0.5:
            # reference draws offset in [50, size/2) (mcloader/
            # fashion_gen.py:134); clamp for small datasets so tests and
            # debug subsets don't violate low < high.
            lo = min(50, max(1, self.size - 2))
            hi = max(self.size // 2, lo + 1)
            offset = int(rng.integers(lo, hi))
            text_idx = (index + offset) % self.size
            itm_label = 0
        else:
            text_idx = index
            itm_label = 1
        text_dict = _load_pickle(self.text_dicts[text_idx])

        # --- image + mask ----------------------------------------------------
        image = None
        if self.split == "train" and cfg.use_native_image_ops:
            from mvlt_tpu.data.native import native_crop_resize
            from PIL import Image as PILImage

            with open(self.images[index], "rb") as f:
                decoded = np.asarray(PILImage.open(f).convert("RGB"))
            image = native_crop_resize(decoded, cfg.input_size, crop=True)
        if image is None:
            image = load_image(self.images[index], cfg.input_size)
        img_mask = self._make_mask(rng, index)
        masked_images = apply_mask(image, img_mask)

        # --- text ------------------------------------------------------------
        text = process_caption(text_dict["captions"], self.tokenizer,
                               cfg.num_text_tokens, cfg.word_mask_rate, rng)

        return {
            "images": image,
            "masked_images": masked_images,
            "t2i_labels": img_mask,
            "input_ids": text["input_ids"],
            "ori_input_ids": text["ori_input_ids"],
            "attention_mask": text["attention_mask"],
            "segment_ids": text["segment_ids"],
            "mlm_labels": text["mlm_labels"],
            "itm_labels": np.int32(itm_label),
            "sup_cls_labels": np.int32(text_dict["super_cls_id"]),
            "sub_cls_labels": np.int32(text_dict["sub_cls_id"]),
        }


class FashionGenRetrieval:
    """Zero-shot retrieval: each item is a pickled 101-candidate bundle
    (index 0 = ground truth; mcloader/fashion_gen.py:436-511)."""

    def __init__(self, root: str, cfg: DataConfig, direction: str):
        if direction not in ("itr", "tir"):
            raise ValueError("direction must be 'itr' or 'tir'")
        self.cfg = cfg
        self.tokenizer = make_tokenizer(cfg.vocab_file)
        self.image_root = os.path.join(root, "extracted_valid_images")
        bundle_dir = os.path.join(root, f"retrieve_{direction.upper()}")
        self.bundles = _listdir_sorted(bundle_dir)
        self.size = len(self.bundles)

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        bundle = _load_pickle(self.bundles[index])
        images, info = [], []
        captions = []
        for _, cand in bundle.items():
            captions.append(cand["captions"])
            # uint8 on the wire: PIL resizes in the uint8 domain, so the
            # device-side /255 reproduces load_image bit-for-bit at 1/4 the
            # host->device bytes (79 -> 20 MB per 101-bundle at 256px)
            images.append(load_image_u8(os.path.join(self.image_root,
                                                     cand["img_name"]),
                                        cfg.input_size))
            info.append({"img_name": cand["img_name"], "prod_caption": cand["captions"]})
        # clean ids only (no masking): tokenizer.encode == process_caption's
        # ori_input_ids with word_mask_rate=0 (tests/test_data.py pins it).
        # The 101-caption bundle is exactly the C++ batch tokenizer's shape
        # (native/mvlt_native.cc mvlt_encode_batch) — one native call per
        # bundle instead of 101 Python round-trips.
        if hasattr(self.tokenizer, "encode_batch"):
            ids = self.tokenizer.encode_batch(captions, cfg.num_text_tokens)
        else:
            ids = np.stack([np.asarray(self.tokenizer.encode(t, cfg.num_text_tokens),
                                       np.int32) for t in captions])
        return {
            "images_101": np.stack(images),
            "ori_input_ids_101": np.asarray(ids, np.int32),
            "info_list": info,
        }


class FashionGenRecognition:
    """Recognition eval over the full valid split with clean text ids
    (mcloader/fashion_gen.py:630-799)."""

    def __init__(self, root: str, cfg: DataConfig):
        self.cfg = cfg
        self.tokenizer = make_tokenizer(cfg.vocab_file)
        self.images = _listdir_sorted(os.path.join(root, "extracted_valid_images"))
        self.text_dicts = _listdir_sorted(os.path.join(root, "full_valid_info_PAI"))
        if len(self.images) != len(self.text_dicts):
            raise ValueError("image/text count mismatch")
        self.size = len(self.images)

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        text_dict = _load_pickle(self.text_dicts[index])
        rng = np.random.default_rng(index)
        text = process_caption(text_dict["captions"], self.tokenizer,
                               cfg.num_text_tokens, word_mask_rate=0.0, rng=rng)
        return {
            # uint8 on the wire (see FashionGenRetrieval): bit-identical
            # after the scorer's device-side /255, 4x fewer H2D bytes
            "images": load_image_u8(self.images[index], cfg.input_size),
            "ori_input_ids": text["ori_input_ids"],
            "sup_cls_labels": np.int32(text_dict["super_cls_id"]),
            "sub_cls_labels": np.int32(text_dict["sub_cls_id"]),
            "info_list": text_dict["img_name"],
        }


class SyntheticFashionGen:
    """In-memory dataset with the exact pre-training item schema, for tests
    and TPU-feeding benchmarks when the real Fashion-Gen tree is absent."""

    CAPTIONS = [
        "long sleeve shirt in midnight blue stretch cotton",
        "wool blend twill coat with double breasted button closure",
        "leather ankle boots with stacked heel and almond toe",
        "ribbed knit beanie in heathered merino wool",
        "relaxed fit denim jeans with distressed detailing",
    ]

    def __init__(self, cfg: DataConfig, size: int = 64, itm_enabled: bool = True,
                 seed: int = 0, num_super: int = 48, num_sub: int = 122):
        self.cfg = cfg
        self.size = size
        self.itm_enabled = itm_enabled
        self.seed = seed
        self.epoch = 0
        self.num_super = num_super
        self.num_sub = num_sub
        self.tokenizer = make_tokenizer(cfg.vocab_file)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rng = np.random.default_rng((self.seed, self.epoch, index))
        image = rng.random((cfg.input_size, cfg.input_size, 3), np.float32)

        if self.itm_enabled and rng.random() <= 0.5:
            text_idx, itm_label = int(rng.integers(0, len(self.CAPTIONS))), 0
        else:
            text_idx, itm_label = index % len(self.CAPTIONS), 1
        caption = self.CAPTIONS[text_idx % len(self.CAPTIONS)]

        img_mask = generate_grid_mask(cfg.input_size, cfg.mask_ratio, 16, rng)
        text = process_caption(caption, self.tokenizer, cfg.num_text_tokens,
                               cfg.word_mask_rate, rng)
        return {
            "images": image,
            "masked_images": apply_mask(image, img_mask),
            "t2i_labels": img_mask,
            "input_ids": text["input_ids"],
            "ori_input_ids": text["ori_input_ids"],
            "attention_mask": text["attention_mask"],
            "segment_ids": text["segment_ids"],
            "mlm_labels": text["mlm_labels"],
            "itm_labels": np.int32(itm_label),
            "sup_cls_labels": np.int32(rng.integers(0, self.num_super)),
            "sub_cls_labels": np.int32(rng.integers(0, self.num_sub)),
        }


def build_dataset(split: str, cfg: DataConfig, itm_enabled: bool = True, seed: int = 0):
    """Dataset factory — the capability of the reference's build_dataset
    switch (datasets.py:57-131), FashionGen path only (the CIFAR/INat
    branches are broken dead code there, SURVEY.md §2 item 28)."""
    if cfg.synthetic or not cfg.data_path:
        return SyntheticFashionGen(cfg, itm_enabled=itm_enabled, seed=seed)
    return FashionGenPretrain(cfg.data_path, split, cfg, itm_enabled=itm_enabled, seed=seed)
