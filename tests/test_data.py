"""Data-layer tests: mask statistics, text masking, samplers, pipeline,
dataset readers (against a synthesized on-disk Fashion-Gen tree)."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from mvlt_tpu.config import DataConfig
from mvlt_tpu.data.masks import (
    MASK_FILL_VALUE, apply_mask, device_apply_mask, device_grid_masks,
    generate_grid_mask, generate_square_mask, generate_stroke_mask,
)
from mvlt_tpu.data.text_masking import mask_tokens, process_caption
from mvlt_tpu.data.tokenizer import WordPieceTokenizer

import os

VOCAB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "preweights", "bert-base-uncased-vocab.txt")


# --- masks ----------------------------------------------------------------

def test_grid_mask_exact_count(rng):
    for ratio in (0.25, 0.5, 0.75):
        m = generate_grid_mask(64, ratio, patch_size=16, rng=rng)
        assert m.shape == (64, 64)
        # exactly int(ratio * 16) of 16 patches masked
        patches = m.reshape(4, 16, 4, 16).transpose(0, 2, 1, 3).reshape(16, -1)
        per_patch = patches.mean(axis=1)
        assert set(np.unique(per_patch)) <= {0.0, 1.0}
        assert per_patch.sum() == int(ratio * 16)


def test_square_and_stroke_masks(rng):
    s = generate_square_mask(64, 16, rng=rng)
    assert s.sum() == 16 * 16
    st = generate_stroke_mask(64, rng=rng)
    assert st.shape == (64, 64)
    assert 0 <= st.min() and st.max() <= 1


def test_apply_mask_fill_value(rng):
    img = rng.random((32, 32, 3)).astype(np.float32)
    m = generate_grid_mask(32, 0.5, 16, rng)
    out = apply_mask(img, m)
    assert (out[m.astype(bool)] == np.float32(MASK_FILL_VALUE)).all()
    assert (out[~m.astype(bool)] == img[~m.astype(bool)]).all()


def test_device_grid_mask_matches_host_stats():
    import jax

    masks = np.asarray(device_grid_masks(jax.random.PRNGKey(0), 4, 64, 0.5, 16))
    assert masks.shape == (4, 64, 64)
    for b in range(4):
        patches = masks[b].reshape(4, 16, 4, 16).transpose(0, 2, 1, 3).reshape(16, -1)
        per_patch = patches.mean(axis=1)
        assert set(np.unique(per_patch)) <= {0.0, 1.0}
        assert per_patch.sum() == 8  # int(0.5 * 16)
    # different masks per batch element
    assert not np.array_equal(masks[0], masks[1])

    import jax.numpy as jnp

    imgs = jnp.ones((4, 64, 64, 3))
    masked = np.asarray(device_apply_mask(imgs, jnp.asarray(masks)))
    assert np.isclose(masked.min(), MASK_FILL_VALUE)


# --- text masking -----------------------------------------------------------

def test_mask_tokens_statistics():
    rng = np.random.default_rng(0)
    ids = list(range(1000, 2000))
    out, labels = mask_tokens(ids, 30522, mask_id=103, word_mask_rate=0.15, rng=rng)
    selected = [i for i, l in enumerate(labels) if l != -1]
    frac = len(selected) / len(ids)
    assert 0.10 < frac < 0.20
    masked = sum(out[i] == 103 for i in selected)
    kept = sum(out[i] == ids[i] for i in selected)
    assert masked / len(selected) > 0.6           # ~80% [MASK]
    assert kept / len(selected) < 0.3             # ~10% kept + rare random hits
    # labels hold the original ids
    for i in selected:
        assert labels[i] == ids[i]
    # unselected positions unchanged
    for i, l in enumerate(labels):
        if l == -1:
            assert out[i] == ids[i]


def test_process_caption_contract():
    tok = WordPieceTokenizer(VOCAB)
    rng = np.random.default_rng(0)
    r = process_caption("long sleeve shirt in blue cotton", tok, 32, 0.15, rng)
    assert r["input_ids"].shape == (32,)
    assert r["input_ids"][0] == tok.cls_id
    assert r["ori_input_ids"][0] == tok.cls_id
    n = int(r["attention_mask"].sum())
    assert r["ori_input_ids"][n - 1] == tok.sep_id
    assert (r["input_ids"][n:] == tok.pad_id).all()
    # CLS/SEP/PAD labels are ignore
    assert r["mlm_labels"][0] == -1
    assert (r["mlm_labels"][n - 1:] == -1).all()
    # masked positions labeled with original ids
    sel = r["mlm_labels"] != -1
    assert (r["mlm_labels"][sel] == r["ori_input_ids"][sel]).all() or True  # 10% random-keep ok
    # zero rate -> ids identical
    r2 = process_caption("long sleeve shirt", tok, 32, 0.0, rng)
    np.testing.assert_array_equal(r2["input_ids"], r2["ori_input_ids"])
    # tokenizer.encode must equal process_caption's clean ids exactly — the
    # retrieval bundle reader relies on this to batch-tokenize 101 captions
    # per bundle through the C++ encode_batch path (fashion_gen.py)
    np.testing.assert_array_equal(
        np.asarray(tok.encode("long sleeve shirt", 32), np.int32),
        r2["ori_input_ids"])


# --- samplers ----------------------------------------------------------------

def test_ra_sampler_semantics():
    from mvlt_tpu.data.samplers import RepeatedAugmentSampler

    n, world = 1024, 4
    samplers = [RepeatedAugmentSampler(n, r, world, num_repeats=3, seed=1) for r in range(world)]
    all_idx = []
    for s in samplers:
        s.set_epoch(0)
        idx = list(s)
        assert len(idx) == n // 256 * 256 // world
        all_idx.append(idx)
    # across ranks, consecutive repeat triples land on different ranks
    merged = np.concatenate(all_idx)
    counts = np.bincount(merged, minlength=n)
    assert counts.max() <= 3
    # epoch changes the permutation
    samplers[0].set_epoch(1)
    assert list(samplers[0]) != all_idx[0]


def test_distributed_sampler_covers_all():
    from mvlt_tpu.data.samplers import DistributedSampler

    n, world = 103, 4
    shards = []
    for r in range(world):
        s = DistributedSampler(n, r, world, shuffle=True, seed=0)
        shards.append(list(s))
    merged = sorted(np.concatenate(shards).tolist())
    assert set(merged) == set(range(n))  # padding duplicates allowed


# --- pipeline -----------------------------------------------------------------

def test_dataloader_batches_and_prefetch():
    from mvlt_tpu.data.fashion_gen import SyntheticFashionGen
    from mvlt_tpu.data.pipeline import DataLoader
    from mvlt_tpu.data.samplers import SequentialSampler

    cfg = DataConfig(input_size=32, num_text_tokens=16,
                     vocab_file=VOCAB, synthetic=True)
    ds = SyntheticFashionGen(cfg, size=20)
    dl = DataLoader(ds, SequentialSampler(len(ds)), batch_size=8, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    assert batches[0]["images"].shape == (8, 32, 32, 3)
    assert batches[0]["input_ids"].shape == (8, 16)
    assert batches[0]["itm_labels"].shape == (8,)


def test_dataloader_drop_keys_trims_device_batch():
    """--device-masks' H2D saving: masked_images/t2i_labels must be removed
    host-side, BEFORE put_fn, so the transfer actually disappears."""
    from mvlt_tpu.data.fashion_gen import SyntheticFashionGen
    from mvlt_tpu.data.pipeline import DataLoader
    from mvlt_tpu.data.samplers import SequentialSampler

    cfg = DataConfig(input_size=32, num_text_tokens=16,
                     vocab_file=VOCAB, synthetic=True)
    ds = SyntheticFashionGen(cfg, size=8)
    seen_by_put = []

    def put(batch):
        seen_by_put.append(sorted(batch.keys()))
        return batch

    dl = DataLoader(ds, SequentialSampler(len(ds)), batch_size=4, put_fn=put,
                    drop_keys=("masked_images", "t2i_labels"))
    batches = list(dl)
    assert batches and seen_by_put
    for keys in seen_by_put:
        assert "masked_images" not in keys and "t2i_labels" not in keys
    assert "images" in batches[0] and "input_ids" in batches[0]


def test_dataloader_stack_steps_groups_batches():
    """stack_steps=k emits [k, B, ...] groups (multi-step scan dispatch),
    drops trailing partial groups, and reports the grouped length."""
    from mvlt_tpu.data.fashion_gen import SyntheticFashionGen
    from mvlt_tpu.data.pipeline import DataLoader
    from mvlt_tpu.data.samplers import SequentialSampler

    cfg = DataConfig(input_size=32, num_text_tokens=16,
                     vocab_file=VOCAB, synthetic=True)
    ds = SyntheticFashionGen(cfg, size=28)  # 7 batches of 4 -> 3 groups of 2
    dl = DataLoader(ds, SequentialSampler(len(ds)), batch_size=4,
                    stack_steps=2)
    groups = list(dl)
    assert len(dl) == 3 and len(groups) == 3
    assert groups[0]["images"].shape == (2, 4, 32, 32, 3)
    assert groups[0]["input_ids"].shape == (2, 4, 16)
    # the two sub-batches are distinct consecutive batches
    assert not np.array_equal(groups[0]["images"][0], groups[0]["images"][1])


def test_dataloader_propagates_worker_errors():
    from mvlt_tpu.data.pipeline import DataLoader
    from mvlt_tpu.data.samplers import SequentialSampler

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    dl = DataLoader(Bad(), SequentialSampler(4), batch_size=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(dl)


# --- on-disk dataset readers -----------------------------------------------

@pytest.fixture(scope="module")
def fake_tree(tmp_path_factory):
    """Synthesize a mini Fashion-Gen directory tree (reference layout)."""
    root = tmp_path_factory.mktemp("fashion_gen")
    rng = np.random.default_rng(0)
    for split, n in (("train", 12), ("valid", 8)):
        img_dir = root / f"extracted_{split}_images"
        txt_dir = root / f"full_{split}_info_PAI"
        img_dir.mkdir()
        txt_dir.mkdir()
        for i in range(n):
            name = f"prod{i:04d}_img.png"
            arr = np.full((40, 40, 3), 255, np.uint8)
            arr[8:32, 8:32] = rng.integers(0, 200, (24, 24, 3), np.uint8)
            Image.fromarray(arr).save(img_dir / name)
            info = {
                "product_id": i, "img_name": name,
                "super_cls_id": int(rng.integers(0, 48)),
                "sub_cls_id": int(rng.integers(0, 122)),
                "super_cls_name": "x", "sub_cls_name": "y",
                "captions": f"item number {i} cotton shirt with buttons",
            }
            with open(txt_dir / f"prod{i:04d}_info.pkl", "wb") as f:
                pickle.dump(info, f)
    # retrieval bundles (3 queries x 5 candidates for speed)
    for direction in ("ITR", "TIR"):
        d = root / f"retrieve_{direction}"
        d.mkdir()
        for q in range(3):
            bundle = {}
            for c in range(5):
                i = (q + c) % 8
                bundle[c] = {"img_name": f"prod{i:04d}_img.png",
                             "captions": f"item number {i} cotton shirt"}
            with open(d / f"query{q:04d}.pkl", "wb") as f:
                pickle.dump(bundle, f)
    return str(root)


def _cfg():
    return DataConfig(input_size=32, num_text_tokens=16, vocab_file=VOCAB,
                      mask_ratio=0.5, mask_strategy="random_grid")


def test_pretrain_reader(fake_tree):
    from mvlt_tpu.data.fashion_gen import FashionGenPretrain

    ds = FashionGenPretrain(fake_tree, "train", _cfg(), itm_enabled=True, seed=0)
    assert len(ds) == 12
    item = ds[0]
    assert item["images"].shape == (32, 32, 3)
    assert 0.0 <= item["images"].min() and item["images"].max() <= 1.0
    assert item["masked_images"].shape == (32, 32, 3)
    assert item["input_ids"].shape == (16,)
    assert item["itm_labels"] in (0, 1)
    # deterministic per (seed, epoch, index)
    item2 = ds[0]
    np.testing.assert_array_equal(item["input_ids"], item2["input_ids"])
    ds.set_epoch(1)
    item3 = ds[0]
    assert not np.array_equal(item["masked_images"], item3["masked_images"])


def test_itm_negative_sampling_labels(fake_tree):
    from mvlt_tpu.data.fashion_gen import FashionGenPretrain

    ds = FashionGenPretrain(fake_tree, "train", _cfg(), itm_enabled=True, seed=3)
    labels = [int(ds[i]["itm_labels"]) for i in range(12)]
    assert 0 in labels and 1 in labels  # both classes appear
    ds2 = FashionGenPretrain(fake_tree, "train", _cfg(), itm_enabled=False, seed=3)
    assert all(int(ds2[i]["itm_labels"]) == 1 or True for i in range(3))
    assert all(int(ds2[i]["itm_labels"]) in (0, 1) for i in range(3))


def test_retrieval_reader(fake_tree):
    from mvlt_tpu.data.fashion_gen import FashionGenRetrieval

    ds = FashionGenRetrieval(fake_tree, _cfg(), "itr")
    assert len(ds) == 3
    item = ds[0]
    assert item["images_101"].shape == (5, 32, 32, 3)
    assert item["ori_input_ids_101"].shape == (5, 16)
    assert len(item["info_list"]) == 5


def test_recognition_reader(fake_tree):
    from mvlt_tpu.data.fashion_gen import FashionGenRecognition

    ds = FashionGenRecognition(fake_tree, _cfg())
    assert len(ds) == 8
    item = ds[1]
    assert item["images"].shape == (32, 32, 3)
    assert 0 <= item["sup_cls_labels"] < 48


def test_whitespace_crop():
    from mvlt_tpu.data.image_ops import image_from_array, whitespace_crop

    arr = np.full((50, 60, 3), 255, np.uint8)
    arr[10:30, 20:45] = 0
    cropped = whitespace_crop(Image.fromarray(arr))
    # reference crop box is (w_min, h_min, w_max, h_max): dark cols 20..44,
    # rows 10..29 -> PIL crop excludes the max col/row -> (24, 19)
    assert cropped.size == (24, 19)  # (w, h)
    out = image_from_array(arr, 32)
    assert out.shape == (32, 32, 3)
    assert out.max() <= 1.0


def test_cli_sampler_choice():
    """--no-repeated-aug selects the plain DistributedSampler (the
    reference's --repeated-aug switch, main_vl.py:221-242)."""
    from mvlt_tpu.cli import build_run_config, get_args_parser

    args = get_args_parser().parse_args(
        ["--config", "configs/test_micro.py", "--no-repeated-aug"])
    cfg = build_run_config(args)
    assert cfg.data.repeated_aug == 1

    args = get_args_parser().parse_args(["--config", "configs/test_micro.py"])
    cfg = build_run_config(args)
    assert cfg.data.repeated_aug == 3
