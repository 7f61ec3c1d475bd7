"""Native C++ kernel parity vs the Python ground truth."""

import numpy as np
import pytest

from mvlt_tpu.data.native import (
    NativeTokenizer, get_lib, native_apply_mask, native_crop_resize,
)
from mvlt_tpu.data.tokenizer import WordPieceTokenizer

import os

VOCAB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "preweights", "bert-base-uncased-vocab.txt")


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


@pytest.fixture(scope="module")
def ntok(lib):
    t = NativeTokenizer(VOCAB)
    assert t.native_available
    return t


TEXTS = [
    "Long sleeve shirt in midnight blue stretch cotton poplin.",
    "WOOL-BLEND twill coat, Double-breasted button closure at front!",
    "Zippered pocket & logo plaque: 3M reflective trim...",
    "item number 4217 unaffable preconditions overengineering",
    "",
    "Café ÉPONGE slippers w/ 100% leather soles",   # Latin-1 accents
    "sizes 36–42 available",                    # en-dash (U+2013)
    "日本語のキャプション fallback row",                 # CJK -> Python fallback
]


def test_encode_batch_matches_python(ntok):
    max_len = 32
    got = ntok.encode_batch(TEXTS, max_len)
    py = WordPieceTokenizer(VOCAB)
    want = np.stack([np.asarray(py.encode(t, max_len), np.int32) for t in TEXTS])
    np.testing.assert_array_equal(got, want)


def test_encode_batch_truncation(ntok):
    long_text = "embroidered " * 100
    got = ntok.encode_batch([long_text], 16)[0]
    py = WordPieceTokenizer(VOCAB)
    np.testing.assert_array_equal(got, np.asarray(py.encode(long_text, 16), np.int32))


def test_crop_resize_close_to_pil(lib, rng):
    """White-background product image: the native luma-threshold crop must
    find the same bbox as the PIL '1' path, and the triangle resize must be
    within 1.5/255 of PIL bilinear."""
    from mvlt_tpu.data.image_ops import image_from_array

    arr = np.full((80, 70, 3), 255, np.uint8)
    arr[15:60, 10:50] = rng.integers(0, 120, (45, 40, 3), np.uint8)
    want = image_from_array(arr, 32, crop=True)
    got = native_crop_resize(arr, 32, crop=True)
    assert got is not None
    assert got.shape == (32, 32, 3)
    assert np.abs(got - want).max() < 1.5 / 255.0


def test_crop_resize_no_crop(lib, rng):
    from mvlt_tpu.data.image_ops import image_from_array

    arr = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
    want = image_from_array(arr, 24, crop=False)
    got = native_crop_resize(arr, 24, crop=False)
    assert np.abs(got - want).max() < 1.5 / 255.0


def test_apply_mask_matches_python(lib, rng):
    from mvlt_tpu.data.masks import apply_mask, generate_grid_mask

    imgs = rng.random((3, 32, 32, 3)).astype(np.float32)
    masks = np.stack([generate_grid_mask(32, 0.5, 16, rng) for _ in range(3)])
    got = native_apply_mask(imgs, masks)
    want = np.stack([apply_mask(imgs[i], masks[i]) for i in range(3)])
    np.testing.assert_array_equal(got, want)
