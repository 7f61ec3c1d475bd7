"""ctypes bindings for the native host kernels (native/mvlt_native.cc).

The native library accelerates the two host-side hot paths — batch WordPiece
tokenization and image crop+resize — replacing the reference's reliance on
the HF Rust tokenizer and PIL/cv2 C cores (SURVEY.md §2b).  The library is
built on demand (g++ is assumed present, as in the dev image); every entry
point degrades gracefully to the pure-Python implementation, and the C++
tokenizer itself reports rows containing unsupported scripts so the wrapper
re-tokenizes exactly those with the Python ground truth.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libmvlt_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    src = os.path.join(_LIB_DIR, "mvlt_native.cc")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        import logging

        if not os.path.exists(_LIB_PATH) and not _build():
            _lib_failed = True
            logging.getLogger(__name__).warning(
                "libmvlt_native.so missing and g++ build failed — native "
                "tokenizer/image kernels disabled (Python fallback)")
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _lib_failed = True
            logging.getLogger(__name__).warning(
                "libmvlt_native.so failed to load (%s) — native "
                "tokenizer/image kernels disabled (Python fallback)", e)
            return None
        lib.mvlt_tokenizer_create.restype = ctypes.c_void_p
        lib.mvlt_tokenizer_create.argtypes = [ctypes.c_char_p]
        lib.mvlt_tokenizer_destroy.argtypes = [ctypes.c_void_p]
        lib.mvlt_tokenize.restype = ctypes.c_int32
        lib.mvlt_tokenize.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.mvlt_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8)]
        lib.mvlt_crop_resize.restype = ctypes.c_int32
        lib.mvlt_crop_resize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
        lib.mvlt_apply_mask.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


class NativeTokenizer:
    """Batch encoder backed by the C++ WordPiece with per-row Python
    fallback for unsupported scripts.  Produces exactly the Python
    tokenizer's ids (asserted in tests/test_native.py)."""

    def __init__(self, vocab_file: str):
        from mvlt_tpu.data.tokenizer import WordPieceTokenizer, resolve_vocab_path

        self.py = WordPieceTokenizer(vocab_file)
        self._handle = None
        lib = get_lib()
        if lib is not None:
            path = resolve_vocab_path(vocab_file).encode()
            handle = lib.mvlt_tokenizer_create(path)
            if handle:
                self._handle = ctypes.c_void_p(handle)
                self._lib = lib

    @property
    def native_available(self) -> bool:
        return self._handle is not None

    # --- WordPieceTokenizer-compatible surface (duck-typed) ---------------
    def __getattr__(self, name):
        return getattr(self.py, name)

    def __len__(self) -> int:
        return len(self.py)

    def tokenize_to_ids(self, text: str):
        """Bare (no CLS/SEP) ids via C++; Python fallback for unsupported
        scripts or when the library is absent."""
        if self._handle is None:
            return self.py.tokenize_to_ids(text)
        cap = 4096
        out = np.empty(cap, np.int32)
        got = self._lib.mvlt_tokenize(
            self._handle, text.encode("utf-8"),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
        if got < 0:
            return self.py.tokenize_to_ids(text)
        return out[:got].tolist()

    def encode_batch(self, texts: List[str], max_length: int) -> np.ndarray:
        """[CLS] ids [SEP] pad rows, [n, max_length] int32."""
        n = len(texts)
        if not texts:
            return np.zeros((0, max_length), np.int32)
        if self._handle is None:
            return np.stack([np.asarray(self.py.encode(t, max_length), np.int32)
                             for t in texts])
        blobs = [t.encode("utf-8") for t in texts]
        joined = b"\0".join(blobs) + b"\0"
        offsets = np.zeros(n, np.int64)
        pos = 0
        for i, b in enumerate(blobs):
            offsets[i] = pos
            pos += len(b) + 1
        out = np.zeros((n, max_length), np.int32)
        fallback = np.zeros(n, np.uint8)
        self._lib.mvlt_encode_batch(
            self._handle, joined, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, max_length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            fallback.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        for i in np.nonzero(fallback)[0]:
            out[i] = np.asarray(self.py.encode(texts[i], max_length), np.int32)
        return out

    def __del__(self):
        if getattr(self, "_handle", None) is not None:
            try:
                self._lib.mvlt_tokenizer_destroy(self._handle)
            except Exception:
                pass


def native_crop_resize(img: np.ndarray, out_size: int, crop: bool = True) -> Optional[np.ndarray]:
    """uint8 [H,W,3] -> float32 [out,out,3] in [0,1]; None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((out_size, out_size, 3), np.float32)
    rc = lib.mvlt_crop_resize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out_size, int(crop),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def native_apply_mask(images: np.ndarray, masks: np.ndarray) -> Optional[np.ndarray]:
    """float32 [B,H,W,3] + [B,H,W] -> masked copies; None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, np.float32)
    masks = np.ascontiguousarray(masks, np.float32)
    b, h, w = masks.shape
    out = np.empty_like(images)
    lib.mvlt_apply_mask(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
