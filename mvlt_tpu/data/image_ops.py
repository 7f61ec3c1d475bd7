"""Host-side image decode / crop / resize.

Parity-critical preprocessing (SURVEY.md §7 "Hard parts" item 2), matching
the reference loader (mcloader/fashion_gen.py:108-112, 411-428):

  * whitespace auto-crop: binarize via PIL ``convert('1')`` (Floyd-Steinberg
    dithering — kept for bit-parity), bbox of the dark (False) pixels, crop
    ``(w_min, h_min, w_max, h_max)``;
  * resize to (size, size) with PIL bilinear (torchvision Resize default);
  * scale to [0,1] float; **no mean/std normalization** (the reference's
    transform comments it out — mcloader/fashion_gen.py:111).

Output layout is NHWC float32 (TPU-native), not the reference's CHW.
"""

from __future__ import annotations

import numpy as np

from PIL import Image


def whitespace_crop(img: Image.Image) -> Image.Image:
    """Crop to the bounding box of non-white content.

    Uses PIL '1' binarization (with its default dithering) exactly like the
    reference so the crop box matches pixel-for-pixel.
    """
    binary = np.array(img.convert("1"))
    dark = (~binary).nonzero()
    if dark[0].size == 0:
        return img
    h_min, h_max = dark[0].min(), dark[0].max()
    w_min, w_max = dark[1].min(), dark[1].max()
    return img.crop((w_min, h_min, w_max, h_max))


def load_image(path: str, size: int, crop: bool = True) -> np.ndarray:
    """Decode -> (optional) whitespace crop -> bilinear resize -> [0,1]
    float32 NHWC array [size, size, 3]."""
    return load_image_u8(path, size, crop).astype(np.float32) / 255.0


def load_image_u8(path: str, size: int, crop: bool = True) -> np.ndarray:
    """load_image's pipeline stopped BEFORE the /255: uint8 [size, size, 3].

    PIL's bilinear resize runs in the uint8 domain, so
    ``load_image(p) == load_image_u8(p).astype(f32) / 255`` bit-for-bit —
    which lets eval readers ship 4x fewer host->device bytes and divide on
    device (mvlt_tpu/eval/retrieval.py).  The reference transfers fp32 CHW
    tensors (engine_grid_masking.py:337-393); same math, cheaper wire."""
    with open(path, "rb") as f:
        img = Image.open(f)
        if crop:
            img = whitespace_crop(img)
        img = img.convert("RGB")
    img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def image_from_array(arr: np.ndarray, size: int, crop: bool = True) -> np.ndarray:
    """Same path for already-decoded uint8 arrays (tests, synthetic data)."""
    img = Image.fromarray(arr)
    if crop:
        img = whitespace_crop(img)
    img = img.convert("RGB").resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0
