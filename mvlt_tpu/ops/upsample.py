"""Bilinear upsampling with align_corners=True as separable matmuls.

The reference T2I pixel decoder uses ``nn.Upsample(scale_factor=s,
mode='bilinear', align_corners=True)`` (libs/vl_heads.py:114, 134).
``jax.image.resize`` only implements half-pixel-center sampling
(align_corners=False), so an exact equivalent is built here instead — and in
a TPU-friendlier form: for a static (in_size -> out_size) pair, bilinear
interpolation along one axis is a fixed sparse matrix; applying it as two
dense matmuls (rows then cols) runs on the MXU and fuses cleanly with the
surrounding convs, instead of the gather/scatter a naive resize lowers to.

align_corners=True grid: output index j samples input coordinate
``j * (in - 1) / (out - 1)`` (corners map to corners).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] align-corners bilinear interpolation weights."""
    if in_size == 1:
        return np.ones((out_size, 1), dtype=np.float32)
    coords = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = coords - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[np.arange(out_size), lo] = 1.0 - frac
    mat[np.arange(out_size), lo + 1] = frac
    return mat.astype(np.float32)


def upsample_bilinear_align_corners(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Upsample NHWC feature maps by an integer factor, align_corners=True.

    Args:
      x: [B, H, W, C].
      scale: integer upscale factor (2 and 8 in the reference decoder).

    Returns:
      [B, H*scale, W*scale, C] in x.dtype.
    """
    b, h, w, c = x.shape
    out_h, out_w = h * scale, w * scale
    mh = jnp.asarray(_interp_matrix(h, out_h), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix(w, out_w), dtype=x.dtype)
    # rows: [oh, h] x [b, h, w, c] -> [b, oh, w, c]
    x = jnp.einsum("oh,bhwc->bowc", mh, x, preferred_element_type=jnp.float32)
    # cols: [ow, w] x [b, oh, w, c] -> [b, oh, ow, c]
    x = jnp.einsum("ow,bhwc->bhoc", mw, x, preferred_element_type=jnp.float32)
    return x.astype(mh.dtype)
