"""Image mask generation: grid / square / free-form stroke.

Host-side (numpy/cv2) generators matching the reference's semantics
(mcloader/fashion_gen.py:225-319):

  * grid mask   — exactly ``int(mask_ratio * num_patches)`` of the
    (H/patch)x(W/patch) patches are masked.  The reference shuffles patch
    blocks with an overlapping-window scheme that is *not* a uniform
    permutation but is still random with the exact same masked-patch count;
    here a uniform permutation is used (statistically equivalent for
    training; eval uses precomputed masks for reproducibility either way —
    mcloader/fashion_gen.py:170-174).
  * square mask — one random (im/ratio)^2 box.
  * stroke mask — 5..13 random brush strokes (cv2 lines/circles).

A device-side batched grid-mask generator (jax) is also provided so the
training input pipeline can fuse mask creation + masked_fill into the step
and avoid shipping a second full image tensor host->device: the step then
computes ``masked = where(mask, 1e-6, image)`` on-chip
(mcloader/fashion_gen.py:176 semantics).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

import jax
import jax.numpy as jnp


def generate_grid_mask(input_size: int, mask_ratio: float, patch_size: int = 16,
                       rng: np.random.Generator | None = None) -> np.ndarray:
    """[H, W] float mask, 1 = masked pixel; exact masked-patch count."""
    rng = rng or np.random.default_rng()
    if input_size % patch_size:
        raise ValueError(f"input {input_size} not divisible by patch {patch_size}")
    g = input_size // patch_size
    num_patches = g * g
    num_mask = int(mask_ratio * num_patches)
    flat = np.zeros(num_patches, dtype=np.float32)
    flat[rng.permutation(num_patches)[:num_mask]] = 1.0
    patch_mask = flat.reshape(g, g)
    return np.kron(patch_mask, np.ones((patch_size, patch_size), np.float32))


def generate_square_mask(im_size: int, mask_size: int,
                         rng: np.random.Generator | None = None) -> np.ndarray:
    """[H, W] float mask with one random mask_size x mask_size box
    (mcloader/fashion_gen.py:256-266)."""
    rng = rng or np.random.default_rng()
    half = mask_size // 2
    cy = rng.integers(half, im_size - half)
    cx = rng.integers(half, im_size - half)
    mask = np.zeros((im_size, im_size), np.float32)
    mask[cy - half: cy + half, cx - half: cx + half] = 1.0
    return mask


def generate_stroke_mask(im_size: int, parts_range=(5, 13), mask_scale: float = 1.0,
                         rng: np.random.Generator | None = None) -> np.ndarray:
    """[H, W] float free-form brush mask (mcloader/fashion_gen.py:269-319)."""
    if not _HAS_CV2:
        raise RuntimeError("stroke masks require cv2")
    rng = rng or np.random.default_rng()
    max_vertex = int(im_size // (70 / mask_scale))
    max_brush = int(im_size // (25 / mask_scale))
    max_angle = 360
    mask = np.zeros((im_size, im_size, 1), np.float32)
    parts = int(rng.integers(parts_range[0], parts_range[1] + 1))
    for _ in range(parts):
        stroke = np.zeros((im_size, im_size, 1), np.float32)
        n_vert = int(rng.integers(0, max_vertex + 1))
        y, x = int(rng.integers(im_size)), int(rng.integers(im_size))
        width = 0
        for i in range(n_vert):
            angle = rng.integers(0, max_angle + 1) / 360.0 * 2 * np.pi
            if i % 2 == 0:
                angle = 2 * np.pi - angle
            length = int(rng.integers(0, im_size + 1))
            width = int(rng.integers(5, max_brush + 1)) // 2 * 2
            ny = int(np.clip(y + length * np.cos(angle), 0, im_size - 1))
            nx = int(np.clip(x + length * np.sin(angle), 0, im_size - 1))
            cv2.line(stroke, (y, x), (ny, nx), 1, width)
            cv2.circle(stroke, (y, x), width // 2, 2)
            y, x = ny, nx
        cv2.circle(stroke, (y, x), width // 2, 2)
        mask += stroke
    return np.minimum(mask, 1.0)[..., 0]


MASK_FILL_VALUE = 1e-6  # masked_fill value (mcloader/fashion_gen.py:176)


def apply_mask(image: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """image [H,W,3] in [0,1]; mask [H,W] -> masked image (fill 1e-6)."""
    m = mask[..., None].astype(bool)
    return np.where(m, np.float32(MASK_FILL_VALUE), image)


# --- device-side batched grid masks --------------------------------------

def device_grid_masks(rng_key: jax.Array, batch: int, input_size: int,
                      mask_ratio: float, patch_size: int = 16) -> jnp.ndarray:
    """[B, H, W] float32 grid masks generated on-device.

    Exact count per sample via argsort of uniforms (a uniform random
    permutation), upsampled patch->pixel with a reshape-broadcast (no
    gather), so the whole thing fuses into the training step.
    """
    g = input_size // patch_size
    num_patches = g * g
    num_mask = int(mask_ratio * num_patches)
    u = jax.random.uniform(rng_key, (batch, num_patches))
    ranks = jnp.argsort(jnp.argsort(u, axis=-1), axis=-1)
    patch_mask = (ranks < num_mask).astype(jnp.float32).reshape(batch, g, g)
    pix = jnp.broadcast_to(
        patch_mask[:, :, None, :, None],
        (batch, g, patch_size, g, patch_size),
    )
    return pix.reshape(batch, input_size, input_size)


def device_apply_mask(images: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """images [B,H,W,3], masks [B,H,W] -> masked images (fill 1e-6)."""
    return jnp.where(masks[..., None] > 0.5, jnp.float32(MASK_FILL_VALUE), images)
