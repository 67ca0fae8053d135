"""Image sampling with PyTorch `F.grid_sample` parity.

The reference leans on CUDA grid_sample with align_corners=False and zeros
padding everywhere (modules/cost_volume.py:192-198,571-579,886-892;
experiment_modules/bd_model.py:329-334,357-362,407). Getting the half-pixel
convention exactly right is load-bearing for IoU parity (SURVEY.md §7.3),
so this module is the single source of truth for sampling semantics and is
unit-tested against torch CPU outputs.

Coordinate conventions:
- *index space*: a coordinate of exactly `i` hits pixel `i`'s centre.
- *normalized space* ([-1, 1], torch convention): with align_corners=False,
  x_idx = ((x_norm + 1) * W - 1) / 2.
- The MVS warp produces pixel coords `u` with the +0.5-centre convention
  (pixel i's centre at u = i + 0.5); those convert as x_idx = u - 0.5,
  which equals torch's round-trip 2*u/W - 1 -> unnormalize.

Layout is NHWC (TPU-native). All functions are jittable and vmap-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _gather_hwc(img_hwc: Array, ix: Array, iy: Array) -> Array:
    """Gathers pixels at integer (ix, iy) with zeros outside the image.

    img_hwc: (H, W, C); ix/iy: integer arrays of shape S.
    Returns (S..., C).
    """
    h, w = img_hwc.shape[0], img_hwc.shape[1]
    inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    flat = img_hwc.reshape(h * w, -1)
    vals = jnp.take(flat, iyc * w + ixc, axis=0)
    return vals * inb[..., None].astype(img_hwc.dtype)


def sample_bilinear_idx(img_hwc: Array, x_idx: Array, y_idx: Array) -> Array:
    """Bilinear sample at index-space coords with zeros padding.

    Matches torch grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=False) once coords are unnormalized.

    img_hwc: (H, W, C); x_idx/y_idx: float arrays of shape S.
    Returns (S..., C).
    """
    x0 = jnp.floor(x_idx)
    y0 = jnp.floor(y_idx)
    dx = (x_idx - x0).astype(img_hwc.dtype)[..., None]
    dy = (y_idx - y0).astype(img_hwc.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = _gather_hwc(img_hwc, x0i, y0i)
    v01 = _gather_hwc(img_hwc, x0i + 1, y0i)
    v10 = _gather_hwc(img_hwc, x0i, y0i + 1)
    v11 = _gather_hwc(img_hwc, x0i + 1, y0i + 1)

    top = v00 * (1.0 - dx) + v01 * dx
    bot = v10 * (1.0 - dx) + v11 * dx
    return top * (1.0 - dy) + bot * dy


def sample_nearest_idx(img_hwc: Array, x_idx: Array, y_idx: Array) -> Array:
    """Nearest sample at index-space coords with zeros padding.

    torch rounds with nearbyint (round-half-to-even), which jnp.round matches.
    """
    ix = jnp.round(x_idx).astype(jnp.int32)
    iy = jnp.round(y_idx).astype(jnp.int32)
    return _gather_hwc(img_hwc, ix, iy)


def unnormalize_coords(grid_norm: Array, height: int, width: int, align_corners: bool = False) -> tuple[Array, Array]:
    """Converts torch-convention normalized grid coords to index space.

    grid_norm: (..., 2) with (x, y) in [-1, 1].
    """
    gx, gy = grid_norm[..., 0], grid_norm[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (width - 1)
        y = (gy + 1.0) * 0.5 * (height - 1)
    else:
        x = ((gx + 1.0) * width - 1.0) * 0.5
        y = ((gy + 1.0) * height - 1.0) * 0.5
    return x, y


@functools.partial(jax.jit, static_argnames=("mode", "align_corners"))
def grid_sample(
    image_bhwc: Array,
    grid_norm: Array,
    mode: str = "bilinear",
    align_corners: bool = False,
) -> Array:
    """Torch-parity grid_sample on NHWC images, zeros padding.

    Args:
        image_bhwc: (B, H, W, C).
        grid_norm: (B, ..., 2) normalized coords, (x, y) order like torch.
        mode: 'bilinear' or 'nearest'.

    Returns:
        (B, ..., C) sampled values (channels-last; torch returns NCHW').
    """
    h, w = image_bhwc.shape[1], image_bhwc.shape[2]
    x, y = unnormalize_coords(grid_norm, h, w, align_corners)
    fn = sample_bilinear_idx if mode == "bilinear" else sample_nearest_idx
    return jax.vmap(fn)(image_bhwc, x, y)
