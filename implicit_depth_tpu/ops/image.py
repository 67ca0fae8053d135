"""Image-space ops replacing the reference's kornia dependencies (NHWC).

Replaced kernels (SURVEY.md §2.9):
- kornia.filters.spatial_gradient (normalized sobel, replicate pad):
  losses.py:90-94, utils/geometry_utils.py:129
- kornia.filters.sobel (gradient magnitude): utils/generic_utils.py:287,
  datasets/generic_mvs_dataset.py:652
- kornia.filters.gaussian_blur2d: utils/geometry_utils.py:121-125
- kornia.filters.blur_pool2d (pyrdown): utils/generic_utils.py:84-91
- F.max_pool2d dilations: utils/generic_utils.py:291

All are depthwise convolutions with fixed kernels — XLA fuses them well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _depthwise(x_bhwc: Array, kernel_hw: np.ndarray | jnp.ndarray, pad_mode: str) -> Array:
    kh, kw = kernel_hw.shape
    c = x_bhwc.shape[-1]
    k = jnp.asarray(kernel_hw, x_bhwc.dtype)[:, :, None, None] * jnp.ones((1, 1, 1, c), x_bhwc.dtype)
    x = jnp.pad(
        x_bhwc,
        ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
        mode=pad_mode,
    )
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


_SOBEL_X = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
_SOBEL_Y = _SOBEL_X.T


def spatial_gradient(x_bhwc: Array) -> tuple[Array, Array]:
    """Normalized sobel dx, dy with replicate padding (kornia parity)."""
    gx = _depthwise(x_bhwc, _SOBEL_X, "edge")
    gy = _depthwise(x_bhwc, _SOBEL_Y, "edge")
    return gx, gy


def sobel_magnitude(x_bhwc: Array, eps: float = 1e-6) -> Array:
    gx, gy = spatial_gradient(x_bhwc)
    return jnp.sqrt(gx * gx + gy * gy + eps)


def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    xs = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-(xs**2) / (2.0 * sigma**2))
    return k / k.sum()


def gaussian_blur(x_bhwc: Array, kernel_size: int = 5, sigma: float = 2.0) -> Array:
    """Separable gaussian blur, reflect padding (kornia default)."""
    k1 = _gaussian_kernel1d(kernel_size, sigma)
    x = _depthwise(x_bhwc, k1[None, :], "reflect")
    return _depthwise(x, k1[:, None], "reflect")


_BINOMIAL3 = np.outer([1.0, 2.0, 1.0], [1.0, 2.0, 1.0]) / 16.0


def blur_pool(x_bhwc: Array) -> Array:
    """3x3 binomial blur (reflect pad) + stride-2 subsample
    (kornia blur_pool2d parity)."""
    blurred = _depthwise(x_bhwc, _BINOMIAL3, "reflect")
    return blurred[:, ::2, ::2]


def pyrdown(x_bhwc: Array, num_scales: int = 4) -> list[Array]:
    """Downscale pyramid (utils/generic_utils.py:84-91)."""
    out = [x_bhwc]
    for _ in range(num_scales - 1):
        out.append(blur_pool(out[-1]))
    return out


def max_pool_dilate(x_bhwc: Array, window: int) -> Array:
    """F.max_pool2d(w, stride=1, padding=w//2)."""
    pad = window // 2
    return jax.lax.reduce_window(
        x_bhwc, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, 1, 1, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def get_edge_mask(depth_bhw1: Array, threshold: float = 0.95, dilate: bool = True) -> Array:
    """Edge mask on inverse depth (utils/generic_utils.py:286-292):
    sobel(1/d) > nanquantile(thr), optional 5x5 dilation. NaN-safe."""
    edge = sobel_magnitude(1.0 / depth_bhw1)
    b = edge.shape[0]
    flat = edge.reshape(b, -1)
    thr = jnp.nanquantile(flat, threshold, axis=1).reshape(b, 1, 1, 1)
    mask = (edge > thr).astype(depth_bhw1.dtype)
    if dilate:
        mask = max_pool_dilate(mask, 5)
    return mask


def normals_from_depth(depth_bhw1: Array, invK_b44: Array) -> Array:
    """Estimate normals from depth (utils/geometry_utils.py:92-138):
    gaussian blur -> backproject -> spatial gradient -> cross -> normalize.
    Returns (b, h, w, 3)."""
    from implicit_depth_tpu.core import geometry

    depth_s = gaussian_blur(depth_bhw1, 5, 2.0)
    pts = geometry.backproject_depth(depth_s[..., 0], invK_b44)[..., :3]  # (b,h,w,3)
    gx, gy = spatial_gradient(pts)
    n = jnp.cross(gx, gy)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
