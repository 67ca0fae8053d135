"""grid_sample parity vs torch CPU (align_corners=False, zeros padding).

This is the single highest-risk numerical contract in the port
(SURVEY.md §7.3): off-by-half-pixel errors silently wreck IoU parity.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from implicit_depth_tpu.core import sampling


def _torch_grid_sample(img_bchw, grid, mode):
    with torch.no_grad():
        out = F.grid_sample(
            torch.from_numpy(img_bchw),
            torch.from_numpy(grid),
            mode=mode,
            padding_mode="zeros",
            align_corners=False,
        )
    return out.numpy()


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("seed", [0, 1])
def test_grid_sample_matches_torch(mode, seed):
    rng = np.random.RandomState(seed)
    b, c, h, w = 2, 5, 12, 17
    hg, wg = 9, 11
    img = rng.randn(b, c, h, w).astype(np.float32)
    # cover in-range, out-of-range, and exactly-on-border coords
    grid = rng.uniform(-1.4, 1.4, size=(b, hg, wg, 2)).astype(np.float32)
    grid[0, 0, 0] = [-1.0, -1.0]
    grid[0, 0, 1] = [1.0, 1.0]
    grid[0, 0, 2] = [0.0, 0.0]

    ref = _torch_grid_sample(img, grid, mode)  # (b, c, hg, wg)

    img_bhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    out = sampling.grid_sample(img_bhwc, jnp.asarray(grid), mode=mode)  # (b, hg, wg, c)
    out_bchw = np.asarray(out).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(out_bchw, ref, atol=1e-5, rtol=1e-5)


def test_grid_sample_point_grid_shape():
    """Grids of shape (B, N, 1, 2) as used by ray sampling (bd_model.py:329)."""
    rng = np.random.RandomState(3)
    img = rng.randn(2, 1, 20, 30).astype(np.float32)
    grid = rng.uniform(-1, 1, size=(2, 50, 1, 2)).astype(np.float32)
    ref = _torch_grid_sample(img, grid, "bilinear")
    out = sampling.grid_sample(jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_index_space_matches_plus_half_convention():
    """u (+0.5-centre pixel coords) -> normalized 2u/W-1 -> torch unnormalize
    must equal our index-space u - 0.5 shortcut."""
    rng = np.random.RandomState(7)
    h, w = 10, 14
    img = rng.randn(h, w, 3).astype(np.float32)
    u = rng.uniform(-2, w + 2, size=(40,)).astype(np.float32)
    v = rng.uniform(-2, h + 2, size=(40,)).astype(np.float32)

    # full normalized path
    grid = np.stack([2 * u / w - 1, 2 * v / h - 1], axis=-1)[None, :, None, :]
    full = sampling.grid_sample(jnp.asarray(img)[None], jnp.asarray(grid))[0, :, 0]

    # index-space shortcut
    short = sampling.sample_bilinear_idx(jnp.asarray(img), jnp.asarray(u - 0.5), jnp.asarray(v - 0.5))
    np.testing.assert_allclose(np.asarray(full), np.asarray(short), atol=1e-5)
