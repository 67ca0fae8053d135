"""Native C++ image decoding vs the PIL path."""

import numpy as np
import pytest
from PIL import Image

from implicit_depth_tpu.utils import native_io
from implicit_depth_tpu.utils.io import read_image


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native_io.available():
        pytest.skip("native imageio library unavailable")


def test_depth_png_exact_parity(tmp_path):
    rng = np.random.RandomState(0)
    depth_mm = rng.randint(0, 6000, (48, 64)).astype(np.uint16)
    depth_mm[0, :8] = 0
    path = str(tmp_path / "d.png")
    Image.fromarray(depth_mm, mode="I;16").save(path)

    native = native_io.decode_depth_png(path, 24, 32, 1e-3, 1e-3, 10.0)
    pil = read_image(path, height=24, width=32, value_scale_factor=1e-3, nearest=True)
    pil = pil.astype(np.float32)
    invalid = ~((pil > 1e-3) & (pil < 10.0))
    pil[invalid] = np.nan
    np.testing.assert_allclose(native, pil, atol=1e-6, equal_nan=True)

    # full-res path
    native_full = native_io.decode_depth_png(path, 48, 64, 1e-3, 1e-3, 10.0)
    ref = depth_mm.astype(np.float32) * 1e-3
    ref[depth_mm == 0] = np.nan
    np.testing.assert_allclose(native_full, ref, atol=1e-6, equal_nan=True)


def test_color_jpeg_close_to_pil(tmp_path):
    rng = np.random.RandomState(1)
    img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "c.jpg")
    Image.fromarray(img).save(path, quality=95)

    native = native_io.decode_color_jpeg(path, 48, 64)
    pil = read_image(path, height=48, width=64)
    assert native.shape == pil.shape == (48, 64, 3)
    # different resampling filters: require loose agreement
    assert np.abs(native - pil).mean() < 0.08
    assert native.min() >= 0 and native.max() <= 1


def test_threaded_decodes_consistent(tmp_path):
    """Concurrent decodes (thread pool, GIL released) match serial."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.RandomState(0)
    paths, refs = [], []
    for i in range(8):
        depth_mm = rng.randint(0, 6000, (120, 160)).astype(np.uint16)
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(depth_mm, mode="I;16").save(p)
        paths.append(p)
        refs.append(native_io.decode_depth_png(p, 120, 160, 1e-3, 1e-3, 10.0))

    with ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(lambda p: native_io.decode_depth_png(p, 120, 160, 1e-3, 1e-3, 10.0), paths))
    for ref, out in zip(refs, outs):
        np.testing.assert_allclose(out, ref, equal_nan=True)
