"""Profiling, caching, visualization, logging utils."""

import numpy as np
import jax.numpy as jnp

from implicit_depth_tpu.utils import caching, profiling
from implicit_depth_tpu.utils.visualization import (
    colormap_image,
    normalize_depth,
    prepare_image_for_logging,
)


def test_step_timer():
    t = profiling.StepTimer(warmup=1)
    for _ in range(4):
        t.start()
        x = jnp.ones((64, 64)) * 2.0
        t.stop(x)
    s = t.summary()
    assert s["steps"] == 3 and s["mean_ms"] > 0


def test_compile_log():
    info = profiling.compile_log(lambda x: x * 2 + 1, jnp.ones((8, 8)), name="affine")
    assert info["compile_s"] >= 0 and info["name"] == "affine"


def test_cache_model_outputs_roundtrip(tmp_path):
    outputs = {"pred_0": np.random.rand(2, 4, 4, 1).astype(np.float32)}
    cur = {"frame_id_string": ["000001", "000002"],
           "K_s0": np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))}
    paths = caching.cache_model_outputs(str(tmp_path), outputs, cur, {}, 0, 2)
    assert len(paths) == 2
    d = caching.load_cached_output(str(tmp_path), "000002")
    np.testing.assert_allclose(d["pred_0"][0], outputs["pred_0"][1])
    assert d["frame_id"] == "000002"


def test_colormap_and_normalize():
    depth = np.random.RandomState(0).uniform(1, 5, (16, 20)).astype(np.float32)
    depth[0, 0] = np.nan
    rgb = colormap_image(depth)
    assert rgb.shape == (16, 20, 3)
    assert (rgb[0, 0] == 0).all()  # invalid -> black
    nd = normalize_depth(depth)
    assert abs(np.nanmean(nd[np.isfinite(depth)])) < 1.0
    img = prepare_image_for_logging(depth, normalize=True)
    assert img.shape == (16, 20, 3)
