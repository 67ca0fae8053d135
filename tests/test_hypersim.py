"""Hypersim loader tests: anomalous-frame filtering, pose/depth
conversion, valid-frame caching (parity: datasets/hypersim_dataset.py)."""

import json
import os

import numpy as np
import pytest

from implicit_depth_tpu.data.hypersim import (
    HypersimDataset,
    gl_pose_to_cv,
    image_is_anomalous,
    perpendicular_depth_from_distance,
)


def test_image_is_anomalous_mode_fraction():
    rng = np.random.RandomState(0)
    good = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    assert not image_is_anomalous(good)

    bad = good.copy()
    bad[:40] = 17  # >30% of pixels share one value
    assert image_is_anomalous(bad)

    # float depth with a constant (e.g. all-zero) region
    depth = rng.rand(48, 64).astype(np.float32) + 1.0
    assert not image_is_anomalous(depth)
    depth[:20] = 0.0
    assert image_is_anomalous(depth)


def test_perpendicular_depth_from_distance():
    # a ray straight down -z: planar depth == distance
    rays = np.array([[[0.0, 0.0, -1.0]]], np.float32)
    dist = np.array([[2.5]], np.float32)
    np.testing.assert_allclose(
        perpendicular_depth_from_distance(dist, rays), [[2.5]])
    # 60-degree ray: depth = distance * cos(60) = distance / 2
    rays = np.array([[[np.sqrt(3) / 2, 0.0, -0.5]]], np.float32)
    np.testing.assert_allclose(
        perpendicular_depth_from_distance(dist, rays), [[1.25]], atol=1e-6)


def test_gl_pose_to_cv_orthonormal():
    rng = np.random.RandomState(1)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = q
    T[:3, 3] = rng.randn(3)
    out = gl_pose_to_cv(T)
    R = out[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(out[3], [0, 0, 0, 1], atol=0)


@pytest.fixture
def hypersim_root(tmp_path):
    """Minimal on-disk Hypersim layout: one scene/cam with 5 frames
    (frame 1 anomalous color, frame 3 non-finite pose)."""
    import h5py
    from PIL import Image

    scene, cam = "ai_001_001", "cam_00"
    root = tmp_path / "hypersim"
    detail = root / scene / "_detail"
    camdir = detail / cam
    preview = root / scene / "images" / f"scene_{cam}_final_preview"
    geo = root / scene / "images" / f"scene_{cam}_geometry_hdf5"
    for d in (camdir, preview, geo):
        d.mkdir(parents=True)

    w, h = 64, 48
    mproj = np.diag([1.0, 1.0, -1.0, 1.0])
    cols = {"scene_name": scene,
            "settings_output_img_width": w, "settings_output_img_height": h}
    for i in range(4):
        for j in range(4):
            cols[f"M_proj_{i}{j}"] = mproj[i, j]
    import pandas as pd

    pd.DataFrame([cols]).to_csv(root / "metadata_camera_parameters.csv", index=False)
    pd.DataFrame({"parameter_name": ["meters_per_asset_unit"],
                  "parameter_value": [1.0]}).to_csv(detail / "metadata_scene.csv",
                                                    index=False)

    n = 5
    rng = np.random.RandomState(0)
    positions = rng.randn(n, 3)
    orientations = np.tile(np.eye(3), (n, 1, 1))
    positions[3] = np.inf  # bad pose
    with h5py.File(camdir / "camera_keyframe_positions.hdf5", "w") as f:
        f.create_dataset("dataset", data=positions)
    with h5py.File(camdir / "camera_keyframe_orientations.hdf5", "w") as f:
        f.create_dataset("dataset", data=orientations)

    for fid in range(n):
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        if fid == 1:
            img[:] = 0  # anomalous render
        Image.fromarray(img).save(preview / f"frame.{fid:04d}.tonemap.jpg")
        depth = (rng.rand(h, w) * 3 + 1).astype(np.float32)
        with h5py.File(geo / f"frame.{fid:04d}.depth_meters.hdf5", "w") as f:
            f.create_dataset("dataset", data=depth)

    splits = tmp_path / "splits"
    (splits / "bd_split").mkdir(parents=True)
    with open(splits / "bd_split" / "train_files_bd.json", "w") as f:
        json.dump({f"{scene}/{cam}": list(range(n))}, f)
    return str(root), str(splits), f"{scene}/{cam}"


def test_valid_frames_filter_anomalous_and_bad_pose(hypersim_root):
    root, splits, scan = hypersim_root
    ds = HypersimDataset(dataset_path=root, split="train",
                         split_json_dir=splits, image_height=48, image_width=64)
    frames = ds.get_valid_frame_ids(scan, store_computed=True)
    # frame 1 (anomalous color) and frame 3 (inf pose) filtered; the
    # dist-to-last-valid counter mirrors the reference's bookkeeping
    assert frames == [f"{scan} 0 0", f"{scan} 2 1", f"{scan} 4 1"]

    # cached file is reused verbatim
    cache = ds.get_valid_frame_path(scan)
    assert os.path.exists(cache)
    assert ds.get_valid_frame_ids(scan) == frames
