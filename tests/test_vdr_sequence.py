"""VDR capture.json sequence glue + capture-to-composite e2e
(parity: inference/vdr_sequence.py, inference/composite.py)."""

import json
import os

import numpy as np
import pytest

from implicit_depth_tpu.apps.composite import composite_capture
from implicit_depth_tpu.apps.vdr_sequence import VDRSequence, pad_image_fname


def test_pad_image_fname():
    assert pad_image_fname("frame_25.jpg") == "frame_00025.jpg"
    assert pad_image_fname("frame_123456.jpg") == "frame_123456.jpg"


@pytest.fixture
def capture_dir(tmp_path):
    """Synthetic VDR capture: capture.json + RGB jpgs + LiDAR bins,
    structure-identical to the reference's expected layout."""
    from PIL import Image

    w, h = 64, 48
    dw, dh = 32, 24
    rng = np.random.RandomState(0)
    frames = []
    n = 4
    for i in range(n):
        name = f"frame_{i}.jpg"
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / name)
        depth = np.full((dh, dw), 3.0, np.float32)
        depth[:, : dw // 2] = 1.0  # left half of the scene is NEAR (occludes 2 m)
        depth_name = f"depth_{i}.bin"
        depth.tofile(tmp_path / depth_name)
        # simple GL pose: identity orientation, camera at origin + i*0.1 along x
        T_gl = np.eye(4)
        T_gl[0, 3] = 0.1 * i
        frames.append({
            "image": name,
            "depth": depth_name,
            "pose4x4": T_gl.T.ravel().tolist(),  # column-major flattening
            "intrinsics": [50.0, 50.0, w / 2, h / 2, 0.0],
            "resolution": [w, h],
            "depthResolution": [dw, dh],
        })
    with open(tmp_path / "capture.json", "w") as f:
        json.dump({"frames": frames}, f)
    return tmp_path, (w, h), (dw, dh)


def test_vdr_sequence_parsing(capture_dir):
    path, (w, h), (dw, dh) = capture_dir
    seq = VDRSequence(str(path))
    assert len(seq) == 4
    frame = seq.frames[2]
    rgb = seq.load_rgb_from_frame(frame)
    assert rgb.shape == (h, w, 3)
    lidar = seq.load_lidar_from_frame(frame)
    assert lidar.shape == (dh, dw)
    K, hw = seq.load_intrinsics_from_frame(frame)
    assert hw == (h, w) and K[0, 0] == 50.0

    # GL -> CV is M @ T @ M (M = diag(1,-1,-1,1)): identity orientation
    # maps to identity; translation y/z flip, x preserved
    T = seq.load_pose_for_frame(frame)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], [0.2, 0.0, 0.0], atol=1e-6)

    # a y-translated GL pose lands at -y in CV
    f2 = dict(frame)
    T_gl = np.eye(4)
    T_gl[1, 3] = 0.5
    f2["pose4x4"] = T_gl.T.ravel().tolist()
    np.testing.assert_allclose(
        seq.load_pose_for_frame(f2)[:3, 3], [0.0, -0.5, 0.0], atol=1e-6)


def test_composite_capture_lidar_mode(capture_dir):
    path, (w, h), _ = capture_dir
    out = composite_capture(str(path), str(path / "out"), mode="lidar")
    assert os.path.exists(out) and os.path.getsize(out) > 0
    # frame 0 skipped; frames 1..3 composited
    jpgs = [f for f in os.listdir(path / "out") if f.endswith(".jpg")]
    assert len(jpgs) == 3
    from PIL import Image

    comp = np.asarray(Image.open(path / "out" / sorted(jpgs)[0])) / 255.0
    # left half: real surface at 1 m is in front of the 2 m virtual plane
    # -> original image shows; right half (3 m) -> teal virtual plane
    teal = np.array([0.30, 0.9, 0.78])
    right = comp[:, w // 2 + 2:].reshape(-1, 3)
    assert np.abs(right - teal).mean() < 0.08


def test_capture_to_inference_to_composite_chain(capture_dir):
    """The full AR pipeline off ONE raw capture dir: VDRDataset over
    capture.json -> run_inference mattes -> composite_capture consumes
    them by padded frame number (reference: inference/inference.py:162
    producing, inference/composite.py:99 consuming). Locks the filename
    contract between producer and consumer."""
    import jax
    import jax.numpy as jnp

    from implicit_depth_tpu.apps.inference import run_inference
    from implicit_depth_tpu.data.mvs_dataset import collate
    from implicit_depth_tpu.data.vdr import VDRDataset
    from implicit_depth_tpu.models.bd_net import BDNet

    path, (w, h), (dw, dh) = capture_dir
    # confidence bins (all-valid) for the dataset's lidar loader
    for i in range(4):
        np.full((dh, dw), 2, np.uint8).tofile(path / f"depthConfidence_{i}.bin")
    tuples_dir = path.parent / "tuples"
    tuples_dir.mkdir(exist_ok=True)
    with open(tuples_dir / "test_tuples.txt", "w") as f:
        f.write(f"{path.name} 1 0 2\n{path.name} 2 0 1\n{path.name} 3 1 2\n")

    ds = VDRDataset(
        dataset_path=str(path.parent), split="test",
        mv_tuple_file_suffix="_tuples.txt",
        tuple_info_file_location=str(tuples_dir),
        image_height=64, image_width=96,  # stride-32-friendly; loader resizes
        native_depth_width=dw, native_depth_height=dh,
        num_images_in_tuple=3, get_bd_info=True, pass_frame_id=True,
    )
    net = BDNet(image_encoder_name="tiny", num_src_views=2, num_depth_bins=8)
    cur, src = collate([ds[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
    cur["rendered_depth"] = cur["rendered_depth"][..., :1]
    src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                         method=BDNet.forward_val)

    mattes = path / "mattes"
    saved = run_inference(net, variables, ds, str(mattes))
    assert len(saved) == 3
    assert {os.path.basename(p) for p in saved} == {"00001.npy", "00002.npy",
                                                    "00003.npy"}

    out = composite_capture(str(path), str(path / "out_chain"), mode="mask",
                            predicted_masks_dir=str(mattes))
    assert os.path.exists(out)
    jpgs = [f for f in os.listdir(path / "out_chain") if f.endswith(".jpg")]
    assert len(jpgs) >= 1  # frames whose matte exists were composited


def test_composite_capture_mask_mode(capture_dir):
    path, (w, h), (dw, dh) = capture_dir
    masks = path / "masks"
    masks.mkdir()
    for i in range(4):
        matte = np.zeros((dh, dw), np.float32)
        matte[:, : dw // 2] = 1.0  # left half occluded
        np.save(masks / f"{i:05d}.npy", matte)
    out = composite_capture(str(path), str(path / "out_mask"), mode="mask",
                            predicted_masks_dir=str(masks), limit_frames=3)
    assert os.path.exists(out)
    jpgs = [f for f in os.listdir(path / "out_mask") if f.endswith(".jpg")]
    assert len(jpgs) == 2  # frames 1, 2 (0 skipped, limit at 3)
