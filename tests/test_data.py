"""Data layer tests: synthetic fixture geometry, BD sampling, keyframes."""

import numpy as np
import jax.numpy as jnp

from implicit_depth_tpu.data.keyframes import (
    DVMVSConfig,
    KeyframeBuffer,
    OfflineKeyframeBuffer,
    SimpleBuffer,
    pose_distance_np,
)
from implicit_depth_tpu.data.mvs_dataset import collate
from implicit_depth_tpu.data.synthetic import SyntheticDataset


def test_synthetic_dataset_contract_train():
    ds = SyntheticDataset(num_frames=10, num_views=4, split="train", get_bd_info=True)
    assert len(ds) == 7
    cur, src = ds[0]
    assert cur["image"].shape == (64, 96, 3)
    assert cur["depth"].shape == (32, 48, 1)
    assert cur["sampled_rays"].shape[1] == 2
    assert cur["sampled_depths"].shape[0] == cur["sampled_rays"].shape[0]
    assert src["image"].shape == (3, 64, 96, 3)
    assert src["world_T_cam"].shape == (3, 4, 4)
    # gt_depth NaN-free
    assert np.isfinite(cur["gt_depth"]).all()

    # sources sorted by pose distance to the reference
    pens = [
        pose_distance_np(np.linalg.inv(cur["cam_T_world"].astype(np.float64)),
                         src["world_T_cam"][i].astype(np.float64))[0]
        for i in range(3)
    ]
    assert pens == sorted(pens)


def test_synthetic_dataset_contract_val():
    ds = SyntheticDataset(num_frames=8, num_views=3, split="val", get_bd_info=True)
    cur, src = ds[0]
    assert cur["rendered_depth"].shape == (32, 48, 8)
    np.testing.assert_allclose(cur["rendered_depth"][0, 0], np.linspace(1.5, 5.0, 8), atol=1e-5)


def test_synthetic_multiview_consistency():
    """Backproject view A's GT depth, project into view B; B's depth at the
    projected pixel must match the projected z where visible.
    Exercises the full pose/intrinsics stack of the fixture."""
    from implicit_depth_tpu.core import geometry

    ds = SyntheticDataset(num_frames=6, num_views=3, split="val")
    a = ds.get_frame("scene0", 5)
    bframe = ds.get_frame("scene0", 4)

    depth_a = a["depth"][..., 0]
    valid = np.isfinite(depth_a)
    pts = np.asarray(geometry.backproject_depth(jnp.asarray(np.nan_to_num(depth_a)), jnp.asarray(a["invK_s0"])))
    world = np.einsum("ij,hwj->hwi", a["world_T_cam"], pts)
    proj = np.asarray(
        geometry.project_points(
            jnp.asarray(world.reshape(-1, 4)), jnp.asarray(bframe["K_s0"]), jnp.asarray(bframe["cam_T_world"])
        )
    ).reshape(depth_a.shape + (3,))

    u = np.round(proj[..., 0] - 0.5).astype(int)
    v = np.round(proj[..., 1] - 0.5).astype(int)
    z = proj[..., 2]
    h, w = depth_a.shape
    inb = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z > 0.1)
    db = bframe["depth"][..., 0]
    zb = db[v[inb] % h, u[inb] % w]
    finite = np.isfinite(zb)
    rel = np.abs(zb[finite] - z[inb][finite]) / z[inb][finite]
    # most pixels agree (occlusions / edge quantisation excluded)
    assert np.mean(rel < 0.05) > 0.75, np.mean(rel < 0.05)


def test_collate_shapes():
    ds = SyntheticDataset(num_frames=8, num_views=3, split="train", get_bd_info=True)
    cur, src = collate([ds[0], ds[1]])
    assert cur["image"].shape == (2, 64, 96, 3)
    assert src["image"].shape == (2, 2, 64, 96, 3)


def _pose(x=0.0, z=0.0):
    T = np.eye(4)
    T[:3, 3] = [x, 0, z]
    return T


def test_keyframe_buffer_selection():
    buf = KeyframeBuffer(
        buffer_size=DVMVSConfig.test_keyframe_buffer_size,
        keyframe_pose_distance=DVMVSConfig.test_keyframe_pose_distance,
        optimal_t_score=DVMVSConfig.test_optimal_t_measure,
        optimal_R_score=DVMVSConfig.test_optimal_R_measure,
    )
    assert buf.try_new_keyframe(_pose(0.0), "f0") == 0
    assert buf.try_new_keyframe(_pose(0.01), "f1") == 2  # too close
    assert buf.try_new_keyframe(_pose(0.2), "f2") == 1
    assert buf.try_new_keyframe(_pose(0.35), "f3") == 1
    frames = buf.get_best_measurement_frames(2)
    assert len(frames) == 2
    # optimal t = 0.15: from ref at 0.35, candidates at 0 (d=.35) and 0.2
    # (d=.15, exactly optimal) -> 0.2 must be selected
    assert any(f[1] == "f2" for f in frames)


def test_keyframe_buffer_tracking_lost():
    buf = KeyframeBuffer(5, 0.1, 0.15, 0.0)
    buf.try_new_keyframe(_pose(0.0), "f0")
    bad = np.full((4, 4), np.nan)
    for i in range(30):
        assert buf.try_new_keyframe(bad, f"b{i}") == 5
    assert buf.try_new_keyframe(bad, "b31") == 3
    assert len(buf.buffer) == 0


def test_offline_buffer_rejects_near_any():
    buf = OfflineKeyframeBuffer(5, 0.1, 0.15, 0.0)
    buf.try_new_keyframe(_pose(0.0), "f0")
    buf.try_new_keyframe(_pose(0.2), "f1")
    # near f0 but far from f1 -> still rejected (checks ALL buffered)
    assert buf.try_new_keyframe(_pose(0.05), "f2") == 2


def test_simple_buffer_fifo():
    buf = SimpleBuffer(buffer_size=2)
    buf.try_new_keyframe(_pose(0.0), "f0")
    buf.try_new_keyframe(_pose(0.1), "f1")
    buf.try_new_keyframe(_pose(0.2), "f2")
    frames = buf.get_measurement_frames()
    assert [f[1] for f in frames] == ["f0", "f1"]
