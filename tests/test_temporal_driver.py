"""End-to-end temporal evaluation on the synthetic dataset (tiny net)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from implicit_depth_tpu.data.mvs_dataset import collate
from implicit_depth_tpu.data.synthetic import SyntheticDataset
from implicit_depth_tpu.eval.temporal_driver import evaluate_temporal
from implicit_depth_tpu.models.bd_net import BDNet


def test_temporal_driver_runs(tmp_path):
    ds = SyntheticDataset(num_frames=9, num_views=3, split="val", get_bd_info=True)
    net = BDNet(image_encoder_name="tiny", num_src_views=2, num_depth_bins=8)
    cur, src = collate([ds[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items()}
    src = {k: jnp.asarray(v) for k, v in src.items()}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                         method=BDNet.forward_val)

    # synthetic GT mesh: a quad roughly at the scene's background wall
    verts = np.array([[-3, -3, 4.0], [3, -3, 4.0], [3, 3, 4.0], [-3, 3, 4.0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh_path = str(tmp_path / "scene0.ply")
    with open(mesh_path, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 4\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("element face 2\nproperty list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")

    result = evaluate_temporal(
        net, variables, {"scene0": ds}, {"scene0": mesh_path},
        eval_length=4, warmup=1, frame_multiplier=2,
        height=ds.depth_height, width=ds.depth_width,
        max_frames_per_scene=6,
    )
    assert np.isfinite(result["temporal_score"])
    assert result["total_verts"] >= 0


def test_temporal_driver_with_prior(tmp_path):
    ds = SyntheticDataset(num_frames=7, num_views=3, split="val", get_bd_info=True)
    net = BDNet(image_encoder_name="tiny", num_src_views=2, num_depth_bins=8, use_prior=True)
    cur, src = collate([ds[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items()}
    src = {k: jnp.asarray(v) for k, v in src.items()}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                         method=BDNet.forward_val)
    verts = np.array([[-3, -3, 4.0], [3, -3, 4.0], [3, 3, 4.0], [-3, 3, 4.0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    from implicit_depth_tpu.eval import temporal

    ev_result = evaluate_temporal(
        net, variables, {"scene0": ds},
        {"scene0": None} if False else {"scene0": _write_ply(tmp_path, verts, faces)},
        eval_length=3, max_frames_per_scene=5,
        height=ds.depth_height, width=ds.depth_width,
    )
    assert np.isfinite(ev_result["temporal_score"])


def test_frame_keys_follow_matching_scale():
    """The packed frame program carries the net's matching-scale
    intrinsics (regression: keys were hardcoded to scales 0/1). A full
    forward at matching_scale != 1 is not exercised: the reference's
    ResnetMatchingEncoder is fixed at 1/4 resolution, so only scale 1 is
    architecturally supported there too (bd_model.py:115-124)."""
    from implicit_depth_tpu.eval.temporal_driver import _frame_keys

    cur1, src1 = _frame_keys(1)
    assert cur1 == ("world_T_cam", "cam_T_world", "K_s0", "invK_s0",
                    "K_s1", "invK_s1")
    assert src1 == ("world_T_cam", "cam_T_world", "K_s0", "K_s1")
    cur2, src2 = _frame_keys(2)
    assert "K_s2" in cur2 and "invK_s2" in cur2 and "K_s2" in src2
    cur0, src0 = _frame_keys(0)
    assert cur0 == ("world_T_cam", "cam_T_world", "K_s0", "invK_s0")
    assert src0 == ("world_T_cam", "cam_T_world", "K_s0")


@pytest.mark.slow
def test_temporal_scan_matches_frame_mode(tmp_path):
    """The device-resident lax.scan window loop produces the same flips
    and score as the per-frame dispatch loop (incl. prior feedback)."""
    ds = SyntheticDataset(num_frames=9, num_views=3, split="val", get_bd_info=True)
    net = BDNet(image_encoder_name="tiny", num_src_views=2, num_depth_bins=8,
                use_prior=True)
    cur, src = collate([ds[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items()}
    src = {k: jnp.asarray(v) for k, v in src.items()}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                         method=BDNet.forward_val)
    verts = np.array([[-3, -3, 4.0], [3, -3, 4.0], [3, 3, 4.0], [-3, 3, 4.0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = _write_ply(tmp_path, verts, faces)

    kwargs = dict(eval_length=3, warmup=1, frame_multiplier=2,
                  height=ds.depth_height, width=ds.depth_width,
                  max_frames_per_scene=7)
    r_frame = evaluate_temporal(net, variables, {"scene0": ds}, {"scene0": mesh},
                                collect_preds=True, **kwargs)
    r_scan = evaluate_temporal(net, variables, {"scene0": ds}, {"scene0": mesh},
                               use_scan=True, collect_preds=True, **kwargs)
    assert r_scan["total_verts"] == r_frame["total_verts"]
    assert r_scan["total_diffs"] == r_frame["total_diffs"]
    np.testing.assert_allclose(r_scan["temporal_score"], r_frame["temporal_score"])
    # the per-frame sigmoid maps themselves match, not just the flip count
    assert len(r_scan["preds"]) == len(r_frame["preds"]) == 7
    for a, b in zip(r_scan["preds"], r_frame["preds"]):
        np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_temporal_scan_matches_frame_mode_regression(tmp_path):
    """Scan == frame-mode for the regression (DepthNet) temporal path
    (test_reg.py:145-187): hard rendered<pred classifier, no prior."""
    from implicit_depth_tpu.models.depth_net import DepthNet

    ds = SyntheticDataset(num_frames=7, num_views=3, split="val", get_bd_info=True)
    net = DepthNet(num_src_views=2, num_depth_bins=8, image_encoder_name="tiny")
    cur, src = collate([ds[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items()}
    src = {k: jnp.asarray(v) for k, v in src.items()}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src)
    verts = np.array([[-3, -3, 4.0], [3, -3, 4.0], [3, 3, 4.0], [-3, 3, 4.0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = _write_ply(tmp_path, verts, faces)

    kwargs = dict(eval_length=3, warmup=1, frame_multiplier=2, regression=True,
                  height=ds.depth_height, width=ds.depth_width,
                  max_frames_per_scene=5)
    r_frame = evaluate_temporal(net, variables, {"scene0": ds}, {"scene0": mesh},
                                **kwargs)
    r_scan = evaluate_temporal(net, variables, {"scene0": ds}, {"scene0": mesh},
                               use_scan=True, **kwargs)
    assert r_scan["total_diffs"] == r_frame["total_diffs"]
    np.testing.assert_allclose(r_scan["temporal_score"], r_frame["temporal_score"])


def _write_ply(tmp_path, verts, faces):
    path = str(tmp_path / "mesh.ply")
    with open(path, "w") as f:
        f.write(f"ply\nformat ascii 1.0\nelement vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\nproperty list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
    return path


@pytest.mark.slow
def test_temporal_scan_device_scoring_matches_host(tmp_path):
    """Scan mode with the device vertex scorer (project+sample+flip count
    on-device, z-buffers from C++) produces the same flips/score as the
    host C++ scoring path."""
    ds = SyntheticDataset(num_frames=9, num_views=3, split="val", get_bd_info=True)
    net = BDNet(image_encoder_name="tiny", num_src_views=2, num_depth_bins=8,
                use_prior=True)
    cur, src = collate([ds[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items()}
    src = {k: jnp.asarray(v) for k, v in src.items()}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                         method=BDNet.forward_val)
    verts = np.array([[-3, -3, 4.0], [3, -3, 4.0], [3, 3, 4.0], [-3, 3, 4.0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = _write_ply(tmp_path, verts, faces)

    kwargs = dict(eval_length=3, warmup=1, frame_multiplier=2,
                  height=ds.depth_height, width=ds.depth_width,
                  max_frames_per_scene=7, use_scan=True)
    r_host = evaluate_temporal(net, variables, {"scene0": ds}, {"scene0": mesh},
                               device_scoring=False, **kwargs)
    r_dev = evaluate_temporal(net, variables, {"scene0": ds}, {"scene0": mesh},
                              device_scoring=True, **kwargs)
    assert r_dev["total_verts"] == r_host["total_verts"]
    assert r_dev["total_diffs"] == r_host["total_diffs"]
    np.testing.assert_allclose(r_dev["temporal_score"], r_host["temporal_score"])
