"""C++ z-buffer rasterizer + closed-form plane renderer + temporal eval."""

import numpy as np
import jax.numpy as jnp

from implicit_depth_tpu.eval import rasterizer as ras
from implicit_depth_tpu.eval.temporal import TemporalEvaluator


def _K(h, w):
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = w * 0.8
    K[0, 2], K[1, 2] = w / 2, h / 2
    return K


def _quad(z, half=2.0):
    """Two triangles forming a square at depth z facing the camera."""
    verts = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def test_rasterize_frontal_quad():
    h, w = 48, 64
    verts, faces = _quad(2.0, half=0.5)
    depth = ras.rasterize_mesh_depth(verts, faces, np.eye(4, dtype=np.float32), _K(h, w), h, w)
    assert depth[h // 2, w // 2] > 0
    np.testing.assert_allclose(depth[depth > 0], 2.0, atol=1e-4)
    assert depth[0, 0] == 0.0  # quad doesn't reach the corner at this fov


def test_rasterize_zbuffer_ordering():
    h, w = 32, 32
    v1, f1 = _quad(3.0, half=3.0)
    v2, f2 = _quad(1.5, half=0.5)  # nearer, smaller
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    depth = ras.rasterize_mesh_depth(verts, faces, np.eye(4, dtype=np.float32), _K(h, w), h, w)
    assert abs(depth[h // 2, w // 2] - 1.5) < 1e-4  # near quad wins
    assert abs(depth[2, 2] - 3.0) < 1e-4            # far quad elsewhere


def test_rasterize_slanted_matches_plane_equation():
    h, w = 40, 40
    verts = np.array(
        [[-2, -2, 2.0], [2, -2, 3.0], [2, 2, 3.0], [-2, 2, 2.0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    K = _K(h, w)
    depth = ras.rasterize_mesh_depth(verts, faces, np.eye(4, dtype=np.float32), K, h, w)
    # plane: z = 2.5 + (x / z) * ... analytic check at centre pixel:
    # ray through centre has x=y=0 => x_world = 0 => z = 2.5
    assert abs(depth[h // 2, w // 2] - 2.5) < 0.02


def test_project_vertices():
    K = _K(48, 64)
    verts = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, -1.0]], np.float32)
    uvz = ras.project_mesh_vertices(verts, np.eye(4, dtype=np.float32), K)
    np.testing.assert_allclose(uvz[0], [32.0, 24.0, 2.0], atol=1e-5)
    assert uvz[1, 2] < 0  # behind camera flagged


def test_ply_roundtrip(tmp_path):
    verts, faces = _quad(2.0)
    path = str(tmp_path / "mesh.ply")
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
    v2, f2 = ras.load_ply(path)
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(f2, faces)


def test_render_plane_depth_identity_camera():
    h, w = 48, 64
    K = jnp.asarray(_K(h, w))
    depth = ras.render_plane_depth(
        jnp.eye(4), 2.5, jnp.eye(4), K, h, w
    )
    np.testing.assert_allclose(np.asarray(depth), 2.5, atol=1e-5)

    # translated render camera still sees the plane at adjusted depth
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.5  # cam_T_world: world pushed +0.5 in z => plane closer
    depth2 = ras.render_plane_depth(jnp.eye(4), 2.5, jnp.asarray(T), K, h, w)
    np.testing.assert_allclose(np.asarray(depth2), 3.0, atol=1e-5)


def test_fused_vertex_sampling_matches_numpy_composition():
    """The one-call C++ update == the unfused rasterize+project+sample
    chain on a random mesh, random camera, random prediction."""
    rng = np.random.default_rng(0)
    h, w = 48, 64
    n_verts, n_faces = 4000, 8000
    verts = rng.uniform([-3, -3, 0.5], [3, 3, 6.0], (n_verts, 3)).astype(np.float32)
    faces = rng.integers(0, n_verts, (n_faces, 3)).astype(np.int32)
    K = _K(h, w)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.1, -0.2, 0.05]
    pred = rng.uniform(-0.5, 1.0, (h, w)).astype(np.float32)

    ev = TemporalEvaluator(height=h, width=w)
    ev.initialise_new_scene(verts=verts, faces=faces)
    ev.update_vertex_predictions(pred, T, K)          # fused C++
    ev._update_vertex_predictions_py(pred, T, K)      # numpy oracle
    fused, oracle = ev.vertex_predictions
    np.testing.assert_array_equal(fused, oracle)


def test_temporal_evaluator_flicker_counting():
    h, w = 48, 64
    ev = TemporalEvaluator(height=h, width=w)
    verts, faces = _quad(2.0, half=0.5)
    ev.initialise_new_scene(verts=verts, faces=faces)
    gt = np.full((h, w), 2.0, np.float32)
    ev.initialise_new_plane(gt, np.eye(4))
    assert abs(ev.plane_distance - 2.0) < 1e-6

    K = _K(h, w)
    # frame 1: everything visible -> predictions 0.9 (occluded)
    ev.update_vertex_predictions(np.full((h, w), 0.9, np.float32), np.eye(4), K)
    # frame 2: flip to 0.1
    ev.update_vertex_predictions(np.full((h, w), 0.1, np.float32), np.eye(4), K)
    # frame 3: stay at 0.1
    ev.update_vertex_predictions(np.full((h, w), 0.1, np.float32), np.eye(4), K)
    ev.compute_vertex_occlusion_changes()
    # all 4 quad vertices visible; exactly one flip each
    assert ev.total_diffs == 4.0
    assert ev.temporal_score(n_scans=1) == 4.0 / (13 * 8)


def test_device_vertex_scorer_matches_cpp_fused():
    """eval/vertex_scorer.py frame sampling == the fused C++
    sample_vertex_predictions on a random mesh / camera / prediction."""
    from implicit_depth_tpu.eval.vertex_scorer import DeviceVertexScorer

    rng = np.random.default_rng(1)
    h, w = 48, 64
    n_verts, n_faces = 4000, 8000
    verts = rng.uniform([-3, -3, 0.5], [3, 3, 6.0], (n_verts, 3)).astype(np.float32)
    faces = rng.integers(0, n_verts, (n_faces, 3)).astype(np.int32)
    K = _K(h, w)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.1, -0.2, 0.05]
    pred = rng.uniform(-0.5, 1.0, (h, w)).astype(np.float32)

    cpp = ras.sample_vertex_predictions(verts, faces, T, K[:3, :3], pred)
    zbuf = ras.rasterize_mesh_depth(verts, faces, T, K, h, w)
    dev = DeviceVertexScorer(verts, h, w).frame_values(pred, zbuf, T, K)
    # identical math up to f32 FMA-contraction differences between the
    # C++ and XLA projection; mismatches can only occur for vertices
    # whose pixel rounds differently at an exact .5 boundary
    n_diff = int((cpp != dev).sum())
    assert n_diff <= max(2, n_verts // 1000), (n_diff, n_verts)


def test_device_vertex_scorer_window_flips_match_evaluator():
    """Device per-window flip count == TemporalEvaluator's host path."""
    from implicit_depth_tpu.eval.vertex_scorer import DeviceVertexScorer

    rng = np.random.default_rng(2)
    h, w = 48, 64
    n_verts, n_faces = 2000, 4000
    verts = rng.uniform([-3, -3, 0.5], [3, 3, 6.0], (n_verts, 3)).astype(np.float32)
    faces = rng.integers(0, n_verts, (n_faces, 3)).astype(np.int32)
    K = _K(h, w)
    L = 5
    cams, preds, zbufs = [], [], []
    for f in range(L):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.05 * f, -0.02 * f, 0.01 * f]
        cams.append(T)
        preds.append(rng.uniform(-0.5, 1.0, (h, w)).astype(np.float32))
        zbufs.append(ras.rasterize_mesh_depth(verts, faces, T, K, h, w))

    ev = TemporalEvaluator(height=h, width=w)
    ev.initialise_new_scene(verts=verts, faces=faces)
    for f in range(L):
        ev.update_vertex_predictions(preds[f], cams[f], K)
    ev.compute_vertex_occlusion_changes()

    scorer = DeviceVertexScorer(verts, h, w)
    flips = float(scorer.window_flips(
        np.stack(preds), np.stack(zbufs), np.stack(cams),
        np.stack([K] * L)))
    # flip counts may differ by a handful of boundary-rounding vertices
    assert abs(flips - ev.total_diffs) <= max(2.0, 0.002 * n_verts), (
        flips, ev.total_diffs)
