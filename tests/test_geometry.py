"""Geometry parity: backproject/project/pose-distance/homography identities."""

import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.core import geometry


def _random_pose(rng):
    angle = rng.uniform(-0.5, 0.5, size=3)
    R = geometry.rotx(angle[0]) @ geometry.roty(angle[1]) @ geometry.rotz(angle[2])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.uniform(-1, 1, size=3)
    return T.astype(np.float32)


def _make_K(fx, fy, cx, cy):
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = fx, fy, cx, cy
    return K


def test_backproject_project_roundtrip():
    """Projecting backprojected points with the same camera recovers the
    +0.5-centre pixel grid and the input depths."""
    rng = np.random.RandomState(0)
    h, w = 6, 8
    K = _make_K(10.0, 11.0, 4.0, 3.0)
    invK = np.linalg.inv(K)
    depth = rng.uniform(0.5, 5.0, size=(h, w)).astype(np.float32)

    pts = geometry.backproject_depth(jnp.asarray(depth), jnp.asarray(invK))  # (h, w, 4)
    proj = geometry.project_points(
        jnp.asarray(np.asarray(pts).reshape(-1, 4)), jnp.asarray(K), jnp.asarray(np.eye(4, dtype=np.float32))
    )
    proj = np.asarray(proj).reshape(h, w, 3)

    grid = np.asarray(geometry.pixel_grid(h, w))
    np.testing.assert_allclose(proj[..., :2], grid[..., :2], atol=1e-4)
    np.testing.assert_allclose(proj[..., 2], depth, atol=1e-5)


def test_project_depth_clamp():
    """Points behind the camera get z clamped to eps (geometry_utils.py:86)."""
    pts = jnp.asarray([[0.0, 0.0, -2.0, 1.0]])
    out = geometry.project_points(pts, jnp.eye(4), jnp.eye(4))
    assert np.asarray(out)[0, 2] == np.float32(1e-5)


def test_pose_distance_identity_and_translation():
    c, r, t = geometry.pose_distance(jnp.eye(4))
    assert np.allclose([c, r, t], 0.0, atol=1e-6)

    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [3.0, 0.0, 4.0]
    c, r, t = geometry.pose_distance(jnp.asarray(T))
    np.testing.assert_allclose(t, 5.0, atol=1e-6)
    np.testing.assert_allclose(c, 5.0, atol=1e-6)

    # pure rotation of angle a: trace = 1 + 2cos(a), so
    # R_measure = sqrt(2(1 - trace/3)) = 2*sqrt((1 - cos a)/3)
    a = 0.3
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = geometry.rotx(a)
    c, r, t = geometry.pose_distance(jnp.asarray(T))
    np.testing.assert_allclose(r, 2 * np.sqrt((1 - np.cos(a)) / 3), atol=1e-5)


def test_plane_homographies_match_backproject_project():
    """The closed-form homography path must reproduce the reference's
    backproject-then-project pipeline (cost_volume.py:178-190) exactly."""
    rng = np.random.RandomState(1)
    h, w = 5, 7
    n_views, n_planes = 3, 4
    cur_K = _make_K(8.0, 9.0, 3.5, 2.5)
    cur_invK = np.linalg.inv(cur_K)
    src_Ks = np.stack([_make_K(8.0 + i, 9.0 - i, 3.5, 2.5) for i in range(n_views)])
    src_T_cur = np.stack([_random_pose(rng) for _ in range(n_views)])
    planes = np.asarray(geometry.log_depth_planes(0.25, 5.0, n_planes))

    M = geometry.plane_homographies(
        jnp.asarray(src_Ks), jnp.asarray(src_T_cur), jnp.asarray(cur_invK), jnp.asarray(planes)
    )  # (k, d, 3, 3)

    grid = np.asarray(geometry.pixel_grid(h, w)).reshape(-1, 3)  # (N, 3)
    got = np.einsum("kdij,nj->kdni", np.asarray(M), grid)

    for k in range(n_views):
        for d in range(n_planes):
            depth = np.full((h, w), planes[d], dtype=np.float32)
            pts = np.asarray(geometry.backproject_depth(jnp.asarray(depth), jnp.asarray(cur_invK)))
            proj = np.asarray(
                geometry.project_points(
                    jnp.asarray(pts.reshape(-1, 4)), jnp.asarray(src_Ks[k]), jnp.asarray(src_T_cur[k])
                )
            )
            uv_ref = proj[:, :2]
            z_got = got[k, d, :, 2]
            uv_got = got[k, d, :, :2] / np.maximum(z_got, 1e-5)[:, None]
            np.testing.assert_allclose(uv_got, uv_ref, rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.maximum(z_got, 1e-5), proj[:, 2], rtol=1e-5, atol=1e-5)


def test_log_depth_planes_endpoints():
    p = np.asarray(geometry.log_depth_planes(0.25, 5.0, 64))
    np.testing.assert_allclose(p[0], 0.25, rtol=1e-6)
    np.testing.assert_allclose(p[-1], 5.0, rtol=1e-6)
    assert np.all(np.diff(p) > 0)
    # log-spaced: ratios constant
    ratios = p[1:] / p[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-5)
