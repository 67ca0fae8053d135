"""Pallas warp kernel vs the XLA gather path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from implicit_depth_tpu.core import geometry
from implicit_depth_tpu.core.sampling import sample_bilinear_idx
from implicit_depth_tpu.ops.warp_kernel import warp_planes


def _xla_reference(src_khwc, A, b, planes):
    """Same math via the exact XLA sampler."""
    K, H, W, C = src_khwc.shape
    D = planes.shape[0]
    grid = geometry.pixel_grid(H, W)  # (H, W, 3)
    e3 = np.zeros((3,), np.float32); e3[2] = 1.0
    M = planes[None, :, None, None] * A[:, None] + (b[..., None] * e3)[:, None]
    xyz = np.einsum("kdij,hwj->kdhwi", M, np.asarray(grid))
    z = np.maximum(xyz[..., 2], 1e-5)
    x = np.clip(xyz[..., 0] / z - 0.5, -2.0 * W, 2.0 * W)
    y = np.clip(xyz[..., 1] / z - 0.5, -2.0 * H, 2.0 * H)
    out = np.zeros((K, D, H, W, C), np.float32)
    for k in range(K):
        out[k] = np.asarray(
            sample_bilinear_idx(jnp.asarray(src_khwc[k]), jnp.asarray(x[k]), jnp.asarray(y[k]))
        )
    return out


def _setup(seed=0, K=2, H=16, W=128, C=8, D=3):
    rng = np.random.RandomState(seed)
    src = rng.randn(K, H, W, C).astype(np.float32)
    # views: modest rotation + translation, some points behind / out of frame
    A = np.zeros((K, 3, 3), np.float32)
    b = np.zeros((K, 3), np.float32)
    for k in range(K):
        ang = 0.1 * (k + 1)
        R = geometry.rotz(ang) @ geometry.roty(-0.05 * k)
        Kmat = np.array([[W / 3, 0, W / 2], [0, H / 3, H / 2], [0, 0, 1.0]])
        A[k] = (Kmat @ R @ np.linalg.inv(Kmat)).astype(np.float32)
        b[k] = (Kmat @ np.array([0.2 * k + 0.1, -0.1, 0.02])).astype(np.float32)
    planes = np.asarray(geometry.log_depth_planes(0.5, 4.0, D))
    return src, A, b, planes


def test_warp_kernel_matches_xla_interpret():
    src, A, b, planes = _setup()
    ref = _xla_reference(src, A, b, planes)
    got = warp_planes(
        jnp.asarray(src), jnp.asarray(A), jnp.asarray(b), jnp.asarray(planes),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-4)


def test_warp_kernel_zero_padding_behaviour():
    """Pure translation pushing samples out of frame -> exact zeros."""
    src, A, b, planes = _setup(K=1, H=16, W=128, C=8, D=2)
    A[0] = np.eye(3)
    b[0] = np.array([1e4, 0.0, 0.0], np.float32)  # shift far right
    got = warp_planes(
        jnp.asarray(src), jnp.asarray(A), jnp.asarray(b), jnp.asarray(planes),
        interpret=True,
    )
    assert np.all(np.asarray(got) == 0.0)


def test_warp_kernel_identity():
    """Identity homography at plane depth 1 reproduces the source exactly."""
    rng = np.random.RandomState(1)
    src = rng.randn(1, 16, 128, 8).astype(np.float32)
    A = np.eye(3, dtype=np.float32)[None]
    b = np.zeros((1, 3), np.float32)
    planes = np.ones((1,), np.float32)
    got = warp_planes(jnp.asarray(src), jnp.asarray(A), jnp.asarray(b), jnp.asarray(planes), interpret=True)
    np.testing.assert_allclose(np.asarray(got)[0, 0], src[0], atol=1e-5)


def test_warp_backward_matches_autodiff():
    """Transpose kernel vs jax autodiff of the exact XLA sampler."""
    import jax

    src, A, b, planes = _setup(K=2, H=16, W=128, C=8, D=3)
    ct = np.random.RandomState(3).randn(2, 3, 16, 128, 8).astype(np.float32)

    def xla_warp(s):
        from implicit_depth_tpu.core import geometry
        from implicit_depth_tpu.core.sampling import sample_bilinear_idx

        K, H, W, C = s.shape
        grid = geometry.pixel_grid(H, W)
        e3 = jnp.zeros((3,)).at[2].set(1.0)
        M = jnp.asarray(planes)[None, :, None, None] * jnp.asarray(A)[:, None] \
            + (jnp.asarray(b)[..., None] * e3)[:, None]
        xyz = jnp.einsum("kdij,hwj->kdhwi", M, grid)
        z = jnp.maximum(xyz[..., 2], 1e-5)
        x = jnp.clip(xyz[..., 0] / z - 0.5, -2.0 * W, 2.0 * W)
        y = jnp.clip(xyz[..., 1] / z - 0.5, -2.0 * H, 2.0 * H)
        return jax.vmap(sample_bilinear_idx)(s, x, y)

    _, vjp = jax.vjp(xla_warp, jnp.asarray(src))
    ref_grad, = vjp(jnp.asarray(ct))

    from implicit_depth_tpu.ops.warp_kernel import warp_planes_bwd

    got = warp_planes_bwd(jnp.asarray(ct), jnp.asarray(A), jnp.asarray(b),
                          jnp.asarray(planes), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_grad), atol=3e-4, rtol=1e-3)


def test_warp_planes_diff_grad_flows():
    import jax

    src, A, b, planes = _setup(K=1, H=16, W=128, C=8, D=2)
    from implicit_depth_tpu.ops import warp_kernel as wk

    # interpret-mode twins of the vjp pair
    def f(s):
        return jnp.sum(wk.warp_planes(s, jnp.asarray(A), jnp.asarray(b),
                                      jnp.asarray(planes), interpret=True) ** 2)

    # finite check through the custom_vjp wrapper in interpret mode:
    # monkeypatch interpret for CPU execution
    orig_fwd, orig_bwd = wk.warp_planes, wk.warp_planes_bwd
    wk.warp_planes = lambda *a, **kw: orig_fwd(*a, interpret=True)
    wk.warp_planes_bwd = lambda *a, **kw: orig_bwd(*a, interpret=True)
    try:
        g = jax.grad(lambda s: jnp.sum(
            wk.warp_planes_diff(s, jnp.asarray(A), jnp.asarray(b), jnp.asarray(planes)) ** 2
        ))(jnp.asarray(src))
    finally:
        wk.warp_planes, wk.warp_planes_bwd = orig_fwd, orig_bwd
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_warp_kernel_unaligned_shapes_fwd():
    """Lane-tiling generalisation: non-multiple-of-128 W and non-multiple-
    of-8 H are zero-padded internally and must match the XLA path exactly
    (640x480-class configs have matching res 160x120)."""
    for (H, W) in [(12, 72), (10, 130), (120, 160)]:
        src, A, b, planes = _setup(K=2, H=H, W=W, C=8, D=3)
        ref = _xla_reference(src, A, b, planes)
        got = warp_planes(
            jnp.asarray(src), jnp.asarray(A), jnp.asarray(b), jnp.asarray(planes),
            interpret=True,
        )
        assert got.shape == (2, 3, H, W, 8)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-4)


def test_warp_kernel_unaligned_shapes_bwd():
    import jax
    from implicit_depth_tpu.ops.warp_kernel import warp_planes_bwd

    H, W = 12, 72
    src, A, b, planes = _setup(K=2, H=H, W=W, C=8, D=3)
    ct = np.random.RandomState(3).randn(2, 3, H, W, 8).astype(np.float32)

    def xla_warp(s):
        K, Hh, Ww, C = s.shape
        grid = geometry.pixel_grid(Hh, Ww)
        e3 = jnp.zeros((3,)).at[2].set(1.0)
        M = jnp.asarray(planes)[None, :, None, None] * jnp.asarray(A)[:, None] \
            + (jnp.asarray(b)[..., None] * e3)[:, None]
        xyz = jnp.einsum("kdij,hwj->kdhwi", M, grid)
        z = jnp.maximum(xyz[..., 2], 1e-5)
        x = jnp.clip(xyz[..., 0] / z - 0.5, -2.0 * Ww, 2.0 * Ww)
        y = jnp.clip(xyz[..., 1] / z - 0.5, -2.0 * Hh, 2.0 * Hh)
        return jax.vmap(sample_bilinear_idx)(s, x, y)

    _, vjp = jax.vjp(xla_warp, jnp.asarray(src))
    ref_grad, = vjp(jnp.asarray(ct))
    got = warp_planes_bwd(jnp.asarray(ct), jnp.asarray(A), jnp.asarray(b),
                          jnp.asarray(planes), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_grad),
                               atol=3e-4, rtol=1e-3)


def test_build_warped_views_fallback_warning(caplog):
    """use_pallas with a non-16 matching dim logs the fallback once; c=16
    takes the kernel path (gate: volumes/cost_volume.py)."""
    import logging
    from implicit_depth_tpu.volumes import cost_volume as cv

    b, k, h, w = 1, 2, 8, 32
    rng = np.random.RandomState(0)
    Kmat = np.eye(4, dtype=np.float32)[None, None].repeat(k, 1)
    T = np.eye(4, dtype=np.float32)[None, None].repeat(k, 1)
    invK = np.eye(4, dtype=np.float32)[None]
    planes = jnp.asarray([1.0, 2.0], jnp.float32)

    cv._warned_fallback.clear()
    with caplog.at_level(logging.WARNING, logger="implicit_depth_tpu.volumes.cost_volume"):
        cv.build_warped_views(
            jnp.asarray(rng.randn(b, h, w, 8), jnp.float32),
            jnp.asarray(rng.randn(b, k, h, w, 8), jnp.float32),
            jnp.asarray(Kmat), jnp.asarray(T), jnp.asarray(invK), jnp.asarray(T),
            planes, use_pallas=True,
        )
    assert any("falling back" in r.message for r in caplog.records)
