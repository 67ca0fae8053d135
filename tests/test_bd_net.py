"""BDNet end-to-end smoke tests on tiny synthetic batches (CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from implicit_depth_tpu.core import geometry
from implicit_depth_tpu.models.bd_net import BDNet

B, K = 1, 2
H, W = 64, 96         # image (must be /64 for the 5-scale U-Net)
HD, WD = 32, 48       # depth / scale-0 resolution
N_RAYS, N_SAMPLES, N_PLANES = 16, 8, 3
D_BINS = 8


def _make_K44(fx, fy, cx, cy):
    Km = np.eye(4, dtype=np.float32)
    Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2] = fx, fy, cx, cy
    return Km


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    K_s1 = _make_K44(W / 4, H / 4, W / 8, H / 8)
    K_s0 = _make_K44(W / 2, H / 2, W / 4, H / 4)
    poses = []
    for i in range(K + 1):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.1 * i, 0.0, 0.05 * i]
        poses.append(T)
    cur_data = {
        "image": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "invK_s1": jnp.asarray(np.linalg.inv(K_s1))[None].repeat(B, 0),
        "K_s0": jnp.asarray(K_s0)[None].repeat(B, 0),
        "invK_s0": jnp.asarray(np.linalg.inv(K_s0))[None].repeat(B, 0),
        "world_T_cam": jnp.asarray(poses[0])[None].repeat(B, 0),
        "cam_T_world": jnp.asarray(np.linalg.inv(poses[0]))[None].repeat(B, 0),
        "gt_depth": jnp.asarray(rng.uniform(0.5, 4.0, (B, HD, WD, 1)), jnp.float32),
        "sampled_rays": jnp.asarray(
            np.stack([rng.uniform(0, WD, (B, N_RAYS)), rng.uniform(0, HD, (B, N_RAYS))], -1),
            jnp.float32,
        ),
        "sampled_depths": jnp.asarray(rng.uniform(0.3, 5.0, (B, N_RAYS, N_SAMPLES)), jnp.float32),
        "rendered_depth": jnp.asarray(
            np.broadcast_to(np.linspace(1.5, 3.0, N_PLANES, dtype=np.float32), (B, HD, WD, N_PLANES))
        ),
    }
    src_data = {
        "image": jnp.asarray(rng.randn(B, K, H, W, 3), jnp.float32),
        "K_s1": jnp.asarray(np.stack([K_s1] * K))[None].repeat(B, 0),
        "world_T_cam": jnp.asarray(np.stack(poses[1:]))[None].repeat(B, 0),
        "cam_T_world": jnp.asarray(np.linalg.inv(np.stack(poses[1:])))[None].repeat(B, 0),
    }
    return cur_data, src_data


@pytest.fixture(scope="module")
def net_and_params(batch):
    """Full EfficientNetV2-S net — exercised once by the train-forward test."""
    cur, src = batch
    net = BDNet(num_src_views=K, num_depth_bins=D_BINS)
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src, flip=False)
    return net, variables


@pytest.fixture(scope="module")
def tiny_net_and_params(batch):
    cur, src = batch
    net = BDNet(num_src_views=K, num_depth_bins=D_BINS, image_encoder_name="tiny")
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src, flip=False)
    return net, variables


def test_train_forward_shapes(net_and_params, batch):
    net, variables = net_and_params
    cur, src = batch
    out = net.apply(variables, cur, src, flip=False)
    assert out["pred_0"].shape == (B, N_RAYS, N_SAMPLES)
    assert out["pred_1"].shape == (B, (N_RAYS + 1) // 2, N_SAMPLES)
    assert out["target_depth"].shape == (B, N_RAYS)
    assert out["lowest_cost"].shape == (B, H // 4, W // 4)
    for k in ("pred_0", "pred_1", "pred_2", "pred_3", "lowest_cost"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_train_forward_flip_runs(tiny_net_and_params, batch):
    net, variables = tiny_net_and_params
    cur, src = batch
    out = net.apply(variables, cur, src, flip=True)
    assert np.isfinite(np.asarray(out["pred_0"])).all()


def test_val_forward_dense(tiny_net_and_params, batch):
    net, variables = tiny_net_and_params
    cur, src = batch
    out = net.apply(variables, cur, src, method=BDNet.forward_val)
    assert out["pred_0"].shape == (B, HD, WD, N_PLANES)
    assert np.isfinite(np.asarray(out["pred_0"])).all()


def test_infer_depth_bisection(tiny_net_and_params, batch):
    net, variables = tiny_net_and_params
    cur, src = batch
    out = net.apply(variables, cur, src, method=BDNet.forward_infer_depth)
    d = np.asarray(out["search_depths"])
    assert d.shape == (B, HD, WD)
    assert (d >= 0.5).all() and (d <= 8.0).all()


def test_zero_volume_variant(batch):
    cur, src = batch
    net = BDNet(num_src_views=K, num_depth_bins=D_BINS, image_encoder_name="tiny", feature_volume_type="zero_cost_volume")
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src, flip=False)
    out = net.apply(variables, cur, src, flip=False)
    assert np.isfinite(np.asarray(out["pred_0"])).all()


def test_dot_volume_variant(batch):
    cur, src = batch
    net = BDNet(num_src_views=K, num_depth_bins=D_BINS, image_encoder_name="tiny", feature_volume_type="simple_cost_volume")
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src, flip=False)
    out = net.apply(variables, cur, src, flip=False)
    assert np.isfinite(np.asarray(out["pred_0"])).all()
