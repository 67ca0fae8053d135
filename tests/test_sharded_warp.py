"""Sharded plane-sweep warp (shard_map over the data x model mesh).

Asserts numerical equality between the sharded and unsharded warp for
both bodies — the Pallas kernel (interpret mode) and the XLA twin — and
that a full BD training step with a mesh-equipped net matches the
unsharded loss (VERDICT r1 item 7). Runs on the 8-device virtual CPU
mesh from conftest.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from implicit_depth_tpu.parallel import mesh as mesh_lib
from implicit_depth_tpu.parallel.sharded_warp import sharded_warp, warp_planes_xla
from tests.test_warp_kernel import _setup

pytestmark = pytest.mark.slow


def _flat_inputs(B=4, K=2, H=16, W=128, C=8, D=8):
    """B*K flat views with distinct geometry per view."""
    src, A, b, planes = _setup(K=B * K, H=H, W=W, C=C, D=D)
    return (jnp.asarray(src), jnp.asarray(A), jnp.asarray(b), jnp.asarray(planes))


def test_sharded_xla_warp_matches_unsharded():
    mesh = mesh_lib.make_mesh(data=4, model=2)
    src, A, b, planes = _flat_inputs()
    ref = warp_planes_xla(src, A, b, planes)
    got = sharded_warp(mesh, src, A, b, planes, use_pallas=False)
    # sharded/unsharded compile to different fusions; float reassociation
    # puts differences at ~1e-4 absolute on unit-scale features
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-3)


def test_sharded_pallas_warp_matches_unsharded_interpret():
    from implicit_depth_tpu.ops.warp_kernel import warp_planes

    mesh = mesh_lib.make_mesh(data=4, model=2)
    src, A, b, planes = _flat_inputs()
    ref = warp_planes(src, A, b, planes, interpret=True)
    got = sharded_warp(mesh, src, A, b, planes, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_xla_twin_matches_kernel_semantics():
    """warp_planes_xla must be the exact same map as the Pallas kernel."""
    from implicit_depth_tpu.ops.warp_kernel import warp_planes

    src, A, b, planes = _flat_inputs(B=1, K=2)
    ref = warp_planes(src, A, b, planes, interpret=True)
    got = warp_planes_xla(src, A, b, planes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_sharded_warp_grad_flows():
    mesh = mesh_lib.make_mesh(data=4, model=2)
    src, A, b, planes = _flat_inputs()

    def loss(s):
        return jnp.sum(sharded_warp(mesh, s, A, b, planes, use_pallas=False) ** 2)

    g = jax.grad(loss)(src)
    ref = jax.grad(lambda s: jnp.sum(warp_planes_xla(s, A, b, planes) ** 2))(src)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_bd_train_step_sharded_warp_matches_unsharded_loss():
    """make_bd_train_step with net.mesh set: same loss as the meshless net."""
    from implicit_depth_tpu.models.bd_net import BDNet
    from implicit_depth_tpu.train import state as state_lib
    from tests.test_train import _batch, D_BINS, K

    mesh = mesh_lib.make_mesh(data=4, model=2)
    cur, src = _batch(batch_size=4)

    def run(mesh_arg):
        net = BDNet(num_src_views=K, num_depth_bins=D_BINS, train_bn=True,
                    image_encoder_name="tiny", mesh=mesh_arg)
        variables = net.init(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}, cur, src
        )
        tx = state_lib.make_optimizer()
        state = state_lib.create_train_state(variables, tx)
        if mesh_arg is not None:
            state = jax.device_put(state, mesh_lib.replicated(mesh_arg))
            batch = mesh_lib.shard_batch(mesh_arg, (cur, src))
            vs = mesh_lib.view_sharding(mesh_arg)
            batch = (batch[0], {k_: jax.device_put(v, vs) for k_, v in batch[1].items()})
        else:
            batch = (cur, src)
        step = jax.jit(state_lib.make_bd_train_step(net, train_flip=False))
        _, losses = step(state, batch, jax.random.PRNGKey(0))
        return float(losses["loss"])

    l_sharded = run(mesh)
    l_plain = run(None)
    np.testing.assert_allclose(l_sharded, l_plain, rtol=1e-4)
