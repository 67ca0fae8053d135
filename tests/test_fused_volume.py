"""Fused volume kernel (warp + metadata + MLP) vs the XLA path.

The fused kernel (ops/fused_volume.py) must produce the same (b, d, h, w)
metadata feature volume as build_warped_views + MetadataVolumeMLP.__call__
— same params, same geometry — to f32 tolerance (the kernel computes the
ray metadata in closed form rather than through (k,d,h,w,3) tensors, so
bit-equality is not expected). Runs in interpret mode on CPU.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from implicit_depth_tpu.core import geometry
from implicit_depth_tpu.models.volume_mlp import MetadataVolumeMLP
from implicit_depth_tpu.volumes.cost_volume import build_warped_views

pytestmark = pytest.mark.slow


def _setup(seed=0, b=1, k=2, h=16, w=48, c=16, d=8):
    rng = np.random.RandomState(seed)
    cur = rng.randn(b, h, w, c).astype(np.float32)
    src = rng.randn(b, k, h, w, c).astype(np.float32)

    Kmat = np.eye(4, dtype=np.float32)
    Kmat[0, 0], Kmat[1, 1] = w / 3.0, h / 3.0
    Kmat[0, 2], Kmat[1, 2] = w / 2.0, h / 2.0
    invK = np.linalg.inv(Kmat)

    src_T_cur = np.zeros((b, k, 4, 4), np.float32)
    for bi in range(b):
        for ki in range(k):
            T = np.eye(4, dtype=np.float32)
            R = geometry.rotz(0.08 * (ki + 1) + 0.02 * bi) @ geometry.roty(-0.04 * ki)
            T[:3, :3] = R
            T[:3, 3] = [0.15 * ki + 0.05, -0.08, 0.03 * (bi + 1)]
            src_T_cur[bi, ki] = T
    cur_T_src = np.linalg.inv(src_T_cur)

    planes = geometry.log_depth_planes(0.5, 4.0, d)
    args = dict(
        cur=jnp.asarray(cur),
        src=jnp.asarray(src),
        src_K=jnp.asarray(np.broadcast_to(Kmat, (b, k, 4, 4)).copy()),
        src_T_cur=jnp.asarray(src_T_cur),
        cur_invK=jnp.asarray(np.broadcast_to(invK, (b, 4, 4)).copy()),
        cur_T_src=jnp.asarray(cur_T_src),
        planes=jnp.asarray(planes),
    )
    net = MetadataVolumeMLP(num_src_views=k, matching_dim=c)
    wv = build_warped_views(
        args["cur"], args["src"], args["src_K"], args["src_T_cur"],
        args["cur_invK"], args["cur_T_src"], args["planes"],
    )
    variables = net.init(jax.random.PRNGKey(1), wv, args["cur"])
    # non-trivial fc0 rows (lecun init is fine, but randomise biases too)
    variables = jax.tree.map(
        lambda x: x + 0.01 * np.random.RandomState(2).randn(*x.shape).astype(x.dtype),
        variables,
    )
    return net, variables, wv, args


def test_fused_volume_matches_xla():
    net, variables, wv, a = _setup()
    ref = net.apply(variables, wv, a["cur"])
    got = net.apply(
        variables, a["cur"], a["src"], a["src_K"], a["src_T_cur"],
        a["cur_invK"], a["cur_T_src"], a["planes"], interpret=True,
        method=MetadataVolumeMLP.fused,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-3)


def test_fused_volume_batch2():
    net, variables, wv, a = _setup(seed=3, b=2, k=3, h=16, w=40, d=8)
    ref = net.apply(variables, wv, a["cur"])
    got = net.apply(
        variables, a["cur"], a["src"], a["src_K"], a["src_T_cur"],
        a["cur_invK"], a["cur_T_src"], a["planes"], interpret=True,
        method=MetadataVolumeMLP.fused,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-3)


def test_fused_volume_under_lax_scan():
    """The fused Pallas kernel composes with jax.lax.scan (the temporal
    --temporal_scan window program runs the full forward, fused volume
    included, inside a scan body on TPU): scanning over two frames equals
    two independent calls."""
    net, variables, _, a = _setup()

    def call(cur, src):
        return net.apply(
            variables, cur, src, a["src_K"], a["src_T_cur"],
            a["cur_invK"], a["cur_T_src"], a["planes"], interpret=True,
            method=MetadataVolumeMLP.fused,
        )

    cur2 = jnp.stack([a["cur"], a["cur"] * 0.5])
    src2 = jnp.stack([a["src"], a["src"] * 0.5])

    @jax.jit
    def scanned(cur2, src2):
        def body(carry, xs):
            cur, src = xs
            return carry, call(cur, src)
        _, out = jax.lax.scan(body, 0, (cur2, src2))
        return out

    got = scanned(cur2, src2)
    ref0 = call(a["cur"], a["src"])
    ref1 = call(a["cur"] * 0.5, a["src"] * 0.5)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref1), atol=1e-5)


def test_fused_volume_in_bdnet_trunk():
    """BDNet.trunk(fused_volume=True) on CPU falls back to the XLA path
    (use_pallas_warp=False) — the gate must not change results."""
    from implicit_depth_tpu.models.bd_net import BDNet
    from implicit_depth_tpu.utils.fixtures import synthetic_bd_batch

    net = BDNet(image_encoder_name="tiny", num_src_views=2, num_depth_bins=8)
    cur, src = synthetic_bd_batch(batch=1, num_src=2, height=64, width=96,
                                  with_train_keys=False)
    cur = jax.tree.map(jnp.asarray, cur)
    src = jax.tree.map(jnp.asarray, src)
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                         method=BDNet.forward_val)
    out = net.apply(variables, cur, src, method=BDNet.forward_val)
    assert np.isfinite(np.asarray(out["pred_0"], dtype=np.float32)).all()


@pytest.mark.parametrize("bwd_impl", ["fused", "unfused"])
def test_fused_train_grads_match_unfused(bwd_impl):
    """fused_train under both custom-VJP implementations: the primal is
    the fused kernel; gradients must match the pure unfused path —
    exactly for bwd_impl="unfused" (the custom bwd literally
    differentiates it), to kernel tolerance for the fused Pallas
    backward."""
    net, variables, wv, a = _setup(seed=5)

    def fused_loss(variables, cur, src):
        vol = net.apply(
            variables, cur, src, a["src_K"], a["src_T_cur"],
            a["cur_invK"], a["cur_T_src"], a["planes"], interpret=True,
            bwd_impl=bwd_impl,
            method=MetadataVolumeMLP.fused_train,
        )
        return jnp.sum(vol.astype(jnp.float32) ** 2)

    def unfused_loss(variables, cur, src):
        wv2 = build_warped_views(
            cur, src, a["src_K"], a["src_T_cur"],
            a["cur_invK"], a["cur_T_src"], a["planes"],
        )
        vol = net.apply(variables, wv2, cur)
        return jnp.sum(vol.astype(jnp.float32) ** 2)

    lf, gf = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(
        variables, a["cur"], a["src"])
    lu, gu = jax.value_and_grad(unfused_loss, argnums=(0, 1, 2))(
        variables, a["cur"], a["src"])

    # primal: fused kernel vs unfused chain agree to kernel tolerance
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-3)
    # gradients: the unfused vjp linearised at (almost) the same loss —
    # must match the pure unfused grads tightly (identical math modulo
    # the upstream cotangent scale 2*vol vs 2*vol_fused)
    for tf_, tu_ in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(tf_), np.asarray(tu_),
                                   rtol=5e-3, atol=5e-3)
