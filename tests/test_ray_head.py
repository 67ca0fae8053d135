"""Fused ray-head kernel (ops/ray_head.py) vs the XLA factored chain.

The kernel implements the training query head's per-sample MLP
(reference modules/networks.py:87-115 via bd_model.py:313-393) with the
hiddens VMEM-resident. Interpret mode on CPU; numerics are compared to
the XLA factored path (bf16 chain) and an f32 oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_depth_tpu.ops.ray_head import ray_head_mlp

F = 128


def xla_chain(fp, d, p, k0d, k0p, w1, b1, w2, b2, dt=jnp.bfloat16):
    h = fp.astype(dt)[:, :, None, :] + d.astype(dt)[..., None] * k0d.astype(dt)
    if p is not None:
        h = h + p.astype(dt)[..., None] * k0p.astype(dt)
    h = jax.nn.elu(h)
    h = jax.nn.elu(h @ w1.astype(dt) + b1.astype(dt))
    return (h @ w2.astype(dt) + b2.astype(dt))[..., 0]


def make_inputs(b, n, s, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(b, n, F), jnp.bfloat16),        # fp
        jnp.asarray(rng.rand(b, n, s) * 5, jnp.float32),      # depths
        jnp.asarray(rng.rand(b, n, s), jnp.float32),          # prior
        jnp.asarray(rng.randn(F) * 0.1, jnp.float32),         # k0d
        jnp.asarray(rng.randn(F) * 0.1, jnp.float32),         # k0p
        jnp.asarray(rng.randn(F, F) * 0.1, jnp.float32),      # w1
        jnp.asarray(rng.randn(F) * 0.1, jnp.float32),         # b1
        jnp.asarray(rng.randn(F, 1) * 0.1, jnp.float32),      # w2
        jnp.asarray([0.3], jnp.float32),                      # b2
    )


@pytest.mark.parametrize("use_prior", [True, False])
@pytest.mark.parametrize("n", [128, 150])  # 150: ray-padding path
def test_forward_matches_xla_chain(use_prior, n):
    fp, d, p, k0d, k0p, w1, b1, w2, b2 = make_inputs(2, n, 16)
    if not use_prior:
        p = k0p = None
    out = ray_head_mlp(fp, d, p, k0d, k0p, w1, b1, w2, b2, interpret=True)
    ref = xla_chain(fp, d, p, k0d, k0p, w1, b1, w2, b2)
    assert out.shape == (2, n, 16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2)


@pytest.mark.parametrize("use_prior", [True, False])
def test_grads_within_xla_chain_oracle_distance(use_prior):
    """Every parameter/input grad of the fused kernel must sit at most
    2x as far from the f32 oracle as the XLA bf16 chain does (in
    practice the kernel is closer: its row-sums accumulate in f32 on
    the MXU, the XLA chain's reductions round to bf16)."""
    fp, d, p, k0d, k0p, w1, b1, w2, b2 = make_inputs(2, 150, 16, seed=1)
    if not use_prior:
        p, k0p = None, None

    def loss(fn):
        def inner(args):
            fp_, k0d_, k0p_, w1_, b1_, w2_, b2_ = args
            o = fn(fp_, k0d_, k0p_, w1_, b1_, w2_, b2_)
            return jnp.sum(jnp.sin(o.astype(jnp.float32)))
        return inner

    kern = loss(lambda fp_, k0d_, k0p_, w1_, b1_, w2_, b2_: ray_head_mlp(
        fp_, d, p, k0d_, k0p_ if use_prior else None, w1_, b1_, w2_, b2_,
        interpret=True))
    xla16 = loss(lambda fp_, k0d_, k0p_, w1_, b1_, w2_, b2_: xla_chain(
        fp_, d, p, k0d_, k0p_, w1_, b1_, w2_, b2_))
    xla32 = loss(lambda fp_, k0d_, k0p_, w1_, b1_, w2_, b2_: xla_chain(
        fp_, d, p, k0d_, k0p_, w1_, b1_, w2_, b2_, dt=jnp.float32))

    args = (fp, k0d, k0p if k0p is not None else jnp.zeros((F,)), w1, b1, w2, b2)
    gk = jax.grad(kern)(args)
    gx = jax.grad(xla16)(args)
    go = jax.grad(xla32)(args)
    names = ("fp", "k0d", "k0p", "w1", "b1", "w2", "b2")
    for nm, k, x, o in zip(names, gk, gx, go):
        if nm == "k0p" and not use_prior:
            continue
        o32 = np.asarray(o, np.float32)
        den = float(np.sqrt((o32 ** 2).mean())) + 1e-12
        rk = float(np.sqrt(((np.asarray(k, np.float32) - o32) ** 2).mean())) / den
        rx = float(np.sqrt(((np.asarray(x, np.float32) - o32) ** 2).mean())) / den
        assert rk <= max(2 * rx, 5e-2), (nm, rk, rx)


def test_depth_prior_cotangents_flow():
    """dd/dp are produced (real values, not zeros) so the kernel stays
    correct if a future caller differentiates through the samples."""
    fp, d, p, k0d, k0p, w1, b1, w2, b2 = make_inputs(1, 64, 8, seed=2)

    def f(d_, p_):
        o = ray_head_mlp(fp, d_, p_, k0d, k0p, w1, b1, w2, b2, interpret=True)
        return jnp.sum(o.astype(jnp.float32))

    def f_ref(d_, p_):
        o = xla_chain(fp, d_, p_, k0d, k0p, w1, b1, w2, b2)
        return jnp.sum(o.astype(jnp.float32))

    gd, gp = jax.grad(f, argnums=(0, 1))(d, p)
    rd, rp = jax.grad(f_ref, argnums=(0, 1))(d, p)
    for a, r in ((gd, rd), (gp, rp)):
        a32, r32 = np.asarray(a, np.float32), np.asarray(r, np.float32)
        den = float(np.abs(r32).max()) + 1e-12
        assert float(np.abs(a32 - r32).max()) / den < 0.1
        assert float(np.abs(a32).max()) > 0


def test_factored_head_uses_kernel_equivalently():
    """BinaryMLPNetwork.factored(use_pallas=True) == use_pallas=False
    (interpret mode is forced by monkeypatching the kernel entry)."""
    from implicit_depth_tpu.models.decoders import BinaryMLPNetwork
    from implicit_depth_tpu.ops import ray_head as rh

    rng = np.random.RandomState(3)
    b, n, s = 2, 96, 8
    feats = [jnp.asarray(rng.randn(b, max(n // (i + 1), 1), c), jnp.bfloat16)
             for i, c in enumerate((64, 64, 128, 256))]
    depths = [jnp.asarray(rng.rand(b, f.shape[1], s) * 5, jnp.float32)
              for f in feats]
    priors = [jnp.asarray(rng.rand(b, f.shape[1], s), jnp.float32)
              for f in feats]
    net = BinaryMLPNetwork(dtype=jnp.bfloat16)
    inputs = [jnp.concatenate(
        [depths[i][..., None].astype(jnp.bfloat16),
         jnp.broadcast_to(feats[i][:, :, None, :],
                          depths[i].shape + (feats[i].shape[-1],)),
         priors[i][..., None].astype(jnp.bfloat16)], axis=-1)
        for i in range(4)]
    variables = net.init(jax.random.PRNGKey(0), inputs)

    base = net.apply(variables, feats, depths, priors, False,
                     method=BinaryMLPNetwork.factored)

    orig = rh.ray_head_mlp
    try:
        rh.ray_head_mlp = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        fused = net.apply(variables, feats, depths, priors, True,
                          method=BinaryMLPNetwork.factored)
    finally:
        rh.ray_head_mlp = orig

    for key in base:
        np.testing.assert_allclose(
            np.asarray(base[key], np.float32),
            np.asarray(fused[key], np.float32), atol=3e-2)
