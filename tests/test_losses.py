"""Loss-function parity vs torch derivations."""

import numpy as np
import torch
import jax.numpy as jnp

from implicit_depth_tpu.train import losses as L


def test_bce_with_logits_pos_weight_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(100).astype(np.float32) * 3
    target = (rng.rand(100) > 0.5).astype(np.float32)
    for pw in (1.0, 2.5):
        ours = np.asarray(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(target), pw))
        ref = torch.nn.BCEWithLogitsLoss(reduction="none", pos_weight=torch.tensor(pw))(
            torch.from_numpy(logits), torch.from_numpy(target)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_binary_losses_structure():
    rng = np.random.RandomState(1)
    b, n, s = 2, 16, 8
    query = jnp.asarray(rng.uniform(0.5, 5.0, (b, n, s)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0.5, 5.0, (b, n, 1)), jnp.float32)
    preds = {f"pred_{i}": jnp.asarray(rng.randn(b, -(-n // (i + 1)), s), jnp.float32)
             for i in range(4)}
    out = L.binary_losses(query, gt, preds, pos_weight=1.0, regularisation_weight=0.5)
    assert set(out) >= {"binary_loss", "loss", "binary_loss/0", "reg_loss/3"}
    # total = mean over scales of (bce + 0.5*reg)
    manual = np.mean([float(out[f"binary_loss/{i}"]) + 0.5 * float(out[f"reg_loss/{i}"])
                      for i in range(4)])
    np.testing.assert_allclose(float(out["binary_loss"]), manual, rtol=1e-6)


def test_scale_invariant_loss_matches_formula():
    rng = np.random.RandomState(2)
    log_gt = rng.randn(50).astype(np.float32)
    log_pred = log_gt + rng.randn(50).astype(np.float32) * 0.1
    mask = np.ones(50, bool)
    ours = float(L.scale_invariant_loss(jnp.asarray(log_gt), jnp.asarray(log_pred), jnp.asarray(mask)))
    diff = log_gt - log_pred
    ref = np.sqrt((diff ** 2).mean() - 0.85 * diff.mean() ** 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_normals_loss_range_and_masking():
    rng = np.random.RandomState(3)
    n = rng.randn(1, 8, 8, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    same = float(L.normals_loss(jnp.asarray(n), jnp.asarray(n)))
    np.testing.assert_allclose(same, 0.0, atol=1e-6)
    flipped = float(L.normals_loss(jnp.asarray(n), jnp.asarray(-n)))
    np.testing.assert_allclose(flipped, 1.0, atol=1e-6)
    # NaN entries are masked out
    n2 = n.copy()
    n2[0, 0, 0] = np.nan
    assert np.isfinite(float(L.normals_loss(jnp.asarray(n2), jnp.asarray(n))))


def test_mv_depth_loss_zero_for_consistent_views():
    """Identical cameras + identical depth => projected depth equals the
    sampled source depth => log-L1 of 0."""
    h, w = 16, 20
    depth = np.full((1, h, w, 1), 2.0, np.float32)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 15.0
    K[0, 2], K[1, 2] = w / 2, h / 2
    invK = np.linalg.inv(K)
    loss = float(L.mv_depth_loss(
        jnp.asarray(depth),
        jnp.asarray(depth[None]),                 # 1 source view, same depth
        jnp.asarray(invK[None]),
        jnp.asarray(K[None, None]),
        jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        jnp.asarray(np.eye(4, dtype=np.float32)[None, None]),
    ))
    np.testing.assert_allclose(loss, 0.0, atol=1e-5)


def test_ms_gradient_loss_zero_for_identical():
    rng = np.random.RandomState(4)
    d = jnp.asarray(rng.uniform(1, 4, (1, 32, 32, 1)), jnp.float32)
    np.testing.assert_allclose(float(L.ms_gradient_loss(d, d)), 0.0, atol=1e-6)
    d2 = d + 0.5 * jnp.sin(jnp.arange(32)[None, :, None, None] / 3.0)
    assert float(L.ms_gradient_loss(d, d2)) > 0.01
