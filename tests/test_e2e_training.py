"""End-to-end learning smoke: tiny BDNet on the synthetic dataset.

Validates the full path data -> warp/volume -> decoder -> ray head ->
loss -> optimizer actually learns (the reference has no equivalent;
SURVEY.md §4 gap)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from implicit_depth_tpu.data.mvs_dataset import BDSamplingConfig, collate
from implicit_depth_tpu.data.synthetic import SyntheticDataset
from implicit_depth_tpu.models.bd_net import BDNet
from implicit_depth_tpu.train import state as state_lib

pytestmark = pytest.mark.slow


def test_bd_training_reduces_loss():
    bd_cfg = BDSamplingConfig(num_rays=256, samples_per_ray=16)
    ds = SyntheticDataset(num_frames=14, num_views=3, split="train",
                          get_bd_info=True, bd_config=bd_cfg)
    net = BDNet(image_encoder_name="tiny", num_src_views=2, num_depth_bins=16,
                min_matching_depth=0.5, max_matching_depth=5.0)
    cur, src = collate([ds[i] for i in range(2)])
    cur = {k: jnp.asarray(v) for k, v in cur.items()}
    src = {k: jnp.asarray(v) for k, v in src.items()}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src)
    tx = state_lib.make_optimizer(5e-4, 1e-4, (400, 600))
    state = state_lib.create_train_state(variables, tx)
    step = jax.jit(state_lib.make_bd_train_step(net))

    losses = []
    for i in range(40):
        idx = np.random.RandomState(i).choice(len(ds), 2, replace=False)
        cur, src = collate([ds[j] for j in idx])
        cur = {k: jnp.asarray(v) for k, v in cur.items()}
        src = {k: jnp.asarray(v) for k, v in src.items()}
        state, l = step(state, (cur, src), jax.random.PRNGKey(i))
        losses.append(float(l["binary_loss/0"]))

    first, last = np.mean(losses[:8]), np.mean(losses[-8:])
    assert np.isfinite(losses).all()
    assert last < first * 0.9, (first, last)
