"""Checkpoint store + torch-weight conversion parity tests."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from implicit_depth_tpu.models.blocks import BasicBlock
from implicit_depth_tpu.models.matching import ResnetMatchingEncoder
from implicit_depth_tpu.train import checkpoint as ckpt


def _torch_basic_block(cin, cout, stride=1):
    """Reference-style norm-free block (modules/layers.py:34-95)."""

    class TB(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=True)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=True)
            self.relu = nn.LeakyReLU(0.2)
            if cin == cout and stride == 1:
                self.downsample = None
            else:
                conv = (nn.Conv2d(cin, cout, 1, 1, bias=True) if stride == 1
                        else nn.Conv2d(cin, cout, 3, stride, 1, bias=True))
                self.downsample = nn.Sequential(conv)

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.conv1(x))
            out = self.conv2(out)
            return self.relu(out + idn)

    return TB()


@pytest.mark.parametrize("cin,cout,stride", [(8, 8, 1), (8, 16, 1), (8, 16, 2)])
def test_basic_block_conversion(cin, cout, stride):
    torch.manual_seed(0)
    tb = _torch_basic_block(cin, cout, stride).eval()
    sd = {f"b.{k}" if not k.startswith("downsample") else f"b.downsample.{k.split('.', 1)[1]}": v
          for k, v in tb.state_dict().items()}
    # normalise names to reference scheme: b.conv1.*, b.conv2.*, b.downsample.0.*
    sd = {}
    for k, v in tb.state_dict().items():
        sd[f"b.{k}"] = v

    params = ckpt.convert_basic_block(sd, "b")
    x = np.random.RandomState(0).randn(2, 10, 12, cin).astype(np.float32)
    ours = BasicBlock(cout, stride).apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_matching_encoder_conversion():
    """Structure-faithful torch twin of ResnetMatchingEncoder
    (modules/networks.py:236-287 with antialiased stem) vs our flax module
    with converted weights."""
    torch.manual_seed(1)

    class BlurPool(nn.Module):
        def __init__(self, ch):
            super().__init__()
            a = torch.tensor([1.0, 3.0, 3.0, 1.0])
            k = torch.outer(a, a)
            k = (k / k.sum()).expand(ch, 1, 4, 4).clone()
            self.register_buffer("filt", k)
            self.ch = ch

        def forward(self, x):
            x = nn.functional.pad(x, (1, 2, 1, 2), mode="reflect")
            return nn.functional.conv2d(x, self.filt, stride=2, groups=self.ch)

    class ResBlock(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.conv1 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(ch)
            self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(ch)

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + x)

    net = nn.Sequential(
        nn.Conv2d(3, 64, 7, 2, 3, bias=False),           # 0 conv1
        nn.BatchNorm2d(64),                               # 1 bn1
        nn.ReLU(),                                        # 2
        nn.Sequential(nn.MaxPool2d(2, 1), BlurPool(64)),  # 3 maxpool
        nn.Sequential(ResBlock(64), ResBlock(64)),        # 4 layer1
        nn.Conv2d(64, 128, 1),                            # 5
        nn.InstanceNorm2d(128),                           # 6
        nn.LeakyReLU(0.2),                                # 7
        nn.Conv2d(128, 16, 3, padding=1, padding_mode="replicate"),  # 8
        nn.InstanceNorm2d(16),                            # 9
    ).eval()
    # randomise BN stats so eval-mode normalisation is non-trivial
    with torch.no_grad():
        for mod in net.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)

    sd = {f"matching_model.net.{k}": v for k, v in net.state_dict().items()}
    converted = ckpt.convert_matching_encoder(sd)
    params, stats = ckpt.split_bn(converted)

    x = np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32)
    ours = ResnetMatchingEncoder(num_ch_out=16).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=1e-3)


def test_state_save_restore_and_lazy_load(tmp_path):
    from implicit_depth_tpu.train import state as state_lib

    params = {"a": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros((4,))},
              "b": {"kernel": jnp.full((2, 2), 2.0)}}
    tx = state_lib.make_optimizer()
    state = state_lib.create_train_state({"params": params}, tx)
    state = state.replace(step=jnp.asarray(7))

    path = str(tmp_path / "ck")
    ckpt.save_state(path, state, config={"lr": 1e-4}, metrics={"loss": 0.5})
    meta = ckpt.load_meta(path)
    assert meta["config"]["lr"] == 1e-4

    fresh = state_lib.create_train_state(
        {"params": jax.tree.map(jnp.zeros_like, params)}, tx
    )
    restored = ckpt.restore_state(path, fresh)
    assert int(restored.step) == 7
    np.testing.assert_allclose(restored.params["b"]["kernel"], 2.0)

    # lazy load: only matching names/shapes copied
    target = {"a": {"kernel": jnp.zeros((3, 4)), "bias": jnp.zeros((4,))},
              "b": {"kernel": jnp.zeros((5, 5))},  # shape mismatch -> skip
              "c": {"kernel": jnp.zeros((1,))}}
    merged, n = ckpt.lazy_load_params(params, target)
    assert n == 2
    np.testing.assert_allclose(merged["a"]["kernel"], 1.0)
    np.testing.assert_allclose(merged["b"]["kernel"], 0.0)


def test_checkpoint_manager_topk(tmp_path):
    from implicit_depth_tpu.train import state as state_lib

    tx = state_lib.make_optimizer()
    state = state_lib.create_train_state({"params": {"w": jnp.zeros((2,))}}, tx)
    mgr = ckpt.CheckpointManager(str(tmp_path), monitor="iou", mode="max", save_top_k=2)
    import os
    for step, iou in enumerate([0.1, 0.5, 0.3, 0.7]):
        state = state.replace(step=jnp.asarray(step))
        mgr.save(state, metrics={"iou": iou})
    kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("ckpt_"))
    assert len(kept) == 2  # 0.5 and 0.7 survive
    assert mgr.best_path().endswith("ckpt_00000003")
    assert os.path.exists(str(tmp_path / "last"))


def test_async_checkpoint_roundtrip(tmp_path):
    """async_write serialises on a background thread; wait() joins and the
    restored state matches."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from implicit_depth_tpu.train import checkpoint as ckpt_lib
    from implicit_depth_tpu.train import state as state_lib

    params = {"w": jnp.arange(12.0).reshape(3, 4)}
    tx = optax.sgd(1e-2)
    state = state_lib.create_train_state({"params": params}, tx)
    mgr = ckpt_lib.CheckpointManager(str(tmp_path), monitor="m", mode="max",
                                     async_write=True)
    path = mgr.save(state, metrics={"m": 1.0})
    mgr.wait()
    restored = ckpt_lib.restore_state(path, state)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
    assert mgr.best_path() == path
