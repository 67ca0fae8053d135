"""timm backbone conversion: torch twins of `tf_efficientnetv2_s` and
`resnet18d` (features_only) vs our flax encoders through the converter
tables in train/checkpoint.py.

timm itself is not installable in this offline environment; the twins
below replicate timm's graph layout and state_dict NAMES exactly (verified
against timm 0.x efficientnet.py / resnet.py sources), including TF SAME
padding for the tf_ variant, BN eps 1e-3, SiLU, SE-on-block-input
reduction, and the '-d' deep stem + avg-pool downsample. When real
released checkpoints become obtainable, these same converter tables load
them (reference: experiment_modules/bd_model.py:46-68).
"""

import pytest
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from implicit_depth_tpu.models.image_encoders import EfficientNetV2S, ResNet18D
from implicit_depth_tpu.train import checkpoint as ckpt

pytestmark = pytest.mark.slow


def _pad_same(x, k, s):
    """TF SAME padding (timm Conv2dSame semantics)."""
    ih, iw = x.shape[-2:]
    ph = max((-(-ih // s) - 1) * s + k - ih, 0)
    pw = max((-(-iw // s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class Conv2dSame(nn.Conv2d):
    def forward(self, x):
        x = _pad_same(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _bn(ch):
    return nn.BatchNorm2d(ch, eps=1e-3)


class ConvBnAct(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv = Conv2dSame(cin, cout, 3, stride, bias=False)
        self.bn1 = _bn(cout)
        self.has_skip = cin == cout and stride == 1

    def forward(self, x):
        out = F.silu(self.bn1(self.conv(x)))
        return out + x if self.has_skip else out


class EdgeResidual(nn.Module):
    def __init__(self, cin, cout, exp_ratio, stride=1):
        super().__init__()
        mid = cin * exp_ratio
        self.conv_exp = Conv2dSame(cin, mid, 3, stride, bias=False)
        self.bn1 = _bn(mid)
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn2 = _bn(cout)
        self.has_skip = cin == cout and stride == 1

    def forward(self, x):
        out = F.silu(self.bn1(self.conv_exp(x)))
        out = self.bn2(self.conv_pwl(out))
        return out + x if self.has_skip else out


class SqueezeExcite(nn.Module):
    def __init__(self, mid, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(mid, rd, 1)
        self.conv_expand = nn.Conv2d(rd, mid, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class InvertedResidual(nn.Module):
    def __init__(self, cin, cout, exp_ratio, stride=1, se_ratio=0.25):
        super().__init__()
        mid = cin * exp_ratio
        self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = _bn(mid)
        self.conv_dw = Conv2dSame(mid, mid, 3, stride, groups=mid, bias=False)
        self.bn2 = _bn(mid)
        self.se = SqueezeExcite(mid, max(1, int(cin * se_ratio)))
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = _bn(cout)
        self.has_skip = cin == cout and stride == 1

    def forward(self, x):
        out = F.silu(self.bn1(self.conv_pw(x)))
        out = F.silu(self.bn2(self.conv_dw(out)))
        out = self.se(out)
        out = self.bn3(self.conv_pwl(out))
        return out + x if self.has_skip else out


class EffNetV2STwin(nn.Module):
    """timm tf_efficientnetv2_s features_only layout + names."""

    def __init__(self):
        super().__init__()
        self.conv_stem = Conv2dSame(3, 24, 3, 2, bias=False)
        self.bn1 = _bn(24)
        stages = []
        # (kind, reps, cin, cout, exp, stride-of-first)
        spec = [("cn", 2, 24, 24, 1, 1), ("er", 4, 24, 48, 4, 2),
                ("er", 4, 48, 64, 4, 2), ("ir", 6, 64, 128, 4, 2),
                ("ir", 9, 128, 160, 6, 1), ("ir", 15, 160, 256, 6, 2)]
        for kind, reps, cin, cout, exp, s0 in spec:
            blocks = []
            for i in range(reps):
                ci = cin if i == 0 else cout
                s = s0 if i == 0 else 1
                if kind == "cn":
                    blocks.append(ConvBnAct(ci, cout, s))
                elif kind == "er":
                    blocks.append(EdgeResidual(ci, cout, exp, s))
                else:
                    blocks.append(InvertedResidual(ci, cout, exp, s))
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)

    def forward(self, x):
        x = F.silu(self.bn1(self.conv_stem(x)))
        feats = []
        for si, stage in enumerate(self.blocks):
            x = stage(x)
            if si in (0, 1, 2, 4, 5):
                feats.append(x)
        return feats


class ResNet18DTwin(nn.Module):
    """timm resnet18d features_only layout + names."""

    class Block(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.AvgPool2d(2, 2, ceil_mode=True, count_include_pad=False),
                    nn.Conv2d(cin, cout, 1, bias=False),
                    nn.BatchNorm2d(cout),
                )
            else:
                self.downsample = None

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            sc = x if self.downsample is None else self.downsample(x)
            return torch.relu(out + sc)

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, 32, 3, 2, 1, bias=False), nn.BatchNorm2d(32), nn.ReLU(True),
            nn.Conv2d(32, 32, 3, 1, 1, bias=False), nn.BatchNorm2d(32), nn.ReLU(True),
            nn.Conv2d(32, 64, 3, 1, 1, bias=False),
        )
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        B = ResNet18DTwin.Block
        self.layer1 = nn.Sequential(B(64, 64), B(64, 64))
        self.layer2 = nn.Sequential(B(64, 128, 2), B(128, 128))
        self.layer3 = nn.Sequential(B(128, 256, 2), B(256, 256))
        self.layer4 = nn.Sequential(B(256, 512, 2), B(512, 512))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        feats = [x]
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            feats.append(x)
        return feats


def _randomise_bn(model):
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.7, 1.3)
                mod.weight.uniform_(0.8, 1.2)
                mod.bias.uniform_(-0.1, 0.1)


def test_efficientnetv2s_conversion():
    torch.manual_seed(10)
    twin = EffNetV2STwin().eval()
    _randomise_bn(twin)

    sd = {f"encoder.{k}": v for k, v in twin.state_dict().items()}
    params, stats = ckpt.split_bn(ckpt.convert_efficientnetv2s(sd))

    # odd spatial dims exercise the TF SAME asymmetric-padding corner
    x = np.random.RandomState(10).randn(1, 66, 98, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = EfficientNetV2S().apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x))
    assert len(ours) == len(ref) == 5
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), r.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=1e-2)


def test_resnet18d_conversion():
    torch.manual_seed(11)
    twin = ResNet18DTwin().eval()
    _randomise_bn(twin)

    sd = {f"encoder.{k}": v for k, v in twin.state_dict().items()}
    params, stats = ckpt.split_bn(ckpt.convert_resnet18d(sd))

    x = np.random.RandomState(11).randn(1, 64, 96, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = ResNet18D().apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    assert len(ours) == len(ref) == 5
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), r.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-3, rtol=1e-2)


def test_bd_checkpoint_converts_complete_tree():
    """convert_reference_bd_checkpoint yields a params/batch_stats tree
    that EXACTLY covers the flagship BDNet's init tree (zero missing, zero
    extra leaves, matching shapes) — the VERDICT r1 acceptance."""
    from flax import traverse_util
    from tests import reference_stubs

    reference_stubs.install()
    from modules.cost_volume import FeatureVolumeManager
    from modules.networks import BDDecoderPP, BinaryMLPNetwork, CVEncoder, ResnetMatchingEncoder

    from implicit_depth_tpu.models.bd_net import BDNet
    from implicit_depth_tpu.utils.fixtures import synthetic_bd_batch

    torch.manual_seed(12)
    # assemble a reference-shaped state_dict from the reference's own
    # modules (real code) + the timm encoder twin
    sd = {}
    sd.update({f"encoder.{k}": v for k, v in EffNetV2STwin().state_dict().items()})
    sd.update({f"matching_model.{k}": v
               for k, v in ResnetMatchingEncoder(18, 16, pretrained=False).state_dict().items()})
    sd.update({f"cost_volume.{k}": v
               for k, v in FeatureVolumeManager(96, 128).state_dict().items()})
    sd.update({f"cost_volume_net.{k}": v
               for k, v in CVEncoder(64, [48, 64, 160, 256], [64, 128, 256, 384]).state_dict().items()})
    sd.update({f"depth_decoder.{k}": v
               for k, v in BDDecoderPP([24, 64, 128, 256, 384]).state_dict().items()})
    sd.update({f"binary_mlp.{k}": v
               for k, v in BinaryMLPNetwork([64, 64, 128, 256]).state_dict().items()})

    params, stats = ckpt.convert_reference_bd_checkpoint(sd)

    # train-mode init reaches all four binary-MLP scales (forward_val only
    # initialises scale 0)
    net = BDNet(compute_dtype=jnp.float32, train_bn=True)
    cur, src = synthetic_bd_batch(batch=1, with_train_keys=True)
    cur = jax.tree.map(jnp.asarray, cur)
    src = jax.tree.map(jnp.asarray, src)
    shapes = jax.eval_shape(
        lambda c, s: net.init(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}, c, s),
        cur, src)

    want_p = {k: v.shape for k, v in
              traverse_util.flatten_dict(shapes["params"], sep="/").items()}
    got_p = {k: np.shape(v) for k, v in
             traverse_util.flatten_dict(params, sep="/").items()}
    missing = sorted(set(want_p) - set(got_p))
    extra = sorted(set(got_p) - set(want_p))
    assert not missing, f"missing params: {missing[:10]} (+{len(missing)} total)"
    assert not extra, f"extra params: {extra[:10]}"
    mismatched = [k for k in want_p if want_p[k] != got_p[k]]
    assert not mismatched, f"shape mismatches: {[(k, want_p[k], got_p[k]) for k in mismatched[:5]]}"

    want_s = {k: v.shape for k, v in
              traverse_util.flatten_dict(shapes["batch_stats"], sep="/").items()}
    got_s = {k: np.shape(v) for k, v in
             traverse_util.flatten_dict(stats, sep="/").items()}
    assert set(want_s) == set(got_s), (
        f"batch_stats mismatch: missing {sorted(set(want_s) - set(got_s))[:5]}, "
        f"extra {sorted(set(got_s) - set(want_s))[:5]}")
