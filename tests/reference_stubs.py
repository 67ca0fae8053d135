"""Makes the ACTUAL reference code at /root/reference importable.

The reference depends on kornia / torchvision / timm / antialiased_cnns /
pytorch3d, none of which are installed. This module installs minimal,
semantics-faithful stubs for exactly the call surface the imported
reference modules use, so golden parity tests run against the reference's
own cost-volume / network / loss code rather than re-written twins.

Stub fidelity notes (each mirrors the upstream library's documented
behaviour for the specific call the reference makes):
- kornia.filters.spatial_gradient: sobel 3x3, |k|-normalised (/8),
  replicate padding, output (B, C, 2, H, W) with x-gradient first.
- kornia.filters.gaussian_blur2d: separable gaussian, reflect padding.
- kornia.filters.blur_pool2d(x, 3): pascal [1,2,1] outer /16, reflect
  pad 1, stride 2 (used by generic_utils.pyrdown).
- antialiased_cnns.resnet18: only the stem consumed by
  ResnetMatchingEncoder (modules/networks.py:250-272): conv7x7/2, bn,
  relu, [MaxPool2d(2, stride=1) -> BlurPool(filt4, reflect, stride=2)],
  layer1 of two standard BasicBlocks.
- torchvision / timm: import-time placeholders (paths not exercised).

Requires PYTORCH_JIT=0 (set in conftest.py) so the reference's
jit.ScriptModules script-compile as plain modules.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def install() -> None:
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "kornia" in sys.modules:
        return

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    # ---- pytorch_lightning ----------------------------------------------
    # only the surface BDModel/DepthModel touch at construction + forward:
    # LightningModule as a plain nn.Module, save_hyperparameters/log no-ops.
    pl = types.ModuleType("pytorch_lightning")

    class LightningModule(nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

    pl.LightningModule = LightningModule
    pl.seed_everything = lambda *a, **k: None
    sys.modules["pytorch_lightning"] = pl

    # ---- moviepy (only imported for video export, never exercised) ----
    moviepy = types.ModuleType("moviepy")
    editor = types.ModuleType("moviepy.editor")

    class _NoMoviepy:
        def __init__(self, *a, **k):
            raise RuntimeError("moviepy unavailable in this test env")

    editor.ImageSequenceClip = _NoMoviepy
    moviepy.editor = editor
    sys.modules["moviepy"] = moviepy
    sys.modules["moviepy.editor"] = editor

    # ---- kornia.filters ------------------------------------------------
    kornia = types.ModuleType("kornia")
    kfilters = types.ModuleType("kornia.filters")

    def spatial_gradient(x, mode="sobel", order=1, normalized=True):
        assert mode == "sobel" and order == 1
        kx = torch.tensor(
            [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]],
            dtype=x.dtype, device=x.device,
        )
        ky = kx.t().contiguous()
        if normalized:
            kx = kx / 8.0
            ky = ky / 8.0
        b, c, h, w = x.shape
        xp = F.pad(x.reshape(b * c, 1, h, w), (1, 1, 1, 1), mode="replicate")
        gx = F.conv2d(xp, kx[None, None])
        gy = F.conv2d(xp, ky[None, None])
        return torch.cat([gx, gy], dim=1).reshape(b, c, 2, h, w)

    def gaussian_blur2d(x, kernel_size, sigma, border_type="reflect"):
        ky_n, kx_n = kernel_size
        sy, sx = sigma

        def g1(k, s):
            ax = torch.arange(k, dtype=x.dtype, device=x.device) - (k - 1) / 2
            w = torch.exp(-(ax ** 2) / (2.0 * float(s) ** 2))
            return w / w.sum()

        k2 = torch.outer(g1(ky_n, sy), g1(kx_n, sx))
        c = x.shape[1]
        xp = F.pad(x, (kx_n // 2, kx_n // 2, ky_n // 2, ky_n // 2), mode=border_type)
        return F.conv2d(xp, k2[None, None].expand(c, 1, ky_n, kx_n), groups=c)

    def blur_pool2d(x, kernel_size, stride=2):
        assert kernel_size == 3
        a = torch.tensor([1.0, 2.0, 1.0], dtype=x.dtype, device=x.device)
        k2 = torch.outer(a, a)
        k2 = k2 / k2.sum()
        c = x.shape[1]
        xp = F.pad(x, (1, 1, 1, 1), mode="reflect")
        return F.conv2d(xp, k2[None, None].expand(c, 1, 3, 3), groups=c, stride=stride)

    def sobel(x, normalized=True, eps=1e-6):
        g = spatial_gradient(x, normalized=normalized)
        gx, gy = g[:, :, 0], g[:, :, 1]
        return torch.sqrt(gx * gx + gy * gy + eps)

    kfilters.sobel = sobel
    kfilters.spatial_gradient = spatial_gradient
    kfilters.gaussian_blur2d = gaussian_blur2d
    kfilters.blur_pool2d = blur_pool2d
    kornia.filters = kfilters
    sys.modules["kornia"] = kornia
    sys.modules["kornia.filters"] = kfilters

    # ---- torchvision ----------------------------------------------------
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_tf = types.ModuleType("torchvision.transforms.functional")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision unavailable in this test env")

    tv_ops.FeaturePyramidNetwork = _Unavailable
    tv.models = tv_models
    tv.ops = tv_ops
    tv.transforms = tv_tr
    tv_tr.functional = tv_tf
    sys.modules.update({
        "torchvision": tv,
        "torchvision.models": tv_models,
        "torchvision.ops": tv_ops,
        "torchvision.transforms": tv_tr,
        "torchvision.transforms.functional": tv_tf,
    })

    # ---- timm ------------------------------------------------------------
    timm = types.ModuleType("timm")

    def create_model(*a, **k):
        raise RuntimeError("timm unavailable in this test env")

    timm.create_model = create_model
    sys.modules["timm"] = timm

    # ---- antialiased_cnns -------------------------------------------------
    aa = types.ModuleType("antialiased_cnns")

    class BlurPool(nn.Module):
        def __init__(self, ch, filt_size=4, stride=2):
            super().__init__()
            assert filt_size == 4
            a = torch.tensor([1.0, 3.0, 3.0, 1.0])
            k = torch.outer(a, a)
            self.register_buffer("filt", (k / k.sum()).expand(ch, 1, 4, 4).clone())
            self.ch = ch
            self.stride = stride

        def forward(self, x):
            x = F.pad(x, (1, 2, 1, 2), mode="reflect")
            return F.conv2d(x, self.filt, stride=self.stride, groups=self.ch)

    class _BasicBlock(nn.Module):
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

    def resnet18(pretrained=False, **kw):
        m = types.SimpleNamespace()
        m.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        m.bn1 = nn.BatchNorm2d(64)
        m.relu = nn.ReLU(inplace=True)
        m.maxpool = nn.Sequential(nn.MaxPool2d(kernel_size=2, stride=1), BlurPool(64))
        m.layer1 = nn.Sequential(_BasicBlock(64), _BasicBlock(64))
        return m

    def _unavailable_resnet(*a, **k):
        raise RuntimeError("only resnet18 is stubbed")

    aa.BlurPool = BlurPool
    aa.resnet18 = resnet18
    aa.resnet34 = aa.resnet50 = aa.resnet101 = aa.resnet152 = _unavailable_resnet
    sys.modules["antialiased_cnns"] = aa
