"""Encoder zoo: shapes/finiteness for all image + matching encoders."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from implicit_depth_tpu.models.fpn_matching import FPNMatchingEncoder
from implicit_depth_tpu.models.image_encoders import ResNet18D, TinyEncoder
from implicit_depth_tpu.models.matching import ResnetMatchingEncoder
from implicit_depth_tpu.models.resnets import ResNeXt101_64x4d, SEResNeXtAA101d_32x8d


X = None


def _x():
    global X
    if X is None:
        X = jnp.asarray(np.random.RandomState(0).randn(1, 64, 96, 3), jnp.float32)
    return X


@pytest.mark.parametrize("ctor,channels", [
    (TinyEncoder, (16, 24, 32, 48, 64)),
    (ResNet18D, (64, 64, 128, 256, 512)),
])
def test_image_encoders_light(ctor, channels):
    enc = ctor()
    v = enc.init(jax.random.PRNGKey(0), _x())
    feats = enc.apply(v, _x())
    assert tuple(f.shape[-1] for f in feats) == channels
    strides = [64 // f.shape[1] for f in feats]
    assert strides == [2, 4, 8, 16, 32]
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)


def test_resnext101():
    enc = ResNeXt101_64x4d()
    v = enc.init(jax.random.PRNGKey(0), _x())
    feats = enc.apply(v, _x())
    assert tuple(f.shape[-1] for f in feats) == (64, 256, 512, 1024, 2048)


def test_seresnextaa101d():
    enc = SEResNeXtAA101d_32x8d()
    v = enc.init(jax.random.PRNGKey(0), _x())
    feats = enc.apply(v, _x())
    assert tuple(f.shape[-1] for f in feats) == (128, 256, 512, 1024, 2048)


def test_matching_encoders():
    for enc in (ResnetMatchingEncoder(num_ch_out=16), FPNMatchingEncoder(num_ch_out=16)):
        v = enc.init(jax.random.PRNGKey(0), _x())
        out = enc.apply(v, _x())
        assert out.shape == (1, 16, 24, 16)
        assert np.isfinite(np.asarray(out)).all()
