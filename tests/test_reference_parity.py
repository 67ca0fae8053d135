"""Golden parity tests against the ACTUAL reference code at /root/reference.

These import the reference's own modules (via tests/reference_stubs.py) and
compare on seeded random inputs — closing the "twin can share its author's
misreading" hole (grid_sample parity is load-bearing, SURVEY §7.3):

- geometry: BackprojectDepth / Project3D / pose_distance / depth planes
- cost volumes: CostVolumeManager (per-plane loop), EfficientCostVolumeManager
  (vectorised dot), FeatureVolumeManager + FastFeatureVolumeManager
  (metadata MLP volume) with weights through convert_volume_mlp
- networks: CVEncoder, BDDecoderPP, BinaryMLPNetwork, ResnetMatchingEncoder
  through their converters
- losses: ScaleInvariantLoss, MSGradientLoss, NormalsLoss/NormalGenerator
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import reference_stubs

reference_stubs.install()

from implicit_depth_tpu.core import geometry
from implicit_depth_tpu.train import checkpoint as ckpt
from implicit_depth_tpu.volumes import cost_volume as cv

torch.manual_seed(0)


# --------------------------------------------------------------------- #
# shared fixtures
# --------------------------------------------------------------------- #

def _camera_setup(seed=0, b=2, k=3, h=24, w=32, c=8, d=8):
    """Random-but-valid multi-view rig in numpy."""
    rng = np.random.RandomState(seed)
    cur_feats = rng.randn(b, h, w, c).astype(np.float32)
    src_feats = rng.randn(b, k, h, w, c).astype(np.float32)

    K = np.zeros((b, k, 4, 4), np.float32)
    invK = np.zeros((b, 4, 4), np.float32)
    src_T_cur = np.zeros((b, k, 4, 4), np.float32)
    for bi in range(b):
        Km = np.eye(4)
        Km[0, 0], Km[1, 1] = w / 2.2, h / 2.2
        Km[0, 2], Km[1, 2] = w / 2, h / 2
        invK[bi] = np.linalg.inv(Km).astype(np.float32)
        for ki in range(k):
            ang = 0.05 * (ki + 1) + 0.02 * rng.randn()
            R4 = np.eye(4)
            R4[:3, :3] = geometry.rotz(ang) @ geometry.roty(0.03 * rng.randn())
            R4[:3, 3] = [0.15 * (ki + 1) * rng.choice([-1, 1]), 0.05 * rng.randn(), 0.04 * rng.randn()]
            src_T_cur[bi, ki] = R4.astype(np.float32)
            K[bi, ki] = Km.astype(np.float32)
    cur_T_src = np.linalg.inv(src_T_cur.astype(np.float64)).astype(np.float32)
    return dict(cur_feats=cur_feats, src_feats=src_feats, K=K, invK=invK,
                src_T_cur=src_T_cur, cur_T_src=cur_T_src, b=b, k=k, h=h, w=w, c=c, d=d)


def _ref_volume_args(s):
    """Torch NCHW views of the setup for the reference managers."""
    t = torch.from_numpy
    return dict(
        cur_feats=t(s["cur_feats"].transpose(0, 3, 1, 2)),
        src_feats=t(s["src_feats"].transpose(0, 1, 4, 2, 3)),
        src_extrinsics=t(s["src_T_cur"]),
        src_poses=t(s["cur_T_src"]),
        src_Ks=t(s["K"]),
        cur_invK=t(s["invK"]),
        min_depth=torch.full((s["b"], 1, 1, 1), 0.25),
        max_depth=torch.full((s["b"], 1, 1, 1), 5.0),
    )


def _our_warped_views(s):
    planes = geometry.log_depth_planes(0.25, 5.0, s["d"])
    return cv.build_warped_views(
        jnp.asarray(s["cur_feats"]), jnp.asarray(s["src_feats"]),
        jnp.asarray(s["K"]), jnp.asarray(s["src_T_cur"]),
        jnp.asarray(s["invK"]), jnp.asarray(s["cur_T_src"]),
        planes,
    )


# --------------------------------------------------------------------- #
# geometry
# --------------------------------------------------------------------- #

def test_golden_backproject_project():
    from utils.geometry_utils import BackprojectDepth, Project3D

    rng = np.random.RandomState(1)
    b, h, w = 2, 12, 16
    depth = (rng.rand(b, h, w).astype(np.float32) * 4 + 0.3)
    invK = np.stack([np.linalg.inv(np.diag([7.0, 5.0, 1.0, 1.0]) + 0.1 * np.eye(4))
                     for _ in range(b)]).astype(np.float32)

    ref = BackprojectDepth(h, w)(torch.from_numpy(depth[:, None]),
                                 torch.from_numpy(invK)).numpy()  # (b, 4, N)
    ours = geometry.backproject_depth(jnp.asarray(depth), jnp.asarray(invK))  # (b,h,w,4)
    ours_b4N = np.asarray(ours).reshape(b, h * w, 4).transpose(0, 2, 1)
    np.testing.assert_allclose(ours_b4N, ref, atol=1e-5, rtol=1e-5)

    # project the backprojected points through a random cam
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = geometry.rotz(0.1).astype(np.float32)
    T[:3, 3] = [0.2, -0.1, 0.3]
    T = np.broadcast_to(T, (b, 4, 4)).copy()
    K = np.stack([np.diag([7.0, 5.0, 1.0, 1.0]) for _ in range(b)]).astype(np.float32)

    ref_uvz = Project3D()(torch.from_numpy(ref), torch.from_numpy(K),
                          torch.from_numpy(T)).numpy()  # (b, 3, N)
    ours_uvz = geometry.project_points(
        jnp.asarray(ours).reshape(b, h * w, 4), jnp.asarray(K), jnp.asarray(T))
    np.testing.assert_allclose(
        np.asarray(ours_uvz).transpose(0, 2, 1), ref_uvz, atol=1e-4, rtol=1e-4)


def test_golden_pose_distance():
    from utils.geometry_utils import pose_distance

    rng = np.random.RandomState(2)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = (geometry.rotz(0.3) @ geometry.roty(-0.2)).astype(np.float32)
    T[:3, 3] = rng.randn(3).astype(np.float32)
    ref = pose_distance(torch.from_numpy(T[None]))
    ours = geometry.pose_distance(jnp.asarray(T))
    for r, o in zip(ref, ours):
        np.testing.assert_allclose(np.asarray(o), r.numpy()[0], atol=1e-5, rtol=1e-5)


def test_golden_depth_planes():
    from modules.cost_volume import CostVolumeManager

    mgr = CostVolumeManager(8, 8, num_depth_bins=16)
    ref = mgr.generate_depth_planes(1, torch.full((1, 1, 1, 1), 0.25),
                                    torch.full((1, 1, 1, 1), 5.0))
    ours = geometry.log_depth_planes(0.25, 5.0, 16)
    np.testing.assert_allclose(np.asarray(ours), ref[0, :, 0, 0].numpy(), atol=1e-6)


# --------------------------------------------------------------------- #
# cost volumes (grid_sample parity is load-bearing here)
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("manager", ["CostVolumeManager", "EfficientCostVolumeManager"])
def test_golden_dot_cost_volume(manager):
    import modules.cost_volume as ref_cv

    s = _camera_setup()
    mgr = getattr(ref_cv, manager)(s["h"], s["w"], num_depth_bins=s["d"])
    with torch.no_grad():
        ref_vol, ref_lowest, _, _ = mgr(**_ref_volume_args(s))

    wv = _our_warped_views(s)
    ours = cv.dot_cost_volume(wv)
    np.testing.assert_allclose(np.asarray(ours), ref_vol.numpy(), atol=2e-4, rtol=1e-3)

    lowest = cv.lowest_cost_depth(ours, wv.depth_planes)
    np.testing.assert_allclose(np.asarray(lowest), ref_lowest.numpy(), atol=1e-5)


@pytest.mark.parametrize("manager", ["FeatureVolumeManager", "FastFeatureVolumeManager"])
def test_golden_metadata_feature_volume(manager):
    import modules.cost_volume as ref_cv
    from implicit_depth_tpu.models.volume_mlp import MetadataVolumeMLP

    s = _camera_setup(seed=5)
    mgr = getattr(ref_cv, manager)(
        s["h"], s["w"], num_depth_bins=s["d"],
        matching_dim_size=s["c"], num_source_views=s["k"],
    )
    with torch.no_grad():
        for p in mgr.parameters():  # non-trivial weights
            p.uniform_(-0.3, 0.3)
        ref_vol, _, _, _ = mgr(**_ref_volume_args(s))

    sd = {f"cost_volume.{k}": v for k, v in mgr.state_dict().items()}
    params = ckpt.convert_volume_mlp(sd)
    wv = _our_warped_views(s)
    ours = MetadataVolumeMLP(num_src_views=s["k"], matching_dim=s["c"]).apply(
        {"params": params}, wv, jnp.asarray(s["cur_feats"]))
    np.testing.assert_allclose(np.asarray(ours), ref_vol.numpy(), atol=5e-4, rtol=1e-3)


# --------------------------------------------------------------------- #
# networks through the converters
# --------------------------------------------------------------------- #

def test_golden_cv_encoder():
    from modules.networks import CVEncoder
    from implicit_depth_tpu.models.decoders import CVEncoder as OurCVEncoder

    torch.manual_seed(3)
    num_ch_outs = [8, 12, 16, 20]
    num_ch_enc = [6, 7, 9, 11]
    ref = CVEncoder(num_ch_cv=10, num_ch_enc=num_ch_enc, num_ch_outs=num_ch_outs).eval()

    rng = np.random.RandomState(3)
    h, w = 16, 24
    x = rng.randn(1, h, w, 10).astype(np.float32)
    feats = [rng.randn(1, h // 2 ** i, w // 2 ** i, num_ch_enc[i]).astype(np.float32)
             for i in range(4)]

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])

    sd = {f"cost_volume_net.{k}": v for k, v in ref.state_dict().items()}
    params = ckpt.convert_cv_encoder(sd)
    ours = OurCVEncoder(num_ch_outs=tuple(num_ch_outs)).apply(
        {"params": params}, jnp.asarray(x), [jnp.asarray(f) for f in feats])

    for o, r in zip(ours, ref_out):
        np.testing.assert_allclose(np.asarray(o), r.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-4, rtol=1e-3)


def test_golden_bd_decoder_pp():
    from modules.networks import BDDecoderPP
    from implicit_depth_tpu.models.decoders import DecoderPP

    torch.manual_seed(4)
    num_ch_enc = [4, 6, 8, 10, 12]
    ref = BDDecoderPP(num_ch_enc).eval()

    rng = np.random.RandomState(4)
    base = 32
    feats = [rng.randn(1, base // 2 ** i, base // 2 ** i, num_ch_enc[i]).astype(np.float32)
             for i in range(5)]
    with torch.no_grad():
        ref_out = ref([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])

    sd = {f"depth_decoder.{k}": v for k, v in ref.state_dict().items()}
    params = ckpt.convert_decoder_pp(sd, "depth_decoder.convs", heads=False)
    ours = DecoderPP(head_channels=0).apply(
        {"params": params}, [jnp.asarray(f) for f in feats])

    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(ours[i]),
            ref_out[f"feature_s{i}_b1hw"].numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3,
        )


def test_golden_binary_mlp():
    from modules.networks import BinaryMLPNetwork
    from implicit_depth_tpu.models.decoders import BinaryMLPNetwork as OurBinaryMLP

    torch.manual_seed(5)
    num_ch_dec = [64, 64, 128, 256]
    ref = BinaryMLPNetwork(num_ch_dec, mlp_size=128, use_prior=False).eval()

    rng = np.random.RandomState(5)
    inputs = [rng.randn(2, 17, num_ch_dec[s] + 1).astype(np.float32) for s in range(4)]
    with torch.no_grad():
        ref_out = ref([torch.from_numpy(i) for i in inputs])

    sd = {f"binary_mlp.{k}": v for k, v in ref.state_dict().items()}
    params = ckpt.convert_binary_mlp(sd)
    ours = OurBinaryMLP().apply({"params": params}, [jnp.asarray(i) for i in inputs])

    for s in range(4):
        np.testing.assert_allclose(np.asarray(ours[f"pred_{s}"]),
                                   ref_out[f"pred_{s}"].numpy(), atol=1e-4, rtol=1e-3)


def test_golden_matching_encoder():
    from modules.networks import ResnetMatchingEncoder
    from implicit_depth_tpu.models.matching import ResnetMatchingEncoder as OurMatching

    torch.manual_seed(6)
    ref = ResnetMatchingEncoder(18, 16, pretrained=False).eval()
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)

    sd = {f"matching_model.{k}": v for k, v in ref.state_dict().items()}
    params, stats = ckpt.split_bn(ckpt.convert_matching_encoder(sd))

    x = np.random.RandomState(6).randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = OurMatching(num_ch_out=16).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref_out.transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=1e-3)


# --------------------------------------------------------------------- #
# losses
# --------------------------------------------------------------------- #

def test_golden_scale_invariant_loss():
    from losses import ScaleInvariantLoss
    from implicit_depth_tpu.train.losses import scale_invariant_loss

    rng = np.random.RandomState(7)
    log_gt = rng.randn(2, 1, 8, 10).astype(np.float32)
    log_pred = rng.randn(2, 1, 8, 10).astype(np.float32)
    ref = ScaleInvariantLoss()(torch.from_numpy(log_gt), torch.from_numpy(log_pred))
    ours = scale_invariant_loss(jnp.asarray(log_gt), jnp.asarray(log_pred),
                                jnp.ones_like(jnp.asarray(log_gt)))
    np.testing.assert_allclose(float(ours), float(ref), atol=1e-5)


def test_golden_ms_gradient_loss():
    from losses import MSGradientLoss
    from implicit_depth_tpu.train.losses import ms_gradient_loss

    rng = np.random.RandomState(8)
    gt = (rng.rand(1, 1, 32, 32).astype(np.float32) * 3 + 0.3)
    gt[0, 0, 3:6, 4:9] = np.nan  # invalids propagate through the ref mask
    pred = (rng.rand(1, 1, 32, 32).astype(np.float32) * 3 + 0.3)
    ref = MSGradientLoss(num_scales=4)(torch.from_numpy(gt), torch.from_numpy(pred))
    ours = ms_gradient_loss(jnp.asarray(gt.transpose(0, 2, 3, 1)),
                            jnp.asarray(pred.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(ours), float(ref), atol=1e-4, rtol=1e-4)


def test_golden_normals():
    from utils.geometry_utils import NormalGenerator
    from losses import NormalsLoss
    from implicit_depth_tpu.ops.image import normals_from_depth
    from implicit_depth_tpu.train.losses import normals_loss

    rng = np.random.RandomState(9)
    h, w = 16, 20
    depth = (rng.rand(1, 1, h, w).astype(np.float32) * 2 + 0.5)
    invK = np.linalg.inv(np.diag([9.0, 7.0, 1.0, 1.0]))[None].astype(np.float32)

    gen = NormalGenerator(h, w)
    ref_normals = gen(torch.from_numpy(depth), torch.from_numpy(invK)).numpy()
    ours_normals = normals_from_depth(
        jnp.asarray(depth.transpose(0, 2, 3, 1)), jnp.asarray(invK))
    np.testing.assert_allclose(np.asarray(ours_normals),
                               ref_normals.transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-3)

    pred_normals = ref_normals + 0.1 * rng.randn(*ref_normals.shape).astype(np.float32)
    ref_loss = NormalsLoss()(torch.from_numpy(ref_normals), torch.from_numpy(pred_normals))
    ours_loss = normals_loss(jnp.asarray(ref_normals.transpose(0, 2, 3, 1)),
                             jnp.asarray(pred_normals.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(ours_loss), float(ref_loss), atol=1e-5)
