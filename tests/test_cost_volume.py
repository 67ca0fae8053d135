"""Plane-sweep volume parity vs a torch re-derivation of the reference math.

The torch side re-creates the reference pipeline from its documented
behaviour (backproject +0.5-centre grid at each plane, project, grid_sample
zeros/bilinear/align_corners=False, metadata concat in the order of
modules/cost_volume.py:1117-1135, Linear stack with LeakyReLU(0.01)) and is
compared against our homography-driven, group-matmul implementation with
identical weights.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from implicit_depth_tpu.core import geometry
from implicit_depth_tpu.models.volume_mlp import MetadataVolumeMLP, metadata_input_channels
from implicit_depth_tpu.volumes import cost_volume as cv


B, K, C, D, H, W = 2, 3, 4, 5, 6, 8


def _make_K(fx, fy, cx, cy):
    Km = np.eye(4, dtype=np.float64)
    Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2] = fx, fy, cx, cy
    return Km


def _rand_pose(rng, scale=0.3):
    a = rng.uniform(-scale, scale, 3)
    R = geometry.rotx(a[0]) @ geometry.roty(a[1]) @ geometry.rotz(a[2])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.uniform(-0.3, 0.3, 3)
    return T


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    cur_feats = rng.randn(B, H, W, C).astype(np.float32)
    src_feats = rng.randn(B, K, H, W, C).astype(np.float32)
    cur_K = np.stack([_make_K(7.0 + i, 6.0, W / 2, H / 2) for i in range(B)])
    cur_invK = np.linalg.inv(cur_K)
    src_K = np.stack([[_make_K(7.0 + i + 0.3 * k, 6.0, W / 2, H / 2) for k in range(K)] for i in range(B)])
    src_T_cur = np.stack([[_rand_pose(rng) for _ in range(K)] for _ in range(B)])
    src_poses = np.linalg.inv(src_T_cur)  # cur_cam_T_src_cam
    planes = np.asarray(geometry.log_depth_planes(0.5, 4.0, D), dtype=np.float64)
    return dict(
        cur_feats=cur_feats, src_feats=src_feats,
        cur_invK=cur_invK.astype(np.float32), src_K=src_K.astype(np.float32),
        src_T_cur=src_T_cur.astype(np.float32), src_poses=src_poses.astype(np.float32),
        planes=planes.astype(np.float32),
    )


def _torch_warp(setup):
    """Reference-style warp: per plane backproject/project + grid_sample."""
    cur_invK = torch.from_numpy(setup["cur_invK"])
    src_K = torch.from_numpy(setup["src_K"])
    src_T = torch.from_numpy(setup["src_T_cur"])
    src_feats = torch.from_numpy(setup["src_feats"]).permute(0, 1, 4, 2, 3)  # b k c h w
    planes = torch.from_numpy(setup["planes"])

    xs, ys = torch.meshgrid(torch.arange(W) + 0.5, torch.arange(H) + 0.5, indexing="xy")
    pix = torch.stack([xs, ys, torch.ones_like(xs)], 0).reshape(3, -1).float()  # 3, N

    warped = torch.zeros(B, K, D, C, H, W)
    zs = torch.zeros(B, K, D, H, W)
    for b in range(B):
        for k in range(K):
            P = src_K[b, k, :3, :3] @ src_T[b, k, :3, :]
            for d in range(D):
                cam_pts = planes[d] * (cur_invK[b, :3, :3] @ pix)  # 3, N
                hom = torch.cat([cam_pts, torch.ones(1, cam_pts.shape[1])], 0)
                proj = P @ hom
                z = torch.clamp(proj[2], min=1e-5)
                u = proj[0] / z
                v = proj[1] / z
                grid = torch.stack([2 * u / W - 1, 2 * v / H - 1], -1).reshape(1, H, W, 2)
                samp = F.grid_sample(
                    src_feats[b, k][None], grid, mode="bilinear",
                    padding_mode="zeros", align_corners=False,
                )
                warped[b, k, d] = samp[0]
                zs[b, k, d] = z.reshape(H, W)
    return warped, zs


def test_warped_views_match_torch(setup):
    warped_t, z_t = _torch_warp(setup)
    wv = cv.build_warped_views(
        jnp.asarray(setup["cur_feats"]), jnp.asarray(setup["src_feats"]),
        jnp.asarray(setup["src_K"]), jnp.asarray(setup["src_T_cur"]),
        jnp.asarray(setup["cur_invK"]), jnp.asarray(setup["src_poses"]),
        jnp.asarray(setup["planes"]),
    )
    got = np.asarray(wv.feats).transpose(0, 1, 2, 5, 3, 4)  # b k d c h w
    np.testing.assert_allclose(got, warped_t.numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(wv.depths), z_t.numpy(), atol=1e-4, rtol=1e-4)
    assert np.all(np.asarray(wv.mask) == 1.0)


def test_dot_cost_volume_matches_torch(setup):
    warped_t, z_t = _torch_warp(setup)
    cur_t = torch.from_numpy(setup["cur_feats"]).permute(0, 3, 1, 2)  # b c h w
    dot_t = torch.einsum("bkdchw,bchw->bkdhw", warped_t, cur_t)
    volume_t = dot_t.sum(1)  # b d h w

    wv = cv.build_warped_views(
        jnp.asarray(setup["cur_feats"]), jnp.asarray(setup["src_feats"]),
        jnp.asarray(setup["src_K"]), jnp.asarray(setup["src_T_cur"]),
        jnp.asarray(setup["cur_invK"]), jnp.asarray(setup["src_poses"]),
        jnp.asarray(setup["planes"]),
    )
    np.testing.assert_allclose(np.asarray(cv.dot_cost_volume(wv)), volume_t.numpy(), atol=3e-4, rtol=1e-4)


def test_metadata_mlp_matches_torch_concat(setup):
    """Grouped first-layer matmuls == torch Linear on the 202-style concat."""
    cin = metadata_input_channels(K, C)
    torch.manual_seed(0)
    lin0 = torch.nn.Linear(cin, 16)
    lin1 = torch.nn.Linear(16, 16)
    lin2 = torch.nn.Linear(16, 1)

    # ---- torch reference side
    warped_t, z_t = _torch_warp(setup)
    cur_t = torch.from_numpy(setup["cur_feats"]).permute(0, 3, 1, 2)
    mask_t = torch.ones_like(z_t)
    dot_t = torch.einsum("bkdchw,bchw->bkdhw", warped_t, cur_t) * mask_t

    cur_invK = torch.from_numpy(setup["cur_invK"])
    xs, ys = torch.meshgrid(torch.arange(W) + 0.5, torch.arange(H) + 0.5, indexing="xy")
    pix = torch.stack([xs, ys, torch.ones_like(xs)], 0).reshape(3, -1).float()
    planes_t = torch.from_numpy(setup["planes"])
    rays_cur = torch.einsum("bij,jn->bin", cur_invK[:, :3, :3], pix)  # b 3 N
    world = rays_cur[:, None, None] * planes_t[None, None, :, None, None]  # b 1 d 3 N
    src_origin = torch.from_numpy(setup["src_poses"])[:, :, :3, 3]  # b k 3
    src_rays = world - src_origin[:, :, None, :, None]
    src_rays = F.normalize(src_rays, dim=3)
    cur_rays = F.normalize(rays_cur, dim=1)
    angle = torch.einsum("bin,bkdin->bkdn", cur_rays, src_rays)

    pose = torch.from_numpy(setup["src_poses"])
    Rt = pose[..., :3, :3]
    tt = pose[..., :3, 3]
    trace = Rt.diagonal(dim1=-2, dim2=-1).sum(-1)
    rmeas = torch.sqrt(2 * (1 - torch.clamp(trace, max=3.0) / 3))
    tmeas = tt.norm(dim=-1)
    pen = torch.sqrt(rmeas**2 + tmeas**2)

    feats_concat = []
    feats_concat.append(warped_t.permute(0, 2, 1, 3, 4, 5).reshape(B, D, K * C, H, W))  # k-major
    feats_concat.append(cur_t[:, None].expand(B, D, C, H, W))
    feats_concat.append(mask_t.permute(0, 2, 1, 3, 4))
    feats_concat.append(z_t.permute(0, 2, 1, 3, 4))
    feats_concat.append(planes_t[None, :, None, None, None].expand(B, D, 1, H, W))
    feats_concat.append(dot_t.permute(0, 2, 1, 3, 4))
    feats_concat.append(angle.reshape(B, K, D, H, W).permute(0, 2, 1, 3, 4))
    # all_rays: [cur(3), src_k0(3), ..., src_k{K-1}(3)] per plane
    cur_rays_bd3hw = cur_rays.reshape(B, 3, H, W)[:, None].expand(B, D, 3, H, W)
    src_rays_bdk3hw = src_rays.reshape(B, K, D, 3, H, W).permute(0, 2, 1, 3, 4, 5).reshape(B, D, K * 3, H, W)
    feats_concat.append(torch.cat([cur_rays_bd3hw, src_rays_bdk3hw], dim=2))
    for m in (pen, rmeas, tmeas):
        feats_concat.append(m[:, None, :, None, None].expand(B, D, K, H, W))

    full = torch.cat(feats_concat, dim=2)  # (B, D, cin, H, W)
    assert full.shape[2] == cin
    x = full.permute(0, 1, 3, 4, 2)
    with torch.no_grad():
        h1 = F.leaky_relu(lin0(x), 0.01)
        h2 = F.leaky_relu(lin1(h1), 0.01)
        ref = lin2(h2)[..., 0]  # (B, D, H, W)

    # ---- jax side with the same weights
    wv = cv.build_warped_views(
        jnp.asarray(setup["cur_feats"]), jnp.asarray(setup["src_feats"]),
        jnp.asarray(setup["src_K"]), jnp.asarray(setup["src_T_cur"]),
        jnp.asarray(setup["cur_invK"]), jnp.asarray(setup["src_poses"]),
        jnp.asarray(setup["planes"]),
    )
    model = MetadataVolumeMLP(num_src_views=K, matching_dim=C, hidden=16)
    params = {
        "params": {
            "fc0_kernel": jnp.asarray(lin0.weight.detach().numpy().T),
            "fc0_bias": jnp.asarray(lin0.bias.detach().numpy()),
            "fc1": {"kernel": jnp.asarray(lin1.weight.detach().numpy().T),
                     "bias": jnp.asarray(lin1.bias.detach().numpy())},
            "fc2": {"kernel": jnp.asarray(lin2.weight.detach().numpy().T),
                     "bias": jnp.asarray(lin2.bias.detach().numpy())},
        }
    }
    out = model.apply(params, wv, jnp.asarray(setup["cur_feats"]))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=5e-4, rtol=1e-3)


def test_lowest_cost_depth(setup):
    vol = np.zeros((1, D, H, W), np.float32)
    vol[0, 2] = 1.0
    out = cv.lowest_cost_depth(jnp.asarray(vol), jnp.asarray(setup["planes"]))
    np.testing.assert_allclose(np.asarray(out), setup["planes"][2])
