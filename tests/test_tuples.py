"""Tuple generation tests over synthetic pose sequences."""

import numpy as np

from implicit_depth_tpu.data import tuples
from implicit_depth_tpu.data.keyframes import DVMVSConfig, pose_distance_np


def _walk_poses(n, step=0.15):
    poses = []
    for i in range(n):
        T = np.eye(4)
        T[:3, 3] = [step * i, 0.0, 0.0]
        poses.append(T)
    return poses


def test_default_tuples_online():
    poses = _walk_poses(30)
    samples = tuples.default_tuples(poses, [0] * 30, n_src=3)
    assert len(samples) > 5
    for s in samples:
        ref = s[0]
        assert all(j < ref for j in s[1:])  # online: sources in the past


def test_dense_tuples_every_frame():
    poses = _walk_poses(20)
    samples = tuples.dense_tuples(poses, n_src=3)
    # one tuple per frame except frame 0
    assert len(samples) == 19
    refs = [s[0] for s in samples]
    assert refs == list(range(1, 20))


def test_offline_tuples_use_future():
    poses = _walk_poses(30)
    samples = tuples.offline_tuples(poses, n_src=4)
    has_future = any(any(j > s[0] for j in s[1:]) for s in samples)
    assert has_future


def test_pad_tuple():
    import random
    rng = random.Random(0)
    padded = tuples.pad_tuple([10, 9], num_views=5, rng=rng)
    assert len(padded) == 5
    assert padded[0] == 10
    assert len(set(padded[:2] + padded[2:])) <= 5


def test_train_tuples_pose_windows():
    poses = _walk_poses(60, step=0.08)
    samples = tuples.train_tuples(poses, num_views=4)
    assert len(samples) > 0
    cfg = DVMVSConfig
    for s in samples:
        assert len(s) == 4
        for a, b in zip(s[:-1], s[1:]):
            d, _, _ = pose_distance_np(poses[a], poses[b])
            # loosest multiplier is 1.5
            assert cfg.train_minimum_pose_distance * 0.6 <= d <= cfg.train_maximum_pose_distance * 1.6


def test_train_pairs():
    poses = _walk_poses(40, step=0.1)
    pairs = tuples.train_pairs(poses)
    assert len(pairs) > 5
    for a, b in pairs:
        d, _, _ = pose_distance_np(poses[a], poses[b])
        assert d <= DVMVSConfig.train_maximum_pose_distance * 1.3


def test_generate_for_scan_with_synthetic():
    from implicit_depth_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(num_frames=16, num_views=3, split="val")
    lines = tuples.generate_test_tuples_for_scan(ds, "scene0", "default", num_views=3)
    assert all(len(l.split()) == 4 for l in lines)  # scan + 3 ids
    lines = tuples.generate_test_tuples_for_scan(ds, "scene0", "dense_offline", num_views=3)
    assert len(lines) >= 15
