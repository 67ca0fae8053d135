"""Threaded BatchLoader tests."""

import numpy as np

from implicit_depth_tpu.data.loader import BatchLoader
from implicit_depth_tpu.data.synthetic import SyntheticDataset


def test_loader_epoch_and_shapes():
    ds = SyntheticDataset(num_frames=10, num_views=3, split="val", get_bd_info=True)
    loader = BatchLoader(ds, batch_size=3, shuffle=False, num_workers=2, epochs=1)
    batches = list(iter(loader))
    assert len(batches) == len(ds) // 3 == len(loader)
    cur, src = batches[0]
    assert cur["image"].shape == (3, 64, 96, 3)
    assert src["image"].shape == (3, 2, 64, 96, 3)


def test_loader_shuffle_determinism():
    ds = SyntheticDataset(num_frames=10, num_views=3, split="val")
    a = [c["world_T_cam"][0, 0, 3] for c, _ in BatchLoader(ds, 2, seed=7, epochs=1)]
    b = [c["world_T_cam"][0, 0, 3] for c, _ in BatchLoader(ds, 2, seed=7, epochs=1)]
    np.testing.assert_allclose(a, b)


def test_loader_device_put_fn():
    ds = SyntheticDataset(num_frames=8, num_views=3, split="val")
    calls = []
    def put(batch):
        calls.append(1)
        return batch
    list(iter(BatchLoader(ds, 2, epochs=1, device_put_fn=put)))
    assert len(calls) == 3  # 6 tuples / batch 2


def test_deterministic_resume_order():
    """start_batch=N skips exactly the first N batches of the same
    deterministic (seed, epoch) order — the data-resume contract."""
    ds = SyntheticDataset(num_frames=12, num_views=3, split="val")
    full = [c["world_T_cam"] for c, _ in BatchLoader(ds, 2, shuffle=True, seed=5,
                                                     epochs=2, num_workers=2)]
    resumed = [c["world_T_cam"] for c, _ in BatchLoader(ds, 2, shuffle=True, seed=5,
                                                        epochs=2, num_workers=2,
                                                        start_batch=3)]
    assert len(resumed) == len(full) - 3
    for a, b in zip(full[3:], resumed):
        np.testing.assert_array_equal(a, b)


def test_loader_stats_counters():
    ds = SyntheticDataset(num_frames=9, num_views=3, split="val")
    loader = BatchLoader(ds, 2, shuffle=False, epochs=1, num_workers=1)
    list(iter(loader))
    st = loader.stats()
    assert st["batches_produced"] == 3
    assert st["consumer_starved_s"] >= 0.0
    assert st["producer_blocked_s"] >= 0.0
