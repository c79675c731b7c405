"""Multi-host input-sharding semantics of the DataLoader."""

import numpy as np
import pytest

from lss_carla_tpu.data.loader import DataLoader


class _FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (np.array([i], dtype=np.int64),)


def _all_indices(dl):
    out = []
    for (batch,) in dl:
        out.extend(batch[:, 0].tolist())
    return out


def test_shards_partition_the_epoch():
    ds = _FakeDataset(32)
    loaders = [DataLoader(ds, batch_size=4, shuffle=True, num_workers=0,
                          shard_index=i, num_shards=4, seed=7)
               for i in range(4)]
    seen = [set(_all_indices(dl)) for dl in loaders]
    # disjoint and complete
    union = set().union(*seen)
    assert union == set(range(32))
    for i in range(4):
        for j in range(i + 1, 4):
            assert seen[i].isdisjoint(seen[j])
    assert all(len(s) == 8 for s in seen)


def test_shards_agree_on_global_order():
    """Same seed+epoch -> hosts slice one consistent global shuffle."""
    ds = _FakeDataset(16)
    a = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0,
                   shard_index=0, num_shards=2, seed=3)
    b = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0,
                   shard_index=1, num_shards=2, seed=3)
    ia, ib = _all_indices(a), _all_indices(b)
    # interleaving of the same permutation: merging by position reconstructs it
    full = DataLoader(ds, batch_size=16, shuffle=True, num_workers=0, seed=3)
    (order,) = next(iter(full))
    order = order[:, 0].tolist()
    assert ia == order[0::2]
    assert ib == order[1::2]


def test_single_shard_default_unchanged():
    ds = _FakeDataset(10)
    dl = DataLoader(ds, batch_size=3, shuffle=False, num_workers=0,
                    drop_last=True)
    assert _all_indices(dl) == list(range(9))


def test_drop_last_equal_batch_counts_across_hosts():
    """len(dataset) not divisible by shards*bsz: every host must still yield
    the SAME batch count (a disagreement deadlocks the first collective of
    the surplus step on a real pod)."""
    for n in (30, 31, 33, 37):
        ds = _FakeDataset(n)
        loaders = [DataLoader(ds, batch_size=4, shuffle=True, num_workers=0,
                              shard_index=i, num_shards=2, seed=5,
                              drop_last=True)
                   for i in range(2)]
        counts = [sum(1 for _ in dl) for dl in loaders]
        assert counts[0] == counts[1] == len(loaders[0]) == n // 8
        # and hosts still partition disjointly
        seen = [set(_all_indices(DataLoader(
            ds, batch_size=4, shuffle=True, num_workers=0, shard_index=i,
            num_shards=2, seed=5, drop_last=True))) for i in range(2)]
        assert seen[0].isdisjoint(seen[1])


def test_pad_last_masks_exact_coverage():
    """pad_last pads the final batch to a static shape and emits a mask;
    valid positions cover the dataset exactly once, pads are marked 0."""
    ds = _FakeDataset(10)
    dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=0,
                    pad_last=True)
    seen = []
    for batch in dl:
        assert len(batch) == 2  # sample tuple (1 array) + mask
        arr, mask = batch
        assert arr.shape[0] == 4 and mask.shape == (4,)
        seen.extend(int(i) for i, m in zip(arr[:, 0], mask) if m > 0)
    assert sorted(seen) == list(range(10))
    assert len(dl) == 3


def test_pad_last_sharded_equal_and_exact():
    """pad_last + shards: equal full batches per host; union of valid
    positions over hosts is the exact dataset."""
    ds = _FakeDataset(13)
    all_valid = []
    counts = []
    for i in range(2):
        dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=0,
                        shard_index=i, num_shards=2, pad_last=True)
        c = 0
        for batch in dl:
            arr, mask = batch
            assert arr.shape[0] == 4
            all_valid.extend(int(v) for v, m in zip(arr[:, 0], mask) if m > 0)
            c += 1
        counts.append(c)
    assert counts[0] == counts[1] == 2  # ceil(13/8) = 2 per host
    assert sorted(all_valid) == list(range(13))


def test_pad_last_tiny_dataset_wraps():
    """Dataset smaller than one global batch: wrap-around padding still
    produces one full batch with the right mask."""
    ds = _FakeDataset(3)
    dl = DataLoader(ds, batch_size=8, shuffle=False, num_workers=0,
                    pad_last=True)
    batches = list(dl)
    assert len(batches) == 1
    arr, mask = batches[0]
    assert arr.shape[0] == 8
    assert mask.tolist() == [1, 1, 1, 0, 0, 0, 0, 0]


def test_prefetch_multi_epoch_slow_consumer():
    """Epoch-end sentinel must arrive even when the queue is full
    (regression: a dropped sentinel deadlocked training at epoch ends)."""
    import time
    from lss_carla_tpu.data.loader import prefetch_to_device

    ds = _FakeDataset(8)
    dl = DataLoader(ds, batch_size=2, num_workers=2, prefetch_batches=2)
    for _ in range(3):
        n = 0
        for _batch in prefetch_to_device(iter(dl), size=2,
                                         device_put=lambda b: b):
            time.sleep(0.02)  # slow consumer -> queue full at epoch end
            n += 1
        assert n == 4


def test_sharded_without_equalization_rejected():
    """num_shards>1 with a non-divisible dataset and neither drop_last nor
    pad_last would make hosts disagree on batch count (collective
    deadlock) — the constructor must reject it."""
    ds = _FakeDataset(9)
    with pytest.raises(ValueError, match="drop_last or pad_last"):
        DataLoader(ds, batch_size=4, shuffle=False, num_workers=0,
                   shard_index=0, num_shards=2)
    # exact multiple stays allowed (every host yields the same count)
    dl = DataLoader(_FakeDataset(16), batch_size=4, shuffle=False,
                    num_workers=0, shard_index=0, num_shards=2)
    assert len(dl) == 2


def test_set_epoch_controls_shuffle_order():
    """Resumed runs must continue the shuffle schedule, not replay it."""
    from lss_carla_tpu.data.loader import DataLoader

    class _Range:
        def __len__(self):
            return 17

        def __getitem__(self, i):
            return (np.asarray([i]),)

    dl = DataLoader(_Range(), batch_size=4, shuffle=True, drop_last=True,
                    num_workers=0)
    first = [b[0].ravel().tolist() for b in dl]    # epoch 0
    second = [b[0].ravel().tolist() for b in dl]   # epoch 1
    assert first != second
    dl.set_epoch(0)
    replay = [b[0].ravel().tolist() for b in dl]
    assert replay == first                         # pinning reproduces
    dl.set_epoch(1)
    assert [b[0].ravel().tolist() for b in dl] == second
