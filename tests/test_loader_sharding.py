"""Multi-host input-sharding semantics of the DataLoader."""

import numpy as np

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
