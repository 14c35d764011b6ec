"""Loader invariants: determinism across worker/prefetch settings, padding
mask correctness, per-epoch shuffling."""

import numpy as np

from sl_hwgat_tpu.data.dataset import KeypointDataset, Loader


def make_ds(n=10, t=6):
    r = np.random.default_rng(0)
    ids = [f"v{i}" for i in range(n)]
    dmap = {v: r.normal(size=(t, 4, 2)).astype(np.float32) for v in ids}
    labels = {v: i % 3 for i, v in enumerate(ids)}
    return KeypointDataset(ids, dmap, labels, transform=None)


def batches(loader, epoch=0):
    return [(f.copy(), l.copy(), v.copy()) for f, l, v in loader.epoch(epoch)]


def test_deterministic_across_worker_counts():
    ds = make_ds()
    a = batches(Loader(ds, 4, shuffle=True, num_workers=1, prefetch=0))
    b = batches(Loader(ds, 4, shuffle=True, num_workers=8, prefetch=3))
    assert len(a) == len(b) == 3
    for (f1, l1, v1), (f2, l2, v2) in zip(a, b):
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(v1, v2)


def test_padding_mask_on_last_batch():
    ds = make_ds(n=10)
    out = batches(Loader(ds, 4, shuffle=False, num_workers=2))
    f, l, v = out[-1]
    assert f.shape[0] == 4  # fixed shape
    np.testing.assert_array_equal(v, [1, 1, 0, 0])  # 10 = 4+4+2


def test_shuffle_differs_across_epochs_but_reproducible():
    ds = make_ds(n=8)
    ld = Loader(ds, 8, shuffle=True, num_workers=2)
    l0 = batches(ld, epoch=0)[0][1]
    l1 = batches(ld, epoch=1)[0][1]
    l0_again = batches(ld, epoch=0)[0][1]
    assert not np.array_equal(l0, l1)
    np.testing.assert_array_equal(l0, l0_again)


def test_warm_prefetch_yields_identical_epoch():
    """warm(e) pre-submits the first batches; a later epoch(e) consumes those
    futures and the batch stream is identical to an unwarmed loader's."""
    ds = make_ds(n=10)
    warmed = Loader(ds, 4, shuffle=True, num_workers=2)
    warmed.warm(3)
    assert 3 in warmed._warm and len(warmed._warm[3]) == 3  # prefetch+1
    got = batches(warmed, epoch=3)
    assert 3 not in warmed._warm  # consumed
    want = batches(Loader(ds, 4, shuffle=True, num_workers=2), epoch=3)
    for (f1, l1, v1), (f2, l2, v2) in zip(got, want):
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(v1, v2)


def test_auto_warm_next_after_full_epoch():
    """auto_warm_next: finishing epoch e pre-submits epoch e+1's first batches
    (overlapping next-epoch transforms with between-epoch host work)."""
    ds = make_ds(n=10)
    ld = Loader(ds, 4, shuffle=True, num_workers=2, auto_warm_next=True)
    first = batches(ld, epoch=0)
    assert 1 in ld._warm
    nxt = batches(ld, epoch=1)
    want = batches(Loader(ds, 4, shuffle=True, num_workers=2), epoch=1)
    for (f1, l1, v1), (f2, l2, v2) in zip(nxt, want):
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(l1, l2)
    assert len(first) == len(nxt) == 3


def test_composite_inference_decode():
    from sl_hwgat_tpu.train.inference import decode_classes

    # 2 sub-classes: 0012 and 0345 → "2" + "0012" + "0345"
    num, cls = decode_classes(200120345)
    assert num == 2
    assert cls == [12, 345]


def test_cache_transforms_replays_identical_batches():
    """cache_transforms (val/test loaders): epoch 1 must replay exactly the
    batches materialized on epoch 0 — no re-transform, no drift."""
    import numpy as np

    from sl_hwgat_tpu.data.dataset import KeypointDataset, Loader

    r = np.random.default_rng(0)
    data = {f"v{i}": r.normal(size=(6, 4, 2)).astype(np.float32) for i in range(7)}
    labels = {k: i % 3 for i, k in enumerate(data)}
    ds = KeypointDataset(list(data), data, labels, transform=None)
    ld = Loader(ds, batch_size=3, shuffle=False, num_workers=2,
                cache_transforms=True)
    first = [(f.copy(), l.copy(), v.copy()) for f, l, v in ld.epoch(0)]
    second = list(ld.epoch(1))
    assert len(first) == len(second) == 3
    for (f0, l0, v0), (f1, l1, v1) in zip(first, second):
        np.testing.assert_array_equal(f0, f1)
        np.testing.assert_array_equal(l0, l1)
        np.testing.assert_array_equal(v0, v1)
    assert getattr(ld, "_cache", None) is not None
