"""Dataset + host loader.

≡ reference `hwgat/dataset.py:12-41` + `hwgat/utils.py:16-52`, redesigned for
the XLA execution model:

- fixed batch shapes: the last partial batch is padded and carried with a
  {0,1} validity mask so jit never recompiles; loss/metrics weight by the mask
  (numerically identical to the reference's per-sample accounting);
- deterministic per-sample RNG: stream = (seed, epoch, sample index), so any
  run is reproducible regardless of worker scheduling;
- transform workers run in a thread pool (NumPy/SciPy release the GIL on the
  hot paths), feeding an on-device double-buffered prefetch.
"""

from __future__ import annotations

import pickle
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator

import numpy as np


def load_entry(data):
    """Resolve a data-map entry: in-memory array | .pkl path | .mp4 path.
    ≡ `dataset.py:21-28`."""
    if isinstance(data, np.ndarray):
        return data
    if isinstance(data, str) and data.endswith("pkl"):
        with open(data, "rb") as f:
            return pickle.load(f)
    if isinstance(data, str) and data.endswith("mp4"):
        try:
            from decord import VideoReader, cpu
        except ImportError as e:
            raise ImportError("decord is required to read .mp4 data-map entries") from e
        return VideoReader(data, ctx=cpu(0)).asnumpy()
    raise ValueError(f"unsupported data-map entry: {type(data)}")


@dataclass
class KeypointDataset:
    """id-list + data-map + label-map + transform. ≡ `CustomDataset`."""

    ids: list
    data_map: dict
    label_map: dict
    transform: object
    seed: int = 1001

    def __len__(self):
        return len(self.ids)

    def get(self, index: int, epoch: int = 0):
        vid = self.ids[index]
        raw = self.data_map[vid]
        feat = load_entry(raw)
        if feat is raw:  # in-memory dict entry: transforms mutate, so copy;
            feat = feat.copy()  # pkl/mp4/clipstore reads are already fresh
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, epoch, index]))
        feat = self.transform(feat, rng) if self.transform is not None else feat
        return feat.astype(np.float32), np.int32(self.label_map[vid])


@dataclass
class Loader:
    """Fixed-shape batch iterator with padding mask and thread-pool transforms."""

    dataset: KeypointDataset
    batch_size: int
    shuffle: bool = False
    num_workers: int = 8
    seed: int = 1001

    def __len__(self):
        return -(-len(self.dataset) // self.batch_size)

    prefetch: int = 2
    # auto_warm_next: when an epoch is consumed to the end, immediately
    # pre-submit the FIRST ``prefetch+1`` batches of epoch+1 on the persistent
    # pool — their transforms then overlap with whatever the host does between
    # epochs (validation, checkpointing, curve plotting) instead of starting
    # cold when the next epoch is requested. Set on the train loader.
    auto_warm_next: bool = False
    # row_slice (lo, hi): multi-host input sharding — this process loads and
    # transforms ONLY rows [lo, hi) of every (globally identically ordered)
    # batch; `train/dist.py` assembles the global array from the local shards
    # via make_array_from_process_local_data. Padding happens at the ID level
    # (repeat the last real id; `dataset.get` is deterministic per
    # (seed, epoch, id), so this equals the old repeat-the-array padding).
    row_slice: tuple | None = None
    # cache_transforms: materialize every batch on the first epoch and replay
    # it afterwards. ONLY valid when the transform pipeline is deterministic
    # and epoch-independent (the EVAL transform: HandCorrection / Normalize /
    # TemporalSample(no shift) / WindowCreate draw no randomness), i.e. the
    # val/test loaders — re-transforming 2000 val clips every epoch cost
    # ~15 s/epoch of the 2-core host budget on the large-vocab anchor.
    cache_transforms: bool = False

    def _batch_ids(self, order, s: int):
        ids = order[s : s + self.batch_size]
        valid = np.ones(len(ids), dtype=np.float32)
        if len(ids) < self.batch_size:  # pad to fixed shape
            pad = self.batch_size - len(ids)
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad)])
            valid = np.concatenate([valid, np.zeros(pad, np.float32)])
        if self.row_slice is not None:
            lo, hi = self.row_slice
            ids, valid = ids[lo:hi], valid[lo:hi]
        return ids, valid

    def _collect(self, task):
        futures, valid = task
        samples = [f.result() for f in futures]
        feats = np.stack([s[0] for s in samples])
        labels = np.asarray([s[1] for s in samples], dtype=np.int32)
        return feats, labels, valid

    def _pool_get(self) -> ThreadPoolExecutor:
        pool = getattr(self, "_pool", None)
        if pool is None:
            pool = ThreadPoolExecutor(max_workers=max(1, self.num_workers))
            self._pool = pool
        return pool

    def _order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(np.random.SeedSequence([self.seed, epoch])).shuffle(order)
        return order

    def _submit(self, order, s: int, epoch: int):
        pool = self._pool_get()
        ids, valid = self._batch_ids(order, s)
        return [pool.submit(self.dataset.get, int(i), epoch)
                for i in ids], valid

    def warm(self, epoch: int) -> None:
        """Pre-submit the first ``prefetch+1`` batches of ``epoch`` (sample
        order is deterministic in (seed, epoch), so ``epoch()`` later consumes
        exactly these futures)."""
        warmed = getattr(self, "_warm", None)
        if warmed is None:
            warmed = self._warm = {}
        if epoch in warmed:
            return
        order = self._order(epoch)
        starts = range(0, len(self.dataset), self.batch_size)
        k = min(self.prefetch + 1, len(starts))
        warmed[epoch] = [self._submit(order, s, epoch) for s in list(starts)[:k]]

    def epoch(self, epoch: int = 0) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Batches with ``prefetch``-deep pipelining: samples for the next
        batches transform in worker threads while the caller consumes the
        current batch (host-side analogue of double-buffered device feeding)."""
        if self.cache_transforms:
            cached = getattr(self, "_cache", None)
            if cached is not None:
                yield from cached
                return
        order = self._order(epoch)
        starts = list(range(0, len(self.dataset), self.batch_size))
        pending = getattr(self, "_warm", {}).pop(epoch, None)
        if pending is None:
            pending = [self._submit(order, s, epoch)
                       for s in starts[: self.prefetch + 1]]
        next_submit = min(self.prefetch + 1, len(starts))
        batches = [] if self.cache_transforms else None
        for _ in starts:
            futures = pending.pop(0)
            if next_submit < len(starts):
                pending.append(self._submit(order, starts[next_submit], epoch))
                next_submit += 1
            batch = self._collect(futures)
            if batches is not None:
                batches.append(batch)
            yield batch
        if batches is not None:
            self._cache = batches
        if self.auto_warm_next:
            self.warm(epoch + 1)


def load_artifacts(cfg_data):
    """Read the four preprocessed pickles. ≡ `utils.py:18-26`.

    The data map is either the reference-style in-memory pickle or a
    ``{"__clipstore__": path}`` marker pointing at an mmap-backed clip store
    (`data/clipstore.py`, written by ``preprocess(..., store='clipstore')``).
    """
    with open(cfg_data.vid_split_path, "rb") as f:
        vid_splits = pickle.load(f)
    with open(cfg_data.vid_class_path, "rb") as f:
        vid_cls = pickle.load(f)
    with open(cfg_data.data_map_path, "rb") as f:
        vid_feat = pickle.load(f)
    if isinstance(vid_feat, dict) and "__clipstore__" in vid_feat:
        from sl_hwgat_tpu.data.clipstore import ClipStore

        vid_feat = ClipStore(vid_feat["__clipstore__"])
    return vid_splits, vid_cls, vid_feat


def get_loaders(cfg, train_transform, eval_transform):
    """Three split loaders; in test mode every split uses the eval transform.
    ≡ `utils.py:16-52`."""
    vid_splits, vid_cls, vid_feat = load_artifacts(cfg.data)
    tt = eval_transform if cfg.mode == "test" else train_transform

    def mk(split, transform, shuffle, cache=False):
        ds = KeypointDataset(vid_splits[split], vid_feat, vid_cls, transform, seed=cfg.seed)
        return Loader(ds, cfg.batch_size, shuffle=shuffle, num_workers=cfg.n_workers,
                      seed=cfg.seed, auto_warm_next=shuffle,
                      cache_transforms=cache)

    return (
        mk("train", tt, shuffle=cfg.mode != "test"),
        # val/test run the deterministic eval transform — cache the
        # transformed batches after the first pass (the epoch driver
        # re-evaluates val every epoch)
        mk("val", eval_transform, shuffle=False, cache=True),
        mk("test", eval_transform, shuffle=False, cache=True),
    )
