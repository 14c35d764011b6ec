"""Production inference: checkpoint → compiled bucketed predictor.

The reference offers no serving path (training-script evaluation only,
`hwgat/utils.py:117-142`); this module is the deployment-facing API the
north star's "production serving" requirement implies:

- **one compile per bucket**: requests are padded to fixed (batch, frames)
  buckets so XLA compiles once per bucket and every later call is pure
  execution (dynamic shapes would retrace per request — pathological on TPU,
  doubly so through a remote-compile relay);
- **validity-masked batching**: short batches are padded with zero clips and
  the padded logits dropped, so odd-sized request batches never recompile;
- accepts raw keypoint clips (any frame count / the extractor's (F, K, C)
  layout) and applies the model family's EVAL transform — the same
  preprocessing the training pipeline used;
- checkpoints: ours (`.ckpt` pickle or Orbax dir) or the reference's `.pt`.

Usage::

    pred = Predictor.from_checkpoint("output/FDMSE/HWGATE_v1/model_best_loss.ckpt",
                                     model_type="HWGATE", dataset="FDMSE")
    out = pred.predict_topk([clip1, clip2], k=5)   # clips: (F_i, 543, 4) ndarrays
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from sl_hwgat_tpu.constants import DATASET_PARAMS
from sl_hwgat_tpu.models import build_model
from sl_hwgat_tpu.train.checkpoint import variables_from_source


def _softmax_np(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


@dataclass
class Predictor:
    """Compiled classifier over preprocessed keypoint clips."""

    model: object
    variables: dict
    transform: object
    num_classes: int
    batch_buckets: tuple = (1, 4, 8, 16)
    _compiled: dict = field(default_factory=dict)

    @classmethod
    def from_checkpoint(cls, path: str, *, model_type: str, dataset: str,
                        pose_method: str = "mediapipe",
                        batch_buckets: tuple = (1, 4, 8, 16), **model_overrides):
        from sl_hwgat_tpu import configs
        from sl_hwgat_tpu.data import transforms as T

        ds = DATASET_PARAMS[dataset]
        model = build_model(model_type, ds, 2, **model_overrides)
        variables = jax.tree.map(jnp.asarray,
                                 variables_from_source(path, model_type))
        # full raw-clip pipeline: the preprocess-time static transform
        # (extractor layout → selected kp/coords) chained with the model
        # family's eval transform — the exact training-time preprocessing.
        static = configs.build_static_transform(pose_method)
        if model_type in ("HWGATE", "WGATE"):
            ev = configs.build_eval_transform(ds["src_len"])
        else:
            ev = configs.build_skeleton_eval_transform(ds["src_len"])
        transform = T.Compose([*static.transforms, *ev.transforms])
        return cls(model=model, variables=variables, transform=transform,
                   num_classes=ds["num_class"], batch_buckets=tuple(batch_buckets))

    # -- compilation ---------------------------------------------------------
    def _bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        return int(np.ceil(n / self.batch_buckets[-1])) * self.batch_buckets[-1]

    def _fn(self, batch: int, sample_shape: tuple):
        key = (batch, sample_shape)
        if key not in self._compiled:
            @jax.jit
            def fwd(variables, x):
                return self.model.apply(variables, x, train=False)

            self._compiled[key] = fwd
        return self._compiled[key]

    # -- API -----------------------------------------------------------------
    @staticmethod
    def _payload(clip):
        """Accept a `data/pose_extract.py` payload dict, or a plain (F, K, C)
        array (assumed already in pixel space → unit video size)."""
        if isinstance(clip, dict):
            return {"feat": np.array(clip["feat"], np.float32, copy=True),
                    "vid_width": clip.get("vid_width", 1),
                    "vid_height": clip.get("vid_height", 1)}
        return {"feat": np.array(clip, np.float32, copy=True),
                "vid_width": 1, "vid_height": 1}

    def _prep_pool(self):
        pool = getattr(self, "_pool", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor

            pool = self._pool = ThreadPoolExecutor(max_workers=8)
        return pool

    def predict_logits(self, clips: Sequence) -> np.ndarray:
        """Raw keypoint clips (pose-extract payload dicts or (F_i, K, C)
        arrays) → (len(clips), num_classes) logits."""
        # host preprocessing dominates end-to-end serving latency (measured:
        # device fwd ≈2.4ms/clip vs ~11ms/clip of numpy/scipy transforms) —
        # fan the per-clip transforms out on a thread pool
        prep = (lambda c: np.asarray(self.transform(self._payload(c)), np.float32))
        if len(clips) > 1:
            xs = list(self._prep_pool().map(prep, clips))
        else:
            xs = [prep(clips[0])]
        shape = xs[0].shape
        if any(x.shape != shape for x in xs):
            raise ValueError(f"transform produced inconsistent shapes: "
                             f"{[x.shape for x in xs]}")
        n = len(xs)
        b = self._bucket(n)
        x = np.zeros((b,) + shape, np.float32)
        x[:n] = np.stack(xs)
        logits = self._fn(b, shape)(self.variables, jnp.asarray(x))
        return np.asarray(logits)[:n]

    def predict_topk(self, clips: Sequence[np.ndarray], k: int = 5):
        """→ list of (class_ids, softmax_scores), each length k, per clip."""
        logits = self.predict_logits(clips)
        # host softmax: a (n, num_classes) vector op — pushing it through the
        # device costs a full host↔device round trip (~28 ms on the relay)
        probs = _softmax_np(logits)
        idx = np.argsort(-logits, axis=-1)[:, :k]
        return [(idx[i], probs[i, idx[i]]) for i in range(len(clips))]

    def warmup(self, sample_clip) -> None:
        """Pre-compile every batch bucket (call once at service start)."""
        x = np.asarray(self.transform(self._payload(sample_clip)), np.float32)
        for b in self.batch_buckets:
            self._fn(b, x.shape)(
                self.variables,
                jnp.zeros((b,) + x.shape, jnp.float32),
            ).block_until_ready()

    # -- export ----------------------------------------------------------------
    def export_stablehlo(self, path: str, batch: int, sample_clip) -> str:
        """Serialize the compiled forward (weights baked in) as a portable
        StableHLO artifact (`jax.export`): servable from any JAX-compatible
        runtime without this package's model code. Returns the written path.

        The exported function takes ONE argument — the preprocessed batch
        ``(batch, *transform_output_shape) float32`` — and returns logits.
        """
        import jax.export as jex

        x = np.asarray(self.transform(self._payload(sample_clip)), np.float32)
        spec = jax.ShapeDtypeStruct((batch,) + x.shape, jnp.float32)

        variables = self.variables

        @jax.jit
        def fwd(xb):
            return self.model.apply(variables, xb, train=False)

        blob = jex.export(fwd)(spec).serialize()
        with open(path, "wb") as f:
            f.write(blob)
        return path

    @staticmethod
    def load_exported(path: str):
        """Load a `export_stablehlo` artifact; returns a callable
        (batch, ...) float32 → logits."""
        import jax.export as jex

        with open(path, "rb") as f:
            exported = jex.deserialize(f.read())
        return lambda xb: exported.call(jnp.asarray(xb, jnp.float32))


class BatchingQueue:
    """Dynamic request batching for concurrent serving.

    The device wants exactly one in-flight forward with requests coalesced
    into the largest ready bucket: measured on v5e (COVERAGE.md), a batch-16
    forward costs 189 ms vs 53 ms at batch 1, so coalescing multiplies
    throughput ~4.5× under concurrent load while adding at most
    ``max_wait_ms`` of queueing latency.

    - ``submit(clip)`` → ``Future`` resolving to the clip's logits row. The
      numpy preprocessing (the Predictor's transform) runs in the CALLER's
      thread, so it parallelizes across request threads; only the device
      forward is serialized through the dispatcher.
    - One dispatcher thread drains the queue: it launches as soon as either
      ``max_batch`` requests are pending or the oldest has waited
      ``max_wait_ms``, groups by transformed shape (defensive — one model's
      eval transform yields one shape), pads to the Predictor's bucket and
      runs ONE compiled forward per group.
    - ``close()`` serves everything already submitted, then stops the
      dispatcher.
    """

    def __init__(self, predictor: Predictor, max_batch: int = 16,
                 max_wait_ms: float = 5.0, max_inflight: int = 3):
        self.predictor = predictor
        self.max_batch = int(max_batch)
        self.max_wait = float(max_wait_ms) / 1e3
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        self._closed = False
        self.stats = {"requests": 0, "batches": 0, "rows": 0}
        # Async completion pipeline (round-4, SERVE_r03 postmortem): the
        # dispatcher used to materialize each batch's logits synchronously,
        # so the device idled during every host↔device round trip (~28 ms
        # through the relay) AND the queue drained in partial batches while
        # the dispatcher was blocked (9 batches averaging 7 clips for a
        # 64-request burst). Now the dispatcher only *launches* the compiled
        # forward (async JAX dispatch) and hands the on-device result to a
        # completion thread; while one batch computes, the dispatcher is
        # already coalescing the next — batches fill, round trips overlap
        # compute. `max_inflight` bounds queued device work (memory + tail
        # latency).
        self._done_q: queue.SimpleQueue = queue.SimpleQueue()
        self._inflight = threading.Semaphore(int(max_inflight))
        # upload+dispatch itself costs a fixed ~28 ms through the relay and
        # releases the GIL — a small pool overlaps those round trips across
        # batches instead of serializing them in the dispatcher thread
        from concurrent.futures import ThreadPoolExecutor

        self._dispatch_pool = ThreadPoolExecutor(
            max_workers=int(max_inflight), thread_name_prefix="serve-dispatch")
        self._completer = threading.Thread(
            target=self._complete_loop, name="serve-completer", daemon=True)
        self._completer.start()
        self._thread = threading.Thread(
            target=self._loop, name="serve-batcher", daemon=True)
        self._thread.start()

    # -- API -----------------------------------------------------------------
    def submit(self, clip) -> Future:
        if self._closed:
            raise RuntimeError("BatchingQueue is closed")
        p = self.predictor
        x = np.asarray(p.transform(p._payload(clip)), np.float32)
        fut: Future = Future()
        self.stats["requests"] += 1
        self._q.put((x, fut))
        return fut

    def predict_topk(self, clip, k: int = 5):
        """Blocking convenience: one clip → (class_ids, softmax_scores)."""
        logits = self.submit(clip).result()
        probs = _softmax_np(logits)
        idx = np.argsort(-logits)[:k]
        return idx, probs[idx]

    def close(self) -> None:
        """Serve all already-submitted requests, then stop the dispatcher."""
        self._closed = True
        self._q.put(None)
        self._thread.join()
        self._dispatch_pool.shutdown(wait=True)
        self._done_q.put(None)
        self._completer.join()

    # -- dispatcher ------------------------------------------------------------
    def _loop(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            batch = [item]
            deadline = time.monotonic() + self.max_wait
            stop = False
            acquired = False
            while len(batch) < self.max_batch and not stop:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    # soft deadline passed: launch as soon as the device can
                    # accept work; while it can't, keep coalescing — a
                    # partial batch gains nothing by queueing behind a full
                    # in-flight one, and every extra dispatch costs a fixed
                    # ~28 ms host↔device round trip through the relay
                    if self._inflight.acquire(blocking=False):
                        acquired = True
                        break
                    timeout = 0.002
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    continue
                if nxt is None:
                    stop = True
                else:
                    batch.append(nxt)
            self._dispatch_pool.submit(self._run, batch, acquired)
            if stop:
                return

    def _run(self, batch, acquired: bool = False) -> None:
        # Runs on the dispatch pool, whose futures nobody awaits — so ANY
        # uncaught exception here would vanish, leaking the in-flight token
        # and hanging every client future in the batch. The outer try is the
        # last line of defense for the unguarded host work (grouping,
        # np.stack, bucketing).
        try:
            groups: dict = {}
            for x, fut in batch:
                groups.setdefault(x.shape, []).append((x, fut))
            p = self.predictor
            for shape, items in groups.items():
                n = len(items)
                b = p._bucket(n)
                xp = np.zeros((b,) + shape, np.float32)
                xp[:n] = np.stack([x for x, _ in items])
                if acquired:
                    acquired = False
                else:
                    self._inflight.acquire()
                try:
                    # async dispatch: returns immediately with an on-device
                    # result; materialization happens on the completion thread
                    dev = p._fn(b, shape)(p.variables, jnp.asarray(xp))
                except Exception as e:  # pragma: no cover - device failure path
                    self._inflight.release()
                    for _, fut in items:
                        fut.set_exception(e)
                    continue
                self._done_q.put((dev, items))
        except Exception as e:  # pragma: no cover - host-side failure path
            if acquired:
                self._inflight.release()
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)

    def _complete_loop(self) -> None:
        while True:
            item = self._done_q.get()
            if item is None:
                return
            dev, items = item
            try:
                logits = np.asarray(dev)[: len(items)]
            except Exception as e:  # pragma: no cover - device failure path
                self._inflight.release()
                for _, fut in items:
                    fut.set_exception(e)
                continue
            self._inflight.release()
            self.stats["batches"] += 1
            self.stats["rows"] += len(items)
            # per-batch fill sizes: the coalescing diagnostic (small batches
            # under load ⇒ dispatches pay the fixed RTT without amortizing it)
            self.stats.setdefault("batch_sizes", []).append(len(items))
            for i, (_, fut) in enumerate(items):
                fut.set_result(logits[i])
