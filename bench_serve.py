"""Serving-latency benchmark: Predictor end-to-end (host preprocessing +
compiled device forward) at each batch bucket, on whatever backend is live.

Prints one JSON line: {"impl": "serve", "per_bucket_ms": {...}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np

    import jax

    if os.environ.get("BENCH_NO_CACHE") != "1":
        # persistent compile cache (same rationale as bench_kernel.py): the
        # Predictor compiles one forward per batch bucket, ~2 min each
        # through the relay — cached, a re-run costs seconds
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if os.environ.get("BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from sl_hwgat_tpu.constants import DATASET_PARAMS
    from sl_hwgat_tpu.models import build_model
    from sl_hwgat_tpu.serve import Predictor
    from sl_hwgat_tpu.train.checkpoint import save_checkpoint
    from sl_hwgat_tpu.train.loop import init_state

    ds_name = sys.argv[1] if len(sys.argv) > 1 else "FDMSE-ISL"
    ds = DATASET_PARAMS[ds_name]
    # serving runs the bf16 fast path by default (argmax/top-k is insensitive
    # to bf16 logit rounding; SL_SERVE_DTYPE=float32 opts out)
    overrides = {}
    if os.environ.get("SL_SERVE_DTYPE", "bfloat16") == "bfloat16":
        overrides["compute_dtype"] = "bfloat16"
    model = build_model("HWGATE", ds, 2, **overrides)

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 5e-4

    state, _ = init_state(model, Cfg, (ds["src_len"], 64, 2), ("dropout",))
    path = os.path.join(tempfile.mkdtemp(prefix="serve_"), "model.ckpt")
    save_checkpoint(path, state, 5e-4)

    # Bucket ladder through 64 (VERDICT r4 item 6): the relay RTT is a fixed
    # ~28 ms per dispatch, so larger eval batches amortize it toward the
    # device's own rate; compiles are one-time (persistent cache).
    buckets = tuple(int(b) for b in
                    os.environ.get("SERVE_BUCKETS", "1,8,16,32,64").split(","))
    pred = Predictor.from_checkpoint(path, model_type="HWGATE", dataset=ds_name,
                                     batch_buckets=buckets, **overrides)
    rng = np.random.default_rng(0)

    def clip():
        return {"feat": rng.uniform(size=(ds["src_len"], 543, 4)).astype(np.float32),
                "vid_width": 640, "vid_height": 480}

    pred.warmup(clip())
    out = {}
    for b in buckets:
        clips = [clip() for _ in range(b)]
        pred.predict_topk(clips, k=5)  # warm the exact path
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            pred.predict_topk(clips, k=5)
        per = (time.perf_counter() - t0) / reps
        out[str(b)] = round(per * 1e3, 2)

    # Concurrent-load throughput through the BatchingQueue — the round-5
    # regime: 128 requests from 32 client threads, 32-clip coalescing, the
    # async pipeline keeping ≥2 batches in flight so dispatch RTTs overlap
    # device compute (target ≥200 clips/s sustained).
    from concurrent.futures import ThreadPoolExecutor

    from sl_hwgat_tpu.serve import BatchingQueue

    n_req = int(os.environ.get("SERVE_REQUESTS", "128"))
    n_cli = int(os.environ.get("SERVE_CLIENTS", "32"))
    max_batch = int(os.environ.get("SERVE_MAX_BATCH", "32"))
    queue = BatchingQueue(pred, max_batch=max_batch,
                          max_wait_ms=float(os.environ.get("SERVE_MAX_WAIT", "10")),
                          max_inflight=int(os.environ.get("SERVE_MAX_INFLIGHT", "3")))
    reqs = [clip() for _ in range(n_req)]
    queue.submit(reqs[0]).result()  # warm

    def timed_call(req):
        s = time.perf_counter()
        queue.submit(req).result()
        return time.perf_counter() - s

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=n_cli) as ex:
        lat = list(ex.map(timed_call, reqs))
    q_wall = time.perf_counter() - t0
    queue.close()
    lat_ms = np.sort(np.asarray(lat)) * 1e3

    print(json.dumps({"impl": "serve", "model": "HWGATE", "dataset": ds_name,
                      "per_bucket_ms": out,
                      "clips_per_sec_b16": round(16 / (out["16"] / 1e3), 1)
                      if "16" in out else None,
                      "clips_per_sec_bmax": round(
                          buckets[-1] / (out[str(buckets[-1])] / 1e3), 1),
                      "queue": {"requests": n_req, "clients": n_cli,
                                "max_batch": max_batch},
                      "queue_clips_per_sec": round(n_req / q_wall, 1),
                      "queue_batches": queue.stats["batches"],
                      "queue_batch_sizes": queue.stats.get("batch_sizes"),
                      "queue_p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
                      "queue_p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
                      "queue_speedup_vs_serial_b1": round(
                          (out["1"] / 1e3) * n_req / q_wall, 2)}))


if __name__ == "__main__":
    main()
