"""Predictor serving API: checkpoint → bucketed compiled inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    """Train-free checkpoint: init HWGATE at the SYNTH config and save."""
    from sl_hwgat_tpu.constants import DATASET_PARAMS
    from sl_hwgat_tpu.models import build_model
    from sl_hwgat_tpu.train.checkpoint import save_checkpoint
    from sl_hwgat_tpu.train.loop import init_state

    ds = DATASET_PARAMS["SYNTH"]
    model = build_model("HWGATE", ds, 2)

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 5e-4

    state, _ = init_state(model, Cfg, (ds["src_len"], 64, 2), ("dropout",))
    path = str(tmp_path_factory.mktemp("serve") / "model.ckpt")
    save_checkpoint(path, state, 5e-4)
    return path, ds


def _clips(ds, n, rng):
    # raw extractor layout: variable frame counts, (F, 543, 4)
    return [rng.normal(size=(int(f), 543, 4)).astype(np.float32)
            for f in rng.integers(ds["src_len"] // 2, ds["src_len"] * 2, size=n)]


def test_predict_topk_and_bucketing(ckpt):
    from sl_hwgat_tpu.serve import Predictor

    path, ds = ckpt
    pred = Predictor.from_checkpoint(path, model_type="HWGATE", dataset="SYNTH",
                                     batch_buckets=(2, 4))
    rng = np.random.default_rng(0)
    clips = _clips(ds, 3, rng)
    out = pred.predict_topk(clips, k=5)
    assert len(out) == 3
    for ids, scores in out:
        assert ids.shape == (5,) and scores.shape == (5,)
        assert np.all(scores[:-1] >= scores[1:])  # sorted
        assert np.all(ids < ds["num_class"])
    # 3 clips land in the 4-bucket; a single clip lands in the 2-bucket —
    # exactly two compilations total
    pred.predict_topk(clips[:1], k=1)
    assert len(pred._compiled) == 2


def test_padding_does_not_change_results(ckpt):
    from sl_hwgat_tpu.serve import Predictor

    path, ds = ckpt
    pred = Predictor.from_checkpoint(path, model_type="HWGATE", dataset="SYNTH",
                                     batch_buckets=(4,))
    rng = np.random.default_rng(1)
    clips = _clips(ds, 4, rng)
    full = pred.predict_logits(clips)
    partial = pred.predict_logits(clips[:2])  # padded to the same bucket
    np.testing.assert_allclose(partial, full[:2], atol=1e-5)


def test_batching_queue_coalesces_and_matches_direct(ckpt):
    """Concurrent submits coalesce into few device batches; every future's
    row equals the direct single-clip prediction (padding-invariant)."""
    from concurrent.futures import ThreadPoolExecutor

    from sl_hwgat_tpu.serve import BatchingQueue, Predictor

    path, ds = ckpt
    pred = Predictor.from_checkpoint(path, model_type="HWGATE", dataset="SYNTH",
                                     batch_buckets=(2, 8))
    q = BatchingQueue(pred, max_batch=8, max_wait_ms=500.0)
    rng = np.random.default_rng(7)
    clips = _clips(ds, 6, rng)
    try:
        with ThreadPoolExecutor(max_workers=6) as ex:
            futs = list(ex.map(q.submit, clips))
        rows = [f.result(timeout=120) for f in futs]
    finally:
        q.close()
    want = pred.predict_logits(clips)
    for i, row in enumerate(rows):
        np.testing.assert_allclose(row, want[i], atol=1e-5)
    assert q.stats["rows"] == 6
    # 6 near-simultaneous requests inside a 500ms window must coalesce into
    # fewer forwards than requests (the point of the queue)
    assert q.stats["batches"] < 6


def test_batching_queue_close_serves_pending_then_rejects(ckpt):
    from sl_hwgat_tpu.serve import BatchingQueue, Predictor

    path, ds = ckpt
    pred = Predictor.from_checkpoint(path, model_type="HWGATE", dataset="SYNTH",
                                     batch_buckets=(2,))
    q = BatchingQueue(pred, max_batch=4, max_wait_ms=1.0)
    clip = _clips(ds, 1, np.random.default_rng(9))[0]
    fut = q.submit(clip)
    q.close()
    assert fut.result(timeout=120).shape == (ds["num_class"],)
    with pytest.raises(RuntimeError):
        q.submit(clip)


def test_batching_queue_topk_convenience(ckpt):
    from sl_hwgat_tpu.serve import BatchingQueue, Predictor

    path, ds = ckpt
    pred = Predictor.from_checkpoint(path, model_type="HWGATE", dataset="SYNTH",
                                     batch_buckets=(2,))
    q = BatchingQueue(pred, max_batch=2, max_wait_ms=1.0)
    clip = _clips(ds, 1, np.random.default_rng(11))[0]
    try:
        ids, scores = q.predict_topk(clip, k=3)
    finally:
        q.close()
    assert ids.shape == (3,) and scores.shape == (3,)
    assert np.all(scores[:-1] >= scores[1:])
    direct_ids, direct_scores = pred.predict_topk([clip], k=3)[0]
    np.testing.assert_array_equal(ids, direct_ids)
    np.testing.assert_allclose(scores, direct_scores, atol=1e-6)


def test_stablehlo_export_roundtrip(ckpt, tmp_path):
    """Exported StableHLO artifact reproduces the Predictor's logits without
    any model code (weights baked into the serialized computation)."""
    from sl_hwgat_tpu.serve import Predictor

    path, ds = ckpt
    pred = Predictor.from_checkpoint(path, model_type="HWGATE", dataset="SYNTH",
                                     batch_buckets=(2,))
    rng = np.random.default_rng(3)
    clips = _clips(ds, 2, rng)
    want = pred.predict_logits(clips)

    art = str(tmp_path / "hwgate_b2.stablehlo")
    pred.export_stablehlo(art, batch=2, sample_clip=clips[0])
    fn = Predictor.load_exported(art)

    xs = np.stack([np.asarray(pred.transform(pred._payload(c)), np.float32)
                   for c in clips])
    got = np.asarray(fn(xs))
    np.testing.assert_allclose(got, want, atol=1e-5)
