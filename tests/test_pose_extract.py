"""Pose-extraction driver logic with a fake backend and fake frame decoder:
idempotent pickling, payload contract, broken-video tolerance."""

import os
import pickle

import numpy as np

import sl_hwgat_tpu.data.pose_extract as px


class FakePose:
    def __call__(self, image):
        h, w = image.shape[:2]
        return np.full((543, 4), 0.5, np.float32), h, w


def fake_frames(path):
    if "broken" in path:
        raise RuntimeError("decode error")
    for _ in range(5):
        yield np.zeros((48, 64, 3), np.uint8)


def test_extract_one_payload_and_idempotence(tmp_path, monkeypatch):
    monkeypatch.setattr(px, "_frames", fake_frames)
    job = {"id": "vid0", "video_dir": "a/b.mp4", "video_name": "b.mp4", "root": str(tmp_path)}
    out = px.extract_one(job, str(tmp_path / "kp"), pose_model=FakePose())
    assert out is not None and os.path.exists(out)
    with open(out, "rb") as f:
        payload = pickle.load(f)
    assert payload["feat"].shape == (5, 543, 4)
    assert payload["num_frames"] == 5
    assert payload["vid_width"] == 64 and payload["vid_height"] == 48
    assert payload["vid_name"] == "b.mp4"

    # idempotent: existing pkl is not re-extracted (mtime unchanged)
    mtime = os.path.getmtime(out)
    out2 = px.extract_one(job, str(tmp_path / "kp"), pose_model=FakePose())
    assert out2 == out and os.path.getmtime(out) == mtime


def test_extract_one_broken_video_skipped(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(px, "_frames", fake_frames)
    job = {"id": "bad", "video_dir": "broken.mp4", "video_name": "broken.mp4", "root": str(tmp_path)}
    out = px.extract_one(job, str(tmp_path / "kp"), pose_model=FakePose())
    assert out is None
    assert "failed" in capsys.readouterr().out
    assert not os.path.exists(tmp_path / "kp" / "bad.pkl")


def test_read_metadata(tmp_path):
    meta = tmp_path / "metadata.csv"
    meta.write_text("id,video_dir,video_name,class,split\n0,a/x.mp4,x.mp4,hello,train\n")
    jobs = px.read_metadata(str(meta), "/root/videos")
    assert jobs == [{"id": "0", "video_dir": "a/x.mp4", "video_name": "x.mp4", "root": "/root/videos"}]
