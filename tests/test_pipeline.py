"""Offline pipeline contract: meta generation → preprocess packing → loader."""

import csv
import os
import pickle

import numpy as np

from sl_hwgat_tpu.data.meta_generators import fdmse_meta, generate_meta, lsa64_meta
from sl_hwgat_tpu.data.preprocess import preprocess


def make_fake_fdmse(root, classes=("hello", "world"), vids_per_class=3):
    for split in ("train", "test"):
        for cls in classes:
            d = os.path.join(root, split, cls)
            os.makedirs(d, exist_ok=True)
            n = vids_per_class if split == "train" else 1
            for i in range(n):
                open(os.path.join(d, f"{cls}_{split}_{i}.mp4"), "w").close()


def make_fake_keypoints(meta_csv, kp_dir, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(kp_dir, exist_ok=True)
    with open(meta_csv) as f:
        reader = csv.reader(f)
        next(reader)
        for row in reader:
            t = int(rng.integers(8, 20))
            feat = rng.uniform(0.1, 0.9, size=(t, 543, 4)).astype(np.float32)
            with open(os.path.join(kp_dir, row[0] + ".pkl"), "wb") as pf:
                pickle.dump(
                    {"feat": feat, "num_frames": t, "vid_width": 640, "vid_height": 480}, pf
                )


def test_meta_then_preprocess_then_load(tmp_path):
    root = tmp_path / "FDMSE"
    make_fake_fdmse(str(root))
    rows, vocab = fdmse_meta(str(root), seed=0)
    assert vocab == ["hello", "world"]
    assert all(len(r) == 5 for r in rows)
    meta_csv = generate_meta(str(root), rows, vocab)
    assert os.path.exists(meta_csv)

    kp_dir = tmp_path / "kp"
    make_fake_keypoints(meta_csv, str(kp_dir))
    cfg = preprocess(meta_csv, "SYNTH", str(kp_dir), input_root=str(tmp_path / "input"))

    # artifacts exist and compose with the loader
    for p in (cfg.vid_split_path, cfg.vid_class_path, cfg.data_map_path, cfg.class_map_path):
        assert os.path.exists(p)
    with open(cfg.data_map_path, "rb") as f:
        data_map = pickle.load(f)
    sample = next(iter(data_map.values()))
    assert sample.shape[1:] == (29, 2)  # PoseSelect applied

    from sl_hwgat_tpu.configs import build_eval_transform
    from sl_hwgat_tpu.data.dataset import KeypointDataset, Loader

    with open(cfg.vid_split_path, "rb") as f:
        splits = pickle.load(f)
    with open(cfg.vid_class_path, "rb") as f:
        cls_map = pickle.load(f)
    ds = KeypointDataset(splits["train"], data_map, cls_map, build_eval_transform(16))
    loader = Loader(ds, batch_size=4, num_workers=1)
    x, y, valid = next(iter(loader.epoch(0)))
    assert x.shape == (4, 16, 64, 2)
    assert valid.sum() <= 4


def test_lsa64_adapter(tmp_path):
    root = tmp_path / "LSA64"
    os.makedirs(root / "all", exist_ok=True)
    for cls in ("001", "002"):
        for s in range(2):
            for r in range(5):
                open(root / "all" / f"{cls}_{s:03d}_{r:03d}.mp4", "w").close()
    rows, vocab = lsa64_meta(str(root), seed=0)
    assert vocab == ["001", "002"]
    splits = {r[4] for r in rows}
    assert splits == {"train", "val", "test"}
