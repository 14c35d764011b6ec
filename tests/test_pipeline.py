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


def test_fdmse_csv_adapter(tmp_path):
    root = tmp_path / "F"
    os.makedirs(root / "vids" / "d", exist_ok=True)
    for n in ("a.mp4", "b.mp4"):
        open(root / "vids" / "d" / n, "w").close()
    split = root / "metadata.csv"
    split.write_text(
        "id,dir,name,class,split\n"
        "0,vids/d,a.mp4,hello,train\n"
        "1,vids/d,b.mp4,world,test\n"
        "2,vids/d,missing.mp4,ghost,train\n"   # file absent → dropped
        "3,vids/d,a.mp4,hello,x\n"             # trivial split field → id consumed, row dropped
    )
    from sl_hwgat_tpu.data.meta_generators import fdmse_meta_from_csv

    rows, vocab = fdmse_meta_from_csv(str(root), str(split))
    assert vocab == ["hello", "world"]
    assert [r[0] for r in rows] == ["0000000", "0000001"]
    assert rows[0][1] == "vids/d/a.mp4"


def test_wlasl_adapter(tmp_path):
    import json

    root = tmp_path / "WLASL"
    os.makedirs(root / "videos", exist_ok=True)
    content = [
        {"gloss": "Book", "instances": [
            {"video_id": "00001", "split": "train"},
            {"video_id": "00002", "split": "test"},
            {"video_id": "99999", "split": "train"},  # file missing → skipped
        ]},
        {"gloss": "drink", "instances": [{"video_id": "00003", "split": "val"}]},
    ]
    (root / "WLASL_v0.3.json").write_text(json.dumps(content))
    for vid in ("00001", "00002", "00003"):
        open(root / "videos" / f"{vid}.mp4", "w").close()
    from sl_hwgat_tpu.data.meta_generators import wlasl_subset_meta

    rows, vocab = wlasl_subset_meta(str(root), subset=2)
    assert vocab == ["book", "drink"]
    assert len(rows) == 3  # missing file dropped
    assert {r[4] for r in rows} == {"train", "val", "test"}


def test_autsl_adapter(tmp_path):
    root = tmp_path / "AUTSL"
    os.makedirs(root, exist_ok=True)
    (root / "train_labels.csv").write_text("signer1_sample1,5\nsigner1_sample2,7\n")
    (root / "test_labels.csv").write_text("signer2_sample1,5\n")
    from sl_hwgat_tpu.data.meta_generators import autsl_meta

    rows, vocab = autsl_meta(str(root))
    assert vocab == ["5", "7"]
    assert len(rows) == 3
    assert rows[0][1].endswith("_color.mp4")


def test_msasl_adapter(tmp_path):
    import json

    root = tmp_path / "MSASL"
    os.makedirs(root, exist_ok=True)
    (root / "MSASL_train.json").write_text(json.dumps([
        {"label": 0, "clean_text": "Hello", "file": "a"},
        {"label": 5, "clean_text": "rare", "file": "b"},   # beyond subset → dropped
    ]))
    (root / "MSASL_test.json").write_text(json.dumps([
        {"label": 1, "clean_text": "world", "file": "c"},
    ]))
    from sl_hwgat_tpu.data.meta_generators import msasl_subset_meta

    rows, vocab = msasl_subset_meta(str(root), subset=2)
    assert vocab == ["hello", "world"]
    assert len(rows) == 2


def test_include_adapter(tmp_path):
    root = tmp_path / "INC"
    vids = root / "INCLUDE" / "Adjectives" / "1. happy"
    os.makedirs(vids, exist_ok=True)
    names = []
    for i in range(4):
        n = f"clip{i}.MOV"
        open(vids / n, "w").close()
        names.append(f"Adjectives/1. happy/{n}")
    split = root / "Train_Test_Split"
    os.makedirs(split, exist_ok=True)
    header = "a,b,c,path\n"
    (split / "train_include.csv").write_text(header + "".join(f"x,y,z,{n}\n" for n in names[:3]))
    (split / "test_include.csv").write_text(header + f"x,y,z,{names[3]}\n")
    from sl_hwgat_tpu.data.meta_generators import include_meta

    rows, vocab = include_meta(str(root), seed=0)
    assert vocab == ["happy"]
    assert len(rows) == 4
    assert {r[4] for r in rows} == {"train", "val", "test"}


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
