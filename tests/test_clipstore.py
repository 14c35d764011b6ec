"""Clip store (native C++ mmap reader + numpy fallback): format roundtrip,
backend equality, dataset/loader integration, preprocess marker flow."""

import pickle

import numpy as np
import pytest

from sl_hwgat_tpu.data.clipstore import ClipStore, write_clipstore, _native_lib


def _mapping(seed=0, n=7):
    r = np.random.default_rng(seed)
    out = {}
    for i in range(n):
        t = int(r.integers(3, 40))
        out[f"{i:07d}"] = r.normal(size=(t, 29, 2)).astype(np.float32)
    return out


def test_roundtrip_numpy_backend(tmp_path):
    m = _mapping()
    path = str(tmp_path / "clips.cs")
    write_clipstore(path, m)
    store = ClipStore(path, force_numpy=True)
    assert store.backend == "numpy"
    assert len(store) == len(m)
    for vid, arr in m.items():
        assert vid in store
        np.testing.assert_array_equal(store[vid], arr)


def test_native_backend_matches_numpy(tmp_path):
    if _native_lib() is None:
        pytest.skip("no C++ toolchain available")
    m = _mapping(seed=1)
    path = str(tmp_path / "clips.cs")
    write_clipstore(path, m)
    native = ClipStore(path)
    fallback = ClipStore(path, force_numpy=True)
    assert native.backend == "native"
    for vid in m:
        np.testing.assert_array_equal(native[vid], fallback[vid])
    native.close()


def test_writes_are_contiguous_and_reopenable(tmp_path):
    m = _mapping(seed=2, n=3)
    path = str(tmp_path / "clips.cs")
    write_clipstore(path, m)
    write_clipstore(path, m)  # overwrite is atomic (tmp + replace)
    store = ClipStore(path, force_numpy=True)
    for vid, arr in m.items():
        np.testing.assert_array_equal(store[vid], arr)


def test_dataset_runs_on_clipstore(tmp_path):
    """KeypointDataset.data_map accepts a ClipStore unchanged."""
    from sl_hwgat_tpu.configs import build_eval_transform
    from sl_hwgat_tpu.data.dataset import KeypointDataset, Loader
    from sl_hwgat_tpu.data.synthetic import write_synthetic_dataset

    write_synthetic_dataset(str(tmp_path / "input"))
    root = tmp_path / "input" / "SYNTH"
    splits = pickle.load(open(root / "vid_splits_SYNTH.pkl", "rb"))
    cls = pickle.load(open(root / "vid_class_SYNTH.pkl", "rb"))
    dmap = pickle.load(open(root / "data_map_SYNTH_keypoints.pkl", "rb"))

    cs_path = str(tmp_path / "synth.cs")
    write_clipstore(cs_path, dmap)
    store = ClipStore(cs_path)

    ids = splits["train"][:8]
    ds_ram = KeypointDataset(ids, dmap, cls, build_eval_transform(32))
    ds_cs = KeypointDataset(ids, store, cls, build_eval_transform(32))
    for i in range(len(ids)):
        a, la = ds_ram.get(i)
        b, lb = ds_cs.get(i)
        np.testing.assert_array_equal(a, b)
        assert la == lb

    loader = Loader(ds_cs, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader.epoch(0))
    assert batches and batches[0][0].shape[0] == 4


def test_preprocess_clipstore_marker_resolves(tmp_path):
    """preprocess(store='clipstore') writes the marker; load_artifacts opens
    the store transparently."""
    import csv as csv_mod

    from sl_hwgat_tpu.data.dataset import load_artifacts
    from sl_hwgat_tpu.data.preprocess import preprocess

    kp_dir = tmp_path / "kp"
    kp_dir.mkdir()
    r = np.random.default_rng(3)
    rows = []
    for i in range(6):
        vid = f"{i:07d}"
        feat = r.normal(size=(12, 543, 4)).astype(np.float32) + 1.0
        with open(kp_dir / f"{vid}.pkl", "wb") as f:
            pickle.dump({"feat": feat, "vid_width": 100, "vid_height": 100}, f)
        rows.append([vid, "d", f"{vid}.mp4", f"w{i % 2}", ["train", "val", "test"][i % 3]])
    meta = tmp_path / "metadata.csv"
    with open(meta, "w", newline="") as f:
        w = csv_mod.writer(f)
        w.writerow(["id", "video_dir", "video_name", "class", "split"])
        w.writerows(rows)

    cfg_data = preprocess(str(meta), "SYNTH", str(kp_dir),
                          input_root=str(tmp_path / "input"), store="clipstore")
    splits, cls, feat_map = load_artifacts(cfg_data)
    assert isinstance(feat_map, ClipStore)
    vid = splits["train"][0]
    assert feat_map[vid].shape[1:] == (29, 2)  # static transform applied
