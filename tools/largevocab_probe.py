"""SYNTH-2000 learnability ceiling probes (VERDICT r4 item 1).

The large-vocab anchor (BASELINE config 4 proxy: 2000 classes, 2 train /
1 val / 1 test clips per class, full augmentation) trained to only 0.3%
val top-1 in round 4. Before re-tuning the training regime, this tool
establishes how much signal the data actually carries *through the exact
transform pipelines the model sees*:

  - nearest-centroid probe (2-shot classifier on eval-transform features)
  - ridge linear probe on eval-transform features
  - ridge linear probe trained on AUGMENTED train-transform features
    (what the network is actually asked to generalize from)

Usage: python tools/largevocab_probe.py [data_root] [out.json]
Writes a JSON report; runs on CPU (NumPy only).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sl_hwgat_tpu.configs import DataConfig, build_eval_transform, build_train_transform
from sl_hwgat_tpu.data.dataset import KeypointDataset, load_artifacts
from sl_hwgat_tpu.data.synthetic import write_synthetic_dataset

SRC_LEN = 64
SEED = 1001


def materialize(ds: KeypointDataset, epochs: tuple[int, ...] = (0,)):
    """Apply the dataset's transform to every clip for each epoch tag."""
    feats, labels = [], []
    for ep in epochs:
        for i in range(len(ds)):
            f, y = ds.get(i, epoch=ep)
            feats.append(f.reshape(-1))
            labels.append(int(y))
    return np.stack(feats), np.asarray(labels)


def top1(scores: np.ndarray, labels: np.ndarray) -> float:
    return float((scores.argmax(axis=1) == labels).mean())


def centroid_probe(Xtr, ytr, Xva, yva, num_classes):
    d = Xtr.shape[1]
    cent = np.zeros((num_classes, d), np.float64)
    cnt = np.zeros(num_classes)
    np.add.at(cent, ytr, Xtr)
    np.add.at(cnt, ytr, 1)
    cent /= np.maximum(cnt, 1)[:, None]
    # nearest centroid == argmax of (x·c - |c|^2/2)
    scores = Xva @ cent.T - 0.5 * (cent * cent).sum(axis=1)[None, :]
    return top1(scores, yva)


def ridge_probe(Xtr, ytr, Xva, yva, num_classes, lam=1e-2):
    """One-hot ridge regression via normal equations (d x d solve)."""
    Xtr = np.concatenate([Xtr, np.ones((len(Xtr), 1), Xtr.dtype)], axis=1)
    Xva = np.concatenate([Xva, np.ones((len(Xva), 1), Xva.dtype)], axis=1)
    d = Xtr.shape[1]
    G = Xtr.T @ Xtr + lam * len(Xtr) * np.eye(d, dtype=np.float64)
    # accumulate X^T Y without materializing the (n, C) one-hot
    XtY = np.zeros((d, num_classes), np.float64)
    np.add.at(XtY.T, ytr, Xtr)
    W = np.linalg.solve(G, XtY)
    return top1(Xva @ W, yva)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lv/input"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "tools/largevocab_probe.json"
    name = "SYNTH-2000"
    if not os.path.exists(os.path.join(root, name, f"vid_splits_{name}.pkl")):
        print(f"generating {name} under {root} ...", flush=True)
        write_synthetic_dataset(root, name, num_classes=2000, clips_per_class=4)
    dc = DataConfig(name, input_root=root)
    splits, vid_cls, vid_feat = load_artifacts(dc)

    ev = build_eval_transform(SRC_LEN)
    tr = build_train_transform(SRC_LEN)
    t0 = time.time()
    Xtr, ytr = materialize(KeypointDataset(splits["train"], vid_feat, vid_cls, ev, seed=SEED))
    Xva, yva = materialize(KeypointDataset(splits["val"], vid_feat, vid_cls, ev, seed=SEED))
    print(f"eval-transform features: {Xtr.shape} train / {Xva.shape} val "
          f"({time.time()-t0:.1f}s)", flush=True)

    report = {"config": {"classes": 2000, "train_clips": len(ytr),
                         "val_clips": len(yva), "feature_dim": int(Xtr.shape[1])},
              "chance": 1 / 2000}
    t0 = time.time()
    report["centroid_eval_feats"] = centroid_probe(Xtr, ytr, Xva, yva, 2000)
    print(f"nearest-centroid (eval feats): {report['centroid_eval_feats']:.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    report["ridge_eval_feats"] = ridge_probe(Xtr, ytr, Xva, yva, 2000)
    print(f"ridge probe (eval feats):      {report['ridge_eval_feats']:.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # The regime the network actually faces: augmented train views.
    t0 = time.time()
    Xau, yau = materialize(
        KeypointDataset(splits["train"], vid_feat, vid_cls, tr, seed=SEED),
        epochs=(0, 1, 2, 3))
    print(f"augmented features: {Xau.shape} ({time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    report["centroid_aug_train"] = centroid_probe(Xau, yau, Xva, yva, 2000)
    report["ridge_aug_train"] = ridge_probe(Xau, yau, Xva, yva, 2000)
    print(f"centroid (aug train): {report['centroid_aug_train']:.4f} | "
          f"ridge (aug train): {report['ridge_aug_train']:.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
