"""Reporting: loss/acc curve PNGs, final top-k table, per-class confusion CSV.

≡ reference `hwgat/utils.py:144-161, 292-350`.
"""

from __future__ import annotations

import csv

import numpy as np


def plot_results(train_list, val_list, option, y_label, save_path):
    """Overwrite a curve PNG each epoch. ≡ `utils.py:292-307`."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = list(range(len(train_list)))
    plt.grid()
    plt.plot(x, train_list, label=f"train {option}")
    plt.plot(x, val_list, label=f"validation {option}")
    plt.legend()
    plt.xlabel("epochs")
    plt.ylabel(y_label)
    plt.title(f"{option} curve")
    plt.savefig(save_path)
    plt.cla()
    plt.close()


def show_final_result(results: dict, k: int = 1):
    """Print the final train/val/test table. ≡ `utils.py:309-322`."""
    print("=" * 89)
    print(
        f"train acc {results['train'][1]:5.4f} | val acc {results['val'][1]:5.4f} "
        f"| test acc {results['test'][1]:5.4f}"
    )
    print(
        f"train loss {results['train'][0]:2.4f} | val loss {results['val'][0]:2.4f} "
        f"| test loss {results['test'][0]:2.4f}"
    )
    print("=" * 89)


def read_class_map(path: str) -> dict[int, str]:
    class_map = {}
    with open(path) as f:
        reader = csv.reader(f)
        next(reader)
        for row in reader:
            class_map[int(row[0])] = row[1]
    return class_map


def gen_cm_w(y_true, y_pred, class_map: dict[int, str], save_path: str):
    """Per-class confusion CSV with prediction breakdown. ≡ `utils.py:324-350`."""
    n = len(class_map)
    cm = np.zeros((n, n))
    for tr, pr in zip(y_true, y_pred):
        cm[tr, pr] += 1
    with open(save_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["word", "total", "predicted"])
        for i, row in enumerate(cm):
            total = row.sum()
            predicted = "".join(
                f"word-{class_map[j]}({row[j]}) " for j in range(n) if row[j] > 0
            )
            writer.writerow([f"Word-{class_map[i]}", str(total), predicted])
