"""Alternate unbatched inference path with composite multi-class targets.

≡ reference `hwgat/inference.py:10-124`: targets are digit-encoded composites
(first digit = number of sub-classes, then 4-digit class ids); a sample counts
as correct when every sub-class appears in the top-5 predictions.
"""

from __future__ import annotations

import numpy as np


def decode_classes(target: int) -> tuple[int, list[int]]:
    """≡ `inference.py:74-81`."""
    s = str(target)
    num_cls = int(s[0])
    s = s[1:]
    return num_cls, [int(s[i * 4 : i * 4 + 4]) for i in range(num_cls)]


def evaluate_composite(apply_fn, variables, dataset, top: int = 5) -> float:
    """Unbatched composite-target eval. ≡ `inference.py:83-112`.

    ``dataset.get(i)`` must return (feat (T,V,C), composite_target int).
    Samples with target 0 are excluded from the denominator.
    """
    import jax.numpy as jnp

    correct, length = 0, len(dataset)
    for i in range(len(dataset)):
        feat, target = dataset.get(i)
        if int(target) == 0:
            length -= 1
            continue
        logits = np.asarray(apply_fn(variables, jnp.asarray(feat)[None]))[0]
        prediction = np.argsort(logits)[::-1][:top].tolist()
        num_cls, all_cls = decode_classes(int(target))
        if sum(c in prediction for c in all_cls) == num_cls:
            correct += 1
    return correct / max(length, 1)


def show_final_result_composite(apply_fn, variables, loaders: dict, top: int = 5):
    """≡ `inference.py:114-124`."""
    accs = {split: evaluate_composite(apply_fn, variables, ds, top) for split, ds in loaders.items()}
    print("=" * 89)
    print(
        f"train acc {accs.get('train', 0):5.4f} | val acc {accs.get('val', 0):5.4f} "
        f"| test acc {accs.get('test', 0):5.4f}"
    )
    print("=" * 89)
    return accs
