"""Composite-target inference path (train/inference.py) — functional tests
vs reference semantics (`hwgat/inference.py:83-124`): top-5 containment of
EVERY decoded sub-class, target-0 exclusion from the denominator.
"""

import numpy as np

from sl_hwgat_tpu.train.inference import (
    decode_classes,
    evaluate_composite,
    show_final_result_composite,
)


class FakeDataset:
    """(feat, composite_target) pairs; feat's first value selects the logits
    row the fake model returns."""

    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def get(self, i):
        return self.items[i]


def fake_apply(num_classes=10):
    # logits rank classes by id shifted by the feature's first element:
    # feature j → top-5 = [j, j+1, j+2, j+3, j+4] (mod num_classes)
    def apply_fn(variables, x):
        j = int(np.asarray(x)[0].ravel()[0])
        logits = np.zeros((1, num_classes), np.float32)
        for rank, c in enumerate([(j + d) % num_classes for d in range(num_classes)]):
            logits[0, c] = num_classes - rank
        return logits

    return apply_fn


def feat(j):
    return np.full((4, 2, 2), float(j), np.float32)


def test_decode_multi():
    assert decode_classes(200120345) == (2, [12, 345])
    assert decode_classes(10007) == (1, [7])
    assert decode_classes(3000102000030) == (3, [1, 200, 30])


def test_composite_all_subclasses_must_hit_top5():
    ds = FakeDataset([
        (feat(0), 10003),       # class 3 ∈ top5 {0..4} → correct
        (feat(0), 10007),       # class 7 ∉ top5 → wrong
        (feat(0), 200010004),   # classes 1,4 both ∈ top5 → correct
        (feat(0), 200010005),   # class 5 ∉ top5 → wrong
    ])
    acc = evaluate_composite(fake_apply(), None, ds, top=5)
    assert acc == 0.5


def test_composite_target_zero_excluded():
    ds = FakeDataset([
        (feat(0), 0),       # excluded from denominator
        (feat(0), 10002),   # correct
    ])
    assert evaluate_composite(fake_apply(), None, ds, top=5) == 1.0


def test_show_final_result_composite(capsys):
    ds = FakeDataset([(feat(0), 10002)])
    accs = show_final_result_composite(fake_apply(), None, {"test": ds}, top=5)
    out = capsys.readouterr().out
    assert accs["test"] == 1.0
    assert "test acc 1.0000" in out
