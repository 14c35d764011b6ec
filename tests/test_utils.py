"""Debug utilities and reporting."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from sl_hwgat_tpu.utils.debug import assert_finite_tree, check_jit_purity
from sl_hwgat_tpu.train.reporting import gen_cm_w, read_class_map


def test_assert_finite_tree():
    assert_finite_tree({"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}})
    with pytest.raises(FloatingPointError) as e:
        assert_finite_tree({"a": jnp.asarray([1.0, np.nan])}, name="params")
    assert "a" in str(e.value)


def test_check_jit_purity_detects_leak():
    def pure(x):
        return x * 2

    check_jit_purity(pure, jnp.ones(3))

    counter = {"n": 0}

    def impure(x):
        counter["n"] += 1
        return x * counter["n"]

    with pytest.raises(RuntimeError):
        check_jit_purity(impure, jnp.ones(3))


def test_confusion_csv_roundtrip(tmp_path):
    class_map = {0: "hello", 1: "world", 2: "sign"}
    path = tmp_path / "cm.csv"
    gen_cm_w([0, 0, 1, 2, 2], [0, 1, 1, 2, 0], class_map, str(path))
    text = path.read_text()
    assert "Word-hello" in text and "word-world(1.0)" in text

    cm_path = tmp_path / "class_map.csv"
    cm_path.write_text("class,word\n0,hello\n1,world\n")
    assert read_class_map(str(cm_path)) == {0: "hello", 1: "world"}
