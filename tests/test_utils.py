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


def test_window_attention_cost_accounting():
    from sl_hwgat_tpu.utils.profiling import window_attention_cost

    c = window_attention_cost(units=8, tokens=32, head_dim=64, nnz=164, stack=4)
    assert c.edges == 8 * 164
    # 2 supertiles, each 2 matmuls of (128,128,64)
    assert c.dense_flops == 2 * 2 * (2 * 128 * 128 * 64)
    assert c.sparse_flops == 8 * 164 * 4 * 64
    assert c.bytes_min == 8 * 32 * 64 * 4 * 4


def test_hwgate_forward_cost_totals():
    from sl_hwgat_tpu.utils.profiling import hwgate_forward_cost

    t = hwgate_forward_cost(batch=16)
    # 8 blocks, each 12288 units (stage-invariant: B·(f/TP)·nW·h is constant
    # because f halves while heads double)
    nnz = t["edges"] // (8 * 12288)
    assert t["edges"] == 8 * 12288 * nnz
    assert t["dense_flops"] > t["sparse_flops"] > 0


def test_timeit_and_trace_smoke(tmp_path):
    import jax
    import jax.numpy as jnp

    from sl_hwgat_tpu.utils.profiling import timeit, trace

    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((8, 8))
    dt = timeit(f, x, warmup=1, iters=3)
    assert dt > 0
    with trace(str(tmp_path / "tr")):
        jax.block_until_ready(f(x))
    import os
    assert os.path.isdir(str(tmp_path / "tr"))
