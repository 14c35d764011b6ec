"""Hybrid attention (XLA GEMMs + fused Pallas masked-softmax) vs the stacked
oracle: forward, gradients, prune, and dual-mask (tail) modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sl_hwgat_tpu import graphs
from sl_hwgat_tpu.ops.attention import stacked_window_attention
from sl_hwgat_tpu.ops.hybrid_attention import hybrid_window_attention

ADJ32 = graphs.windowed_block_adj(2)[0]


def qkv(u, n, dh, seed=0):
    r = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(r.normal(size=(u, n, dh)).astype(np.float32)) for _ in range(3)
    )


def test_forward_matches_stacked():
    q, k, v = qkv(16, 32, 64)
    got = hybrid_window_attention(q, k, v, ADJ32, scale=0.125, stack=4)
    want = stacked_window_attention(q, k, v, ADJ32, scale=0.125, stack=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("prune_u", [None, 0.05])
def test_gradients_match(prune_u):
    q, k, v = qkv(8, 32, 16, seed=3)

    def mk(fn):
        def loss(q, k, v):
            o = fn(q, k, v, ADJ32, scale=0.25, stack=4, prune_u=prune_u)
            return jnp.sum(o * jnp.cos(o))
        return loss

    g1 = jax.grad(mk(hybrid_window_attention), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(mk(stacked_window_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, err_msg=name)


def test_dual_mask_matches_pallas():
    from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention

    per_f, f, b = 8, 3, 2
    q, k, v = qkv(b * f * per_f, 32, 16, seed=5)
    r = np.random.default_rng(6)
    tail = ADJ32 * (r.random(ADJ32.shape) > 0.3)
    kw = dict(scale=0.25, stack=4, tail_adj=tail, units_per_group=per_f, groups=f)
    got = hybrid_window_attention(q, k, v, ADJ32, **kw)
    want = pallas_window_attention(q, k, v, ADJ32, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bf16_inputs():
    q, k, v = qkv(16, 32, 64, seed=7)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    got = hybrid_window_attention(qb, kb, vb, ADJ32, scale=0.125, stack=4)
    want = stacked_window_attention(q, k, v, ADJ32, scale=0.125, stack=4)
    assert np.isfinite(np.asarray(got, np.float32)).all()
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.05, rtol=0.05)


def test_under_jit_with_grad():
    q, k, v = qkv(8, 32, 16, seed=8)

    @jax.jit
    def f(q, k, v):
        def loss(q):
            o = hybrid_window_attention(q, k, v, ADJ32, scale=0.25, stack=4)
            return jnp.sum(o * o)
        return jax.value_and_grad(loss)(q)

    val, g = f(q, k, v)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()
