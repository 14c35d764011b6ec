"""Fused Pallas attention vs the jnp stacked path: forward and gradients.
Runs in interpreter mode on CPU; compiled on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sl_hwgat_tpu import graphs
from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES
from sl_hwgat_tpu.ops.attention import stacked_window_attention
from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention


def qkv(u, n, dh, seed=0):
    r = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(r.normal(size=(u, n, dh)).astype(np.float32)) for _ in range(3)
    )


ADJ32 = graphs.windowed_block_adj(2)[0]
ADJ58 = graphs.hgate_block_adj(BODY29_EDGES)


def test_forward_matches_stacked():
    q, k, v = qkv(16, 32, 64)
    got = pallas_window_attention(q, k, v, ADJ32, scale=0.125, stack=4)
    want = stacked_window_attention(q, k, v, ADJ32, scale=0.125, stack=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_forward_padded_tokens():
    q, k, v = qkv(8, 58, 64, seed=1)
    got = pallas_window_attention(q, k, v, ADJ58, scale=0.1, stack=2, pad_tokens=64)
    want = stacked_window_attention(q, k, v, ADJ58, scale=0.1, stack=2, pad_tokens=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_forward_prune():
    q, k, v = qkv(8, 32, 16, seed=2)
    got = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4, prune_u=0.05)
    want = stacked_window_attention(q, k, v, ADJ32, scale=0.25, stack=4, prune_u=0.05)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("prune_u", [None, 0.05])
def test_gradients_match(prune_u):
    q, k, v = qkv(8, 32, 16, seed=3)

    def loss_pallas(q, k, v):
        o = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4, prune_u=prune_u)
        return jnp.sum(o * jnp.cos(o))

    def loss_stacked(q, k, v):
        o = stacked_window_attention(q, k, v, ADJ32, scale=0.25, stack=4, prune_u=prune_u)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_stacked, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, err_msg=name)


def test_under_jit():
    q, k, v = qkv(16, 32, 64, seed=4)

    @jax.jit
    def f(q, k, v):
        return pallas_window_attention(q, k, v, ADJ32, scale=0.125, stack=4)

    got = f(q, k, v)
    want = stacked_window_attention(q, k, v, ADJ32, scale=0.125, stack=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
