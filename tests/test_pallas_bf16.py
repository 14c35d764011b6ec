"""bf16 fast path of the fused kernel: runs, is finite, and tracks the f32
result within bf16 tolerance (fwd + grads)."""

import numpy as np

import jax
import jax.numpy as jnp

from sl_hwgat_tpu import graphs
from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention

ADJ = graphs.windowed_block_adj(2)[0]


def test_bf16_forward_close_to_f32():
    r = np.random.default_rng(0)
    q, k, v = (jnp.asarray(r.normal(size=(8, 32, 64)).astype(np.float32)) for _ in range(3))
    want = pallas_window_attention(q, k, v, ADJ, scale=0.125, stack=4)
    got = pallas_window_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        ADJ, scale=0.125, stack=4,
    )
    assert got.dtype == jnp.float32  # f32 accumulator output
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05, rtol=0.05)


def test_bf16_gradients_finite_and_close():
    r = np.random.default_rng(1)
    q, k, v = (jnp.asarray(r.normal(size=(8, 32, 16)).astype(np.float32)) for _ in range(3))

    def loss(q, k, v):
        return jnp.sum(pallas_window_attention(q, k, v, ADJ, scale=0.25, stack=4) ** 2)

    g32 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(
        lambda q, k, v: loss(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                             v.astype(jnp.bfloat16)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g32, gb):
        assert np.isfinite(np.asarray(b)).all()
        denom = np.abs(np.asarray(a)).max() + 1e-6
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / denom < 0.1
