"""ELL gather/scatter attention equals the dense additive-mask oracle on the
GATE spatio-temporal graph."""

import numpy as np

import jax.numpy as jnp

from sl_hwgat_tpu import graphs
from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES
from sl_hwgat_tpu.ops.attention import masked_msa_oracle
from sl_hwgat_tpu.ops.sparse_attention import ell_from_dense, ell_graph_attention


def test_ell_matches_dense_gate_graph():
    f, kjoints, dh, g, h = 6, 29, 8, 2, 2
    t = f * kjoints
    adj = graphs.spatio_temporal_adj(BODY29_EDGES, f, kjoints)
    col, valid = ell_from_dense(adj)

    r = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(r.normal(size=(g, h, t, dh)).astype(np.float32)) for _ in range(3)
    )
    want = masked_msa_oracle(
        q, k, v, add_mask=jnp.asarray(graphs.additive_mask(adj))[None], scale=0.3
    )
    got = ell_graph_attention(q, k, v, col, valid, scale=0.3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_ell_matches_dense_window_graph():
    adj = graphs.windowed_block_adj(2)[0]  # 32-node window graph with self loops
    col, valid = ell_from_dense(adj)
    r = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(r.normal(size=(1, 2, 32, 16)).astype(np.float32)) for _ in range(3)
    )
    want = masked_msa_oracle(
        q, k, v, add_mask=jnp.asarray(graphs.additive_mask(adj))[None], scale=0.25
    )
    got = ell_graph_attention(q, k, v, col, valid, scale=0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gate_attn_impl_ell_matches_default():
    """GATE with attn_impl='ell' (true edge-space gather/scatter on the
    spatio-temporal topology) equals the banded/compact default."""
    import jax
    import jax.numpy as jnp

    from sl_hwgat_tpu.models.gate import GATE

    kw = dict(kp_dim=2, num_kps=29, temporal_dim=8, num_classes=5,
              embed_dim=32, depths=2, num_heads=2, drop_rate=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8, 29, 2)).astype(np.float32))
    base = GATE(**kw)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    want = base.apply(variables, x, train=False)
    got = GATE(**kw, attn_impl="ell").apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
