"""Ops layer: layout transforms vs the reference torch functions; stacked and
banded attention vs the dense reference-ordered oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import import_reference

from sl_hwgat_tpu import graphs, ops
from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES


def rng(seed=0):
    return np.random.default_rng(seed)


class TestLayouts:
    def test_window_partition_reverse_matches_reference(self):
        torch = pytest.importorskip("torch")
        ref = import_reference("models.HWGATE")
        x = rng().normal(size=(2, 8, 64, 6)).astype(np.float32)
        got = ops.window_partition(jnp.asarray(x), window_size=16, temporal_patch=2)
        want = ref.window_partition(torch.tensor(x), 16, 2).numpy()
        np.testing.assert_array_equal(np.asarray(got), want)
        back = ops.window_reverse(got, 16, 2, 8, 64)
        np.testing.assert_array_equal(np.asarray(back), x)

    def test_block_partition_matches_reference(self):
        torch = pytest.importorskip("torch")
        ref = import_reference("models.HGATE")
        x = rng(1).normal(size=(2, 8, 29, 6)).astype(np.float32)
        got = ops.block_partition(jnp.asarray(x), temporal_patch=2)
        want = ref.block_partition(torch.tensor(x), 2).numpy()
        np.testing.assert_array_equal(np.asarray(got), want)
        back = ops.block_reverse(got, 2, 8, 29)
        np.testing.assert_array_equal(np.asarray(back), x)

    def test_spatial_window_partition_matches_reference(self):
        torch = pytest.importorskip("torch")
        ref = import_reference("models.WGATE")
        x = rng(2).normal(size=(2, 8, 64, 6)).astype(np.float32)
        got = ops.spatial_window_partition(jnp.asarray(x), window_size=16)
        want = ref.window_partition(torch.tensor(x), 16).numpy()
        np.testing.assert_array_equal(np.asarray(got), want)
        back = ops.spatial_window_reverse(got, 16, 8, 64)
        np.testing.assert_array_equal(np.asarray(back), x)

    def test_temporal_merge_matches_reference(self):
        torch = pytest.importorskip("torch")
        ref = import_reference("models.HWGATE")
        x = rng(3).normal(size=(2, 8, 64, 6)).astype(np.float32)
        merger = ref.TemporalMerging(6, 2)
        want = merger(torch.tensor(x)).numpy()
        got = ops.temporal_merge(jnp.asarray(x), 2)
        np.testing.assert_array_equal(np.asarray(got), want)


class TestStackedAttention:
    def _qkv(self, u, n, dh, seed=0):
        r = rng(seed)
        return (
            jnp.asarray(r.normal(size=(u, n, dh)).astype(np.float32)),
            jnp.asarray(r.normal(size=(u, n, dh)).astype(np.float32)),
            jnp.asarray(r.normal(size=(u, n, dh)).astype(np.float32)),
        )

    def test_matches_oracle_hwgate_window(self):
        adj = graphs.windowed_block_adj(temporal_blocks=2)[0]  # (32, 32), shared topology
        q, k, v = self._qkv(16, 32, 64)
        got = ops.stacked_window_attention(q, k, v, adj, scale=0.125, stack=4)
        want = ops.masked_msa_oracle(
            q[:, None], k[:, None], v[:, None],
            adj=jnp.asarray(adj)[None], scale=0.125,
        )[:, 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_matches_oracle_hgate_padded(self):
        adj = graphs.hgate_block_adj(BODY29_EDGES)  # (58, 58)
        q, k, v = self._qkv(8, 58, 64, seed=1)
        got = ops.stacked_window_attention(q, k, v, adj, scale=0.125, stack=2, pad_tokens=64)
        want = ops.masked_msa_oracle(
            q[:, None], k[:, None], v[:, None],
            adj=jnp.asarray(adj)[None], scale=0.125,
        )[:, 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_prune_path_matches_oracle(self):
        adj = graphs.windowed_block_adj(temporal_blocks=2)[0]
        q, k, v = self._qkv(8, 32, 16, seed=2)
        u = 0.02  # aggressive prune so the path actually fires
        got = ops.stacked_window_attention(q, k, v, adj, scale=0.25, stack=4, prune_u=u)
        want = ops.masked_msa_oracle(
            q[:, None], k[:, None], v[:, None],
            adj=jnp.asarray(adj)[None], scale=0.25, prune_u=u,
        )[:, 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_oracle_matches_reference_msa(self):
        """Full-stack check: our oracle == the reference torch MSA (eval mode)."""
        torch = pytest.importorskip("torch")
        ref = import_reference("models.HWGATE")
        adj_np = graphs.windowed_block_adj(temporal_blocks=2)  # (4,32,32)
        dim, heads = 32, 2
        b, f, nw, n = 2, 3, 4, 32
        # The reference tiles the window mask f× along dim 0 (HWGATE.py:308-311).
        adj_tiled = np.concatenate([adj_np] * f, axis=0)
        msa = ref.MSA(dim, heads, adj_mat=torch.tensor(adj_tiled))
        msa.eval()
        x = rng(5).normal(size=(b * f * nw, n, dim)).astype(np.float32)
        with torch.no_grad():
            want = msa(torch.tensor(x), b, f, nw, mask=None).numpy()

        # Replicate qkv projection + head split, then run our oracle + proj.
        wqkv = msa.qkv.weight.detach().numpy()
        bqkv = msa.qkv.bias.detach().numpy()
        wproj = msa.proj.weight.detach().numpy()
        bproj = msa.proj.bias.detach().numpy()
        qkv = x @ wqkv.T + bqkv
        qkv = qkv.reshape(b * f * nw, n, 3, heads, dim // heads).transpose(2, 0, 3, 1, 4)
        out = ops.masked_msa_oracle(
            jnp.asarray(qkv[0]), jnp.asarray(qkv[1]), jnp.asarray(qkv[2]),
            adj=jnp.asarray(adj_np), scale=(dim // heads) ** -0.5,
        )
        out = np.asarray(out).transpose(0, 2, 1, 3).reshape(b * f * nw, n, dim)
        got = out @ wproj.T + bproj
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestBandedAttention:
    def test_wgate_band_matches_dense_oracle(self):
        """Banded path == dense additive-mask attention (reference WGATE form)."""
        f, vtok, dh, g, h = 6, 16, 8, 2, 2
        r = rng(7)
        q, k, v = (
            jnp.asarray(r.normal(size=(g, h, f, vtok, dh)).astype(np.float32))
            for _ in range(3)
        )
        dense_adj = graphs.windowed_block_adj(temporal_blocks=f, window_size=vtok, num_windows=1)[0]
        dense_mask = graphs.additive_mask(dense_adj)

        qf = q.transpose(0, 1, 2, 3, 4).reshape(g, h, f * vtok, dh)
        kf = k.reshape(g, h, f * vtok, dh)
        vf = v.reshape(g, h, f * vtok, dh)
        want = ops.masked_msa_oracle(qf, kf, vf, add_mask=jnp.asarray(dense_mask)[None], scale=0.3)
        want = np.asarray(want).reshape(g, h, f, vtok, dh)

        spatial = graphs.window_adj(window_size=vtok)
        eye = np.eye(vtok, dtype=np.float32)
        band = jnp.asarray(
            np.stack([
                graphs.additive_mask(eye),
                graphs.additive_mask(spatial),
                graphs.additive_mask(eye),
            ])
        )
        got = ops.banded_frame_attention(q, k, v, band, scale=0.3)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_gate_band_matches_dense_oracle(self):
        """GATE: 29 joints, edges without self-loops, additive mask."""
        f, vtok, dh = 5, 29, 8
        r = rng(8)
        q, k, v = (
            jnp.asarray(r.normal(size=(1, 2, f, vtok, dh)).astype(np.float32))
            for _ in range(3)
        )
        dense_mask = graphs.additive_mask(graphs.spatio_temporal_adj(BODY29_EDGES, f, vtok))
        want = ops.masked_msa_oracle(
            q.reshape(1, 2, f * vtok, dh), k.reshape(1, 2, f * vtok, dh),
            v.reshape(1, 2, f * vtok, dh),
            add_mask=jnp.asarray(dense_mask)[None], scale=0.5,
        )
        want = np.asarray(want).reshape(1, 2, f, vtok, dh)

        from sl_hwgat_tpu.graphs.skeleton import edges_to_dense
        spatial = edges_to_dense(BODY29_EDGES, vtok, self_loops=False)
        eye = np.eye(vtok, dtype=np.float32)
        band = jnp.asarray(
            np.stack([
                graphs.additive_mask(eye),
                graphs.additive_mask(spatial),
                graphs.additive_mask(eye),
            ])
        )
        got = ops.banded_frame_attention(q, k, v, band, scale=0.5)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
