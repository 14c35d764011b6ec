"""Golden tests: graph IR vs the reference adjacency builders (SURVEY.md §4.1)."""

import numpy as np
import pytest

from tests.conftest import import_reference

from sl_hwgat_tpu import graphs
from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES, WINDOW_EDGES_16


@pytest.fixture(scope="module")
def ref_params():
    return import_reference("models.model_params")


@pytest.fixture(scope="module")
def ref_graph_utils():
    return import_reference("models.graph_utils")


DS = {"num_class": 10, "src_len": 8}  # tiny src_len keeps WGATE/GATE masks small


def test_hwgate_window_mask(ref_params):
    ref = ref_params.HWGATEParams(DS, 2).adj_mat.numpy()
    ours = graphs.windowed_block_adj(temporal_blocks=2)
    assert ours.shape == (4, 32, 32)
    np.testing.assert_array_equal(ours, ref)


def test_wgate_full_clip_mask(ref_params):
    ref = ref_params.WGATEParams(DS, 2).adj_mat.numpy()
    ours = graphs.windowed_block_adj(temporal_blocks=DS["src_len"])
    np.testing.assert_array_equal(ours, ref)


def test_hgate_block_mask(ref_params):
    ref = ref_params.HGATEParams(DS, 2).adj_mat.numpy()
    ours = graphs.hgate_block_adj(BODY29_EDGES, num_kps=29, temporal_patch=2)
    np.testing.assert_array_equal(ours, ref)


def test_gate_spatio_temporal_adj(ref_params):
    ref = ref_params.GATEParams(DS, 2).adj_mat.numpy()
    ours = graphs.spatio_temporal_adj(BODY29_EDGES, num_frames=DS["src_len"], num_kps=29)
    np.testing.assert_array_equal(ours, ref)


def test_additive_mask_matches_masked_fill(ref_params):
    import torch

    adj = torch.tensor(graphs.windowed_block_adj(2))
    ref = adj.masked_fill(adj == 0, float(-10000)).masked_fill(adj == 1, float(0)).numpy()
    np.testing.assert_array_equal(graphs.additive_mask(graphs.windowed_block_adj(2)), ref)


@pytest.mark.parametrize("strategy", ["uniform", "distance", "spatial"])
def test_stgcn_partition(ref_graph_utils, strategy):
    ref = ref_graph_utils.GraphWithPartition(29, 0, [list(e) for e in BODY29_EDGES], strategy=strategy).A
    ours = graphs.GraphPartition(29, 0, BODY29_EDGES, strategy=strategy).A
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_spatial_graph_stack(ref_graph_utils):
    ref = ref_graph_utils.SpatialGraph(29, [tuple(e) for e in BODY29_EDGES]).A
    ours = graphs.spatial_graph(29, BODY29_EDGES)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_csr_ell_roundtrip():
    adj = graphs.windowed_block_adj(2)[0]
    indptr, indices = graphs.dense_to_csr(adj)
    assert indptr[-1] == (adj != 0).sum()
    col, valid = graphs.dense_to_ell(adj)
    dense = np.zeros_like(adj)
    for i in range(adj.shape[0]):
        for k in range(col.shape[1]):
            if valid[i, k]:
                dense[i, col[i, k]] = 1
    np.testing.assert_array_equal(dense, adj)


def test_window_adj_degree():
    a = graphs.window_adj(WINDOW_EDGES_16)
    # 16 self loops + 2*25 symmetric edges
    assert (a != 0).sum() == 16 + 50
