"""Skeleton graph IR: static edge lists, dense-mask and CSR/ELL adjacency forms,
window/hierarchy metadata. Pure NumPy — everything here is a compile-time constant
for the kernels and models above it."""

from sl_hwgat_tpu.graphs.skeleton import (
    WINDOW_EDGES_16,
    BODY29_EDGES,
    WINDOW_JOINTS,
    WindowLayout,
)
from sl_hwgat_tpu.graphs.adjacency import (
    window_adj,
    windowed_block_adj,
    hgate_block_adj,
    spatio_temporal_adj,
    additive_mask,
    dense_to_csr,
    dense_to_ell,
)
from sl_hwgat_tpu.graphs.partition import GraphPartition, spatial_graph

__all__ = [
    "WINDOW_EDGES_16",
    "BODY29_EDGES",
    "WINDOW_JOINTS",
    "WindowLayout",
    "window_adj",
    "windowed_block_adj",
    "hgate_block_adj",
    "spatio_temporal_adj",
    "additive_mask",
    "dense_to_csr",
    "dense_to_ell",
    "GraphPartition",
    "spatial_graph",
]
