"""Adjacency/mask builders for the attention models, plus sparse (CSR/ELL) forms.

Dense builders reproduce the reference semantics exactly:

- ``windowed_block_adj``  ≡ `hwgat/models/model_params.py:373-400` (HWGATE) and
  `:210-237` (WGATE, same block recipe with F temporal blocks instead of TP).
- ``hgate_block_adj``     ≡ `hwgat/models/model_params.py:461-484`.
- ``spatio_temporal_adj`` ≡ `hwgat/models/model_params.py:60-73` (GATE; NOTE: no
  self-loops — the reference's additive mask puts -1e4 on the diagonal too).

The block recipe, per spatial window w over T temporal blocks of V nodes:
diagonal blocks = spatial adjacency (with self loops), |i-j|==1 off-diagonal
blocks = identity (same-joint temporal edges), everything else 0.

Sparse forms are static (topology is a compile-time constant), padded to fixed
row degree (ELL) for TPU-friendly static shapes.
"""

from __future__ import annotations

import numpy as np

from sl_hwgat_tpu.graphs.skeleton import WINDOW_EDGES_16, edges_to_dense


def window_adj(edges=WINDOW_EDGES_16, window_size: int = 16) -> np.ndarray:
    """(W, W) spatial adjacency with self loops for one window.

    ≡ `model_params.py:394-400` (``get_adj``: eye + symmetric edges).
    """
    return edges_to_dense(edges, window_size, self_loops=True)


def block_tridiagonal(spatial: np.ndarray, num_blocks: int) -> np.ndarray:
    """(T·V, T·V) block matrix: diag=``spatial``, ±1 blocks=I, else 0."""
    v = spatial.shape[0]
    t = num_blocks
    out = np.zeros((t * v, t * v), dtype=spatial.dtype)
    eye = np.eye(v, dtype=spatial.dtype)
    for i in range(t):
        out[i * v : (i + 1) * v, i * v : (i + 1) * v] = spatial
        if i + 1 < t:
            out[i * v : (i + 1) * v, (i + 1) * v : (i + 2) * v] = eye
            out[(i + 1) * v : (i + 2) * v, i * v : (i + 1) * v] = eye
    return out


def windowed_block_adj(
    temporal_blocks: int,
    window_size: int = 16,
    num_windows: int = 4,
    edges_per_window=None,
) -> np.ndarray:
    """(num_windows, T·W, T·W) multiplicative {0,1} mask stack.

    HWGATE uses ``temporal_blocks = temporal_patch_size`` (=2 → 32×32 masks,
    `model_params.py:373-392`); WGATE uses ``temporal_blocks = src_len`` (full
    clip, `model_params.py:210-229`).
    """
    if edges_per_window is None:
        edges_per_window = [WINDOW_EDGES_16] * num_windows
    return np.stack(
        [
            block_tridiagonal(window_adj(edges_per_window[w], window_size), temporal_blocks)
            for w in range(num_windows)
        ]
    )


def hgate_block_adj(edges, num_kps: int = 29, temporal_patch: int = 2) -> np.ndarray:
    """(TP·K, TP·K) whole-skeleton block mask, ≡ `model_params.py:461-484`."""
    return block_tridiagonal(edges_to_dense(edges, num_kps, self_loops=True), temporal_patch)


def spatio_temporal_adj(edges, num_frames: int, num_kps: int) -> np.ndarray:
    """(F·K, F·K) flat spatio-temporal adjacency for GATE.

    Per frame: symmetric spatial edges (no self loops); same-joint links between
    consecutive frames. ≡ `model_params.py:60-73` (``GATEParams.get_adj``).
    """
    n = num_frames * num_kps
    a = np.zeros((n, n), dtype=np.float32)
    for f in range(num_frames):
        base = f * num_kps
        for i, j in edges:
            a[base + i, base + j] = 1
            a[base + j, base + i] = 1
        if f < num_frames - 1:
            for i in range(num_kps):
                a[base + i, base + i + num_kps] = 1
                a[base + i + num_kps, base + i] = 1
    return a


def additive_mask(adj: np.ndarray, neg: float = -10000.0) -> np.ndarray:
    """{0,1} adjacency → additive attention mask {neg, 0}.

    ≡ `GATE.py:142` / `WGATE.py:190` (masked_fill(adj==0, -1e4) then (==1, 0)).
    """
    return np.where(adj == 0, np.float32(neg), np.float32(0.0))


def dense_to_csr(adj: np.ndarray):
    """Dense {0,1} adjacency → (indptr, indices) int32 CSR."""
    indptr = [0]
    indices = []
    for row in adj:
        nz = np.nonzero(row)[0]
        indices.extend(nz.tolist())
        indptr.append(len(indices))
    return np.asarray(indptr, dtype=np.int32), np.asarray(indices, dtype=np.int32)


def dense_to_ell(adj: np.ndarray, pad_to: int | None = None):
    """Dense {0,1} adjacency → fixed-degree ELL form.

    Returns ``(col_idx, valid)`` of shape (N, max_deg): column indices padded
    with the row's own index, and a {0,1} validity mask. Static shapes make this
    directly usable from jit/Pallas gathers.
    """
    n = adj.shape[0]
    degs = (adj != 0).sum(axis=1)
    max_deg = int(degs.max()) if pad_to is None else pad_to
    col = np.zeros((n, max_deg), dtype=np.int32)
    valid = np.zeros((n, max_deg), dtype=np.float32)
    for i in range(n):
        nz = np.nonzero(adj[i])[0]
        col[i, : len(nz)] = nz
        col[i, len(nz):] = i
        valid[i, : len(nz)] = 1.0
    return col, valid


def num_edges(adj: np.ndarray) -> int:
    """Count of nonzero entries (directed edge count incl. self loops)."""
    return int((adj != 0).sum())
