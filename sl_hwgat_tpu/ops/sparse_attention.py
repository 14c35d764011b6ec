"""Sparse (ELL) gather/scatter graph attention.

The true edge-space formulation of the north star: scores computed ONLY on
graph edges (SDDMM), softmax over each node's edge list, aggregation as a
gather-weighted sum (SpMM). The static skeleton topology is carried as a
fixed-degree ELL table (``graphs.dense_to_ell``), so all shapes are static
and the gathers lower to XLA dynamic-gathers (TPU-compatible).

Semantics match the additive-mask models (GATE/WGATE): the dense reference
adds −1e4 off-edges, whose softmax contribution underflows to exactly 0 in
f32, so softmax over a node's edge slots (padded slots masked to −1e4) is
bitwise the dense row softmax — see DESIGN.md §2 for the argument.

When to use which formulation (measured trade-off, see DESIGN.md):
- 32-token windows → dense supertiles (`pallas_attention`): dense-in-VMEM is
  roofline-optimal on the MXU at this size;
- block-tridiagonal frame structure → `banded_frame_attention`;
- arbitrary sparse topologies (beyond the reference's) → this module.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

NEG = -10000.0


def ell_graph_attention(q, k, v, col_idx, valid, *, scale: float):
    """Edge-space attention over a fixed-degree graph.

    q, k, v: (G, H, T, dh) — T graph nodes (e.g. F·K spatio-temporal joints).
    col_idx: (T, D) int32 neighbor table; valid: (T, D) {0,1} mask for padded
    slots. Returns (G, H, T, dh).
    """
    col = jnp.asarray(col_idx)
    val = jnp.asarray(valid, jnp.float32)

    k_nbr = k[:, :, col]                       # (G, H, T, D, dh) gather
    v_nbr = v[:, :, col]

    # SDDMM: scores only on edges
    s = jnp.einsum("ghtd,ghtjd->ghtj", q * scale, k_nbr,
                   preferred_element_type=jnp.float32)
    s = jnp.where(val[None, None] == 1, s, jnp.float32(NEG))

    # edge softmax per node
    a = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    a = a / jnp.sum(a, axis=-1, keepdims=True)

    # SpMM: aggregate neighbor values over edges
    return jnp.einsum("ghtj,ghtjd->ghtd", a, v_nbr,
                      preferred_element_type=jnp.float32)


def ell_from_dense(adj: np.ndarray):
    """Convenience: dense {0,1} adjacency → (col_idx, valid) ELL tables."""
    from sl_hwgat_tpu.graphs.adjacency import dense_to_ell

    return dense_to_ell(adj)


_ELL_CACHE: dict = {}


def ell_from_band(spatial_additive: np.ndarray, frames: int):
    """ELL tables for the family's spatio-temporal topology: same-frame
    spatial edges (where the additive plane is 0) + same-joint ±1-frame
    links — the edge set `banded_frame_attention` covers, in true edge-space
    form (`model_params.py:60-73` semantics). Cached per (topology, frames)."""
    key = (frames, spatial_additive.tobytes())
    if key in _ELL_CACHE:
        return _ELL_CACHE[key]
    vtok = spatial_additive.shape[0]
    nbrs = [np.nonzero(spatial_additive[i] == 0)[0] for i in range(vtok)]
    deg = max(len(n) for n in nbrs) + 2
    col = np.zeros((frames * vtok, deg), np.int32)
    val = np.zeros((frames * vtok, deg), np.float32)
    for f in range(frames):
        for i in range(vtok):
            t = f * vtok + i
            slots = [f * vtok + j for j in nbrs[i]]
            if f > 0:
                slots.append((f - 1) * vtok + i)
            if f < frames - 1:
                slots.append((f + 1) * vtok + i)
            col[t, : len(slots)] = slots
            val[t, : len(slots)] = 1.0
    _ELL_CACHE[key] = (col, val)
    return col, val
