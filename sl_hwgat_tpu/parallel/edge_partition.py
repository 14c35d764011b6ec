"""Edge-partitioned attention with explicit boundary (halo) exchange.

BASELINE.json config 5: batched skeleton graphs sharded by edges, boundary
joint features exchanged between partitions and overlapped with aggregation.

For this model family the spatio-temporal edge set decomposes as:
- **windowed models** (HWGATE/HGATE): attention groups are disjoint edge
  blocks → partitioning the (group, head) unit axis is an exact edge
  partition with zero boundary traffic (handled by dp/sp sharding);
- **banded models** (WGATE/GATE): the only cross-partition edges are the
  same-joint ±1-frame links, so sharding the frame axis needs exactly one
  boundary frame of K/V per direction — a ring halo exchange
  (``jax.lax.ppermute`` over ICI), issued BEFORE the local band attention so
  XLA overlaps the permute with the local score computation.

``sharded_banded_frame_attention`` implements the banded case under
``shard_map``; equality with the unsharded op is tested on the virtual CPU
mesh (`tests/test_edge_partition.py`).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax ≥ 0.6 exposes shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from sl_hwgat_tpu.ops.attention import (banded_frame_attention,
                                        compact_banded_frame_attention)


_CTX: tuple | None = None


@contextmanager
def halo_banded_attention(mesh: Mesh, axis: str = "sp", batch_axis: str = "dp"):
    """Within this context, WGATE/GATE's ``BandedMSA`` routes its attention
    through ``sharded_banded_frame_attention`` (explicit ppermute halo
    exchange over ``axis``) instead of relying on GSPMD propagation —
    BASELINE config 5 as a real training mode (activated by
    ``parallel/sharding.py::make_sharded_steps``)."""
    global _CTX
    prev = _CTX
    _CTX = (mesh, axis, batch_axis)
    try:
        yield
    finally:
        _CTX = prev


def sp_active() -> bool:
    """True when a halo context with a real (>1) sequence axis is active —
    the banded models then keep the 5-D (G,H,F,V,dh) layout so
    ``call_sharded_banded`` can halo-exchange, and skip the plane-layout
    fast path (`models/wgate.py::BandedMSA`)."""
    ctx = _CTX
    if ctx is None:
        return False
    mesh, axis, _ = ctx
    return axis in mesh.shape and mesh.shape[axis] > 1


def call_sharded_banded(q, k, v, band_mask, *, scale: float,
                        impl: str = "banded"):
    """Route through the halo path if a context is active and the frame axis
    divides evenly; return None when not applicable (caller falls back to the
    unsharded op, which GSPMD still partitions over dp)."""
    ctx = _CTX
    if ctx is None:
        return None
    mesh, axis, batch_axis = ctx
    if axis not in mesh.shape or mesh.shape[axis] <= 1:
        return None
    f = q.shape[2]
    if f % mesh.shape[axis]:
        return None
    ba = batch_axis if (batch_axis in mesh.shape and mesh.shape[batch_axis] > 1
                        and q.shape[0] % mesh.shape[batch_axis] == 0) else None
    return sharded_banded_frame_attention(
        q, k, v, band_mask, mesh=mesh, axis=axis, batch_axis=ba, scale=scale,
        impl=impl)


def sharded_banded_frame_attention(q, k, v, band_mask, *, mesh: Mesh,
                                   axis: str = "sp",
                                   batch_axis: str | None = None,
                                   scale: float,
                                   impl: str = "banded"):
    """Frame-sharded banded attention with ±1-frame halo exchange.

    q, k, v: (G, H, F, V, dh) with F divisible by the ``axis`` mesh size.
    ``batch_axis``: optional mesh axis the leading G axis is sharded over
    (keeps dp sharding intact when called from inside a GSPMD train step).
    ``impl='compact'`` runs the identity-temporal compact form (requires the
    band's prev/next planes to be identity masks, which every model in this
    family satisfies — `models/wgate.py::_band`).
    Returns the same result as the unsharded ``banded_frame_attention``.
    """
    n_shards = mesh.shape[axis]

    def local(q, k, v, band):
        idx = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        # Boundary frames ride the ring: my last frame → right neighbor's
        # left halo; my first frame → left neighbor's right halo. Issued
        # up-front so the collective overlaps the local attention math.
        left_k = jax.lax.ppermute(k[:, :, -1:], axis, perm=fwd)
        left_v = jax.lax.ppermute(v[:, :, -1:], axis, perm=fwd)
        right_k = jax.lax.ppermute(k[:, :, :1], axis, perm=bwd)
        right_v = jax.lax.ppermute(v[:, :, :1], axis, perm=bwd)
        left_exists = (idx > 0).astype(jnp.float32)
        right_exists = (idx < n_shards - 1).astype(jnp.float32)
        if impl == "compact":
            return compact_banded_frame_attention(
                q, k, v, band[1], scale=scale,
                halo=(left_k, left_v, right_k, right_v),
                edge_valid=(left_exists, right_exists),
            )
        return banded_frame_attention(
            q, k, v, band, scale=scale,
            halo=(left_k, left_v, right_k, right_v),
            edge_valid=(left_exists, right_exists),
        )

    spec = P(batch_axis, None, axis, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, P(None, None, None)),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, band_mask)
