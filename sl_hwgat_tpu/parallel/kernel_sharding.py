"""Fused Pallas window attention under shard_map (dp/sp sharding).

The fused kernel (`ops/pallas_attention.py`) is a per-supertile map with no
cross-tile communication, so sharding it is trivial in principle — but a
``pl.pallas_call`` is not GSPMD-partitionable, which is why the GSPMD train
path falls back to the jnp ``stacked`` impl. This module closes the gap:
inside a ``sharded_window_attention(mesh)`` context, the model wraps the
fused kernel in ``shard_map`` over the unit axis (U = B·f·nW·H, batch-major
then temporal-group), splitting units contiguously across the named axes
(default ``("dp", "sp")``) — each shard runs its own fused kernel on its unit
slice.

The only subtlety is the dual-mask (shifted-block) mode: the per-supertile
mask selector depends on the GLOBAL unit index (the last temporal group of
every ``groups``-period attends under the shift-masked adjacency,
`models/hwgate.py`), so each shard passes ``unit_offset = shard_id ·
units_per_shard`` and the selector is computed traced inside the shard
(`ops/pallas_attention.py::_make_sel`).

tp: in the default head-minor unit order (b, f, nW, h) a contiguous U-split
cannot isolate heads, so tp is not in the default axes and attention compute
is replicated across tp. When the MODEL emits units HEAD-MAJOR (h, b, f, nW)
— which it does whenever ``tp_size() > 1`` divides the head count and the
dual-mask alignment allows — it passes ``head_major=True`` and 'tp' is
prepended to the shard axes, so the outermost split shards HEADS and
attention compute drops by the tp factor. Equality with the unsharded kernel
is tested on the virtual CPU mesh (`tests/test_kernel_sharding.py`).
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax ≥ 0.6 exposes shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

_CTX: tuple | None = None


@contextmanager
def sharded_window_attention(mesh, axes=("dp", "sp")):
    """Within this context, HWGATE/HGATE's fused-kernel calls run per-shard
    under shard_map over ``axes`` (axes missing from the mesh are ignored)."""
    global _CTX
    prev = _CTX
    _CTX = (mesh, tuple(axes))
    try:
        yield
    finally:
        _CTX = prev


def tp_size() -> int:
    """Size of the 'tp' mesh axis if a sharding context is active (0 when no
    context / no tp axis). The model uses this to decide whether to emit its
    unit axis HEAD-MAJOR, which lets ``call_sharded`` split heads across tp
    instead of replicating attention compute."""
    ctx = _CTX
    if ctx is None:
        return 0
    mesh, _ = ctx
    return int(mesh.shape.get("tp", 0)) if "tp" in mesh.shape else 0


def call_sharded(q, k, v, adj, *, scale, stack, pad_tokens=None, prune_u=None,
                 tail_adj=None, units_per_group=None, groups=None,
                 impl: str = "pallas", head_major: bool = False,
                 out_dtype=None, transposed: bool | str = False):
    """Run the fused kernel per-shard if a context is active and the unit axis
    divides evenly; return None when not applicable (caller falls back).
    ``impl``: 'pallas' (fully-fused kernel) or 'hybrid' (XLA GEMMs + fused
    masked-softmax) — each shard runs its own instance.
    ``head_major``: the caller ordered units (h, b, f, nW) — prepend 'tp' to
    the shard axes so the outermost split lands on heads."""
    ctx = _CTX
    if ctx is None:
        return None
    mesh, want_axes = ctx
    if head_major:
        want_axes = ("tp",) + tuple(a for a in want_axes if a != "tp")
    axes = tuple(a for a in want_axes if a in mesh.shape and mesh.shape[a] > 1)
    if not axes:
        return None
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    u = q.shape[0]
    per_shard = u // n_shards
    if u % n_shards or per_shard % stack:
        return None
    if tail_adj is not None and per_shard % units_per_group:
        # a shard must hold whole temporal groups so no supertile mixes planes
        return None

    extra = {}
    if impl == "hybrid":
        from sl_hwgat_tpu.ops.hybrid_attention import hybrid_window_attention as attn_fn
    else:
        from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention as attn_fn
        if out_dtype is not None:
            extra["out_dtype"] = out_dtype
        if transposed:
            extra["transposed"] = transposed if isinstance(transposed, str) else True

    sizes = [mesh.shape[a] for a in axes]
    has_prune = prune_u is not None
    pu = prune_u if has_prune else jnp.float32(0.0)  # explicit arg: shard_map
    # disallows/penalizes closing over tracers, so the scalar rides as input

    def local(q, k, v, pu_):
        sid = jnp.int32(0)
        for a, s in zip(axes, sizes):
            sid = sid * s + jax.lax.axis_index(a)
        offset = sid * per_shard
        return attn_fn(
            q, k, v, adj, scale=scale, stack=stack, pad_tokens=pad_tokens,
            prune_u=pu_ if has_prune else None, tail_adj=tail_adj,
            units_per_group=units_per_group, groups=groups,
            unit_offset=None if tail_adj is None else offset,
            **extra,
        )

    spec = P(axes if len(axes) > 1 else axes[0], None, None)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec, P()), out_specs=spec,
        check_vma=False,
    )(q, k, v, jnp.asarray(pu, jnp.float32))
