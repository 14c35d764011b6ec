"""Weak-scaling harness for the sharded fused window-attention kernel.

North-star target (BASELINE.md): >=85% edges/s scaling efficiency going
1 chip -> 1 host -> 2-host v5e-16. This harness measures
  eff(n) = edges_per_sec(n) / (n * edges_per_sec(1))
with constant units-per-shard (weak scaling) over a ("dp",) mesh, using the
shard_map'd fused kernel (`parallel/kernel_sharding.py`).

On this image only ONE real TPU chip is reachable, so multi-shard points run
on the virtual CPU mesh (mechanics/correctness; interpret-mode timings are
not hardware numbers). On a real v5e-8/-16 slice the same script measures the
true scaling curve: `python bench_scaling.py 1 2 4 8` prints one JSON line
per scale plus an efficiency summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def measure(n_shards: int, units_per_shard: int = 12288, inner: int = 10,
            outer: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sl_hwgat_tpu import graphs
    from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention
    from sl_hwgat_tpu.parallel import kernel_sharding

    devices = jax.devices()
    if len(devices) < n_shards:
        return {"n_shards": n_shards, "skipped": f"only {len(devices)} devices"}

    adj = graphs.windowed_block_adj(2)[0]
    nnz = int((adj != 0).sum())
    u = units_per_shard * n_shards
    r = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(r.normal(size=(u, 32, 64)).astype(np.float32))
        for _ in range(3)
    )
    mesh = Mesh(np.array(devices[:n_shards]), ("dp",))
    spec = NamedSharding(mesh, P("dp", None, None))
    q, k, v = (jax.device_put(x, spec) for x in (q, k, v))

    def body(qq):
        if n_shards == 1:
            return pallas_window_attention(qq, k, v, adj, scale=0.125, stack=4)
        out = kernel_sharding.call_sharded(qq, k, v, adj, scale=0.125, stack=4)
        assert out is not None
        return out

    with kernel_sharding.sharded_window_attention(mesh, axes=("dp",)):
        loop = jax.jit(
            lambda x: jax.lax.fori_loop(0, inner, lambda i, y: body(y), x)
        )
        y = loop(q)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(outer):
            y = loop(y)
        jax.block_until_ready(y)
    per_op = (time.perf_counter() - t0) / (outer * inner)
    return {
        "n_shards": n_shards,
        "units": u,
        "time_us": per_op * 1e6,
        "edges_per_sec": u * nnz / per_op,
    }


def measure_banded(n_shards: int, frames_per_shard: int = 96, inner: int = 10,
                   outer: int = 3) -> dict:
    """Weak scaling of the halo-exchange banded attention over an sp mesh —
    BASELINE config 5's metric (edge-partitioned graphs, ±1-frame boundary
    exchange riding ICI ppermute). GATE shapes: B16·H8·V29·dh16."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sl_hwgat_tpu.graphs.adjacency import additive_mask
    from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES, edges_to_dense
    from sl_hwgat_tpu.ops.attention import banded_frame_attention
    from sl_hwgat_tpu.parallel.edge_partition import sharded_banded_frame_attention

    devices = jax.devices()
    if len(devices) < n_shards:
        return {"n_shards": n_shards, "skipped": f"only {len(devices)} devices"}

    B, H, V, DH = 16, 8, 29, 16
    F = frames_per_shard * n_shards
    eye = np.eye(V, dtype=np.float32)
    spatial = edges_to_dense(BODY29_EDGES, V, self_loops=False)
    band = jnp.asarray(np.stack([additive_mask(eye), additive_mask(spatial),
                                 additive_mask(eye)]))
    r = np.random.default_rng(0)
    q, k, v = (jnp.asarray(r.normal(size=(B, H, F, V, DH)).astype(np.float32))
               for _ in range(3))
    mesh = Mesh(np.array(devices[:n_shards]), ("sp",))
    spec = NamedSharding(mesh, P(None, None, "sp", None, None))
    q, k, v = (jax.device_put(x, spec) for x in (q, k, v))

    def body(qq):
        if n_shards == 1:
            return banded_frame_attention(qq, k, v, band, scale=0.25)
        return sharded_banded_frame_attention(qq, k, v, band, mesh=mesh,
                                              axis="sp", scale=0.25)

    loop = jax.jit(lambda x: jax.lax.fori_loop(0, inner, lambda i, y: body(y), x))
    y = loop(q)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(outer):
        y = loop(y)
    float(jnp.sum(y))
    per_op = (time.perf_counter() - t0) / (outer * inner)
    edges = B * H * F * V * 3 * V
    return {"n_shards": n_shards, "op": "banded_halo", "frames": F,
            "time_us": per_op * 1e6, "edges_per_sec": edges / per_op}


def main():
    units = int(os.environ.get("SCALING_UNITS_PER_SHARD", "12288"))
    args = sys.argv[1:]
    op = "window"
    if args and args[0] == "--op":
        op = args[1]
        args = args[2:]
    scales = [int(a) for a in args] or [1, 2, 4, 8]
    results = []
    for n in scales:
        rec = (measure_banded(n) if op == "banded"
               else measure(n, units_per_shard=units))
        print(json.dumps(rec))
        if "edges_per_sec" in rec:
            results.append(rec)
    if len(results) >= 2:
        base = results[0]["edges_per_sec"] / results[0]["n_shards"]
        for rec in results[1:]:
            eff = rec["edges_per_sec"] / (rec["n_shards"] * base)
            print(json.dumps({"scaling_efficiency": round(eff, 4),
                              "n_shards": rec["n_shards"],
                              "target": 0.85}))


if __name__ == "__main__":
    main()
