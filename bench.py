"""Benchmark harness — runs on the real TPU chip (driver-invoked each round).

Headline metric (BASELINE.json north star): adjacency-masked attention
(SDDMM + edge-softmax + SpMM) throughput in edges/s on the flagship HWGATE
training step at the FDMSE-ISL configuration, with ``vs_baseline`` reported as
the fraction of the chip's *self-calibrated* matmul roofline (a large dense
matmul measured on the same chip in the same precision), so the ≥80%-of-
roofline target is directly readable.

Prints exactly ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _timeit_chained(step_fn, carry, warmup=2, iters=10):
    """Time ``carry = step_fn(carry)`` with real data dependencies between
    iterations and a host value-fetch at the end (``block_until_ready`` does
    not reliably block through the axon remote-execution relay, so we force a
    device→host transfer of a scalar derived from the carry)."""
    import jax.numpy as jnp

    def sync(c):
        leaf = jax.tree.leaves(c)[0] if not hasattr(c, "ravel") else c
        return float(jnp.sum(leaf))

    import jax

    for _ in range(warmup):
        carry = step_fn(carry)
    sync(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step_fn(carry)
    sync(carry)
    return (time.perf_counter() - t0) / iters, carry


def hwgate_attention_edge_ops(batch: int, frames: int = 192, depths=(2, 2, 4),
                              heads=(2, 4, 8), tp: int = 2, nw: int = 4) -> int:
    """Edges touched by one HWGATE forward pass (SDDMM+SpMM pairs).

    Per (window, head) unit: nnz of the 32×32 block mask = 2·(16 + 2·25) + 2·16
    = 164 edges (spatial+self per temporal patch, ±1 temporal identity).
    """
    from sl_hwgat_tpu.graphs.adjacency import windowed_block_adj

    nnz = int((windowed_block_adj(tp)[0] != 0).sum())
    total = 0
    f = frames
    for d_i, h_i in zip(depths, heads):
        f_groups = f // tp
        total += d_i * batch * f_groups * nw * h_i * nnz
        f //= tp
    return total


def main():
    import jax
    import jax.numpy as jnp

    from sl_hwgat_tpu.constants import DATASET_PARAMS
    from sl_hwgat_tpu.models import build_model
    from sl_hwgat_tpu.train.loop import init_state, make_steps
    from sl_hwgat_tpu.train.state import make_optimizer

    dev = jax.devices()[0]
    batch = 16
    ds = DATASET_PARAMS["FDMSE-ISL"]
    model = build_model("HWGATE", ds, 2)

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 5e-4

    state, optimizer = init_state(model, Cfg, (ds["src_len"], 64, 2), ("dropout", "prune"))
    train_step, _ = make_steps(
        model, optimizer, rng_streams=("dropout", "prune"), donate=False
    )

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(batch, ds["src_len"], 64, 2)).astype(np.float32))
    y = jnp.asarray(r.integers(0, ds["num_class"], size=(batch,)).astype(np.int32))
    valid = jnp.ones((batch,), jnp.float32)
    key = jax.random.PRNGKey(0)

    def step(carry):
        variables, opt_state = carry
        v, o, loss, c, n = train_step(variables, opt_state, x, y, valid, key, 0, 0)
        return (v, o)

    step_time, _ = _timeit_chained(step, (state.variables, state.opt_state), warmup=2, iters=10)

    # fwd + bwd ≈ 3× the forward edge traffic (dQK^T, dV recompute paths)
    edges = 3 * hwgate_attention_edge_ops(batch, ds["src_len"])
    edges_per_sec = edges / step_time

    # Self-calibrated roofline: measured dense matmul peak in the same dtype,
    # with a data dependency chaining iterations.
    m = 4096
    a = jnp.asarray(r.normal(size=(m, m)).astype(np.float32) / m)
    mm = jax.jit(lambda b: a @ b)
    mm_time, _ = _timeit_chained(mm, a, warmup=2, iters=10)
    peak_flops = 2 * m**3 / mm_time

    # One supertile = 2 matmuls of (128×128×64) carrying 4 windows × nnz edges.
    from sl_hwgat_tpu.graphs.adjacency import windowed_block_adj

    nnz = int((windowed_block_adj(2)[0] != 0).sum())
    flops_per_edge = (2 * 2 * 128 * 128 * 64) / (4 * nnz)
    roofline_edges_per_sec = peak_flops / flops_per_edge

    result = {
        "metric": "hwgate_train_attn_edges_per_sec",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / roofline_edges_per_sec, 4),
    }
    print(json.dumps(result))
    print(
        f"# device={dev.platform} step_time={step_time*1000:.1f}ms "
        f"clips/s={batch/step_time:.1f} matmul_peak={peak_flops/1e12:.1f}TF "
        f"roofline={roofline_edges_per_sec:.3e} edges/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
