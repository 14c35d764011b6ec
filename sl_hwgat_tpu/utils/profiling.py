"""Tracing / profiling / roofline accounting.

The reference has no profiling subsystem (SURVEY.md §5); here it is
first-class: ``jax.profiler`` trace capture, wall-clock timing of compiled
functions, and analytic roofline counters for the attention kernels so
benchmarks report edges/s against speed-of-light.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Median-free average seconds per call of a compiled function."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@dataclass(frozen=True)
class AttentionCost:
    """Work accounting for one masked-window attention call."""

    edges: int          # nnz of the applied masks (SDDMM+SpMM pairs)
    dense_flops: int    # FLOPs actually issued by the dense supertile path
    sparse_flops: int   # FLOPs a perfect sparse kernel would issue (4·dh per edge)
    bytes_min: int      # compulsory q/k/v/out traffic


def window_attention_cost(units: int, tokens: int, head_dim: int, nnz: int,
                          stack: int = 4, dtype_bytes: int = 4) -> AttentionCost:
    """Cost of ``stacked_window_attention`` over ``units`` (group, head) units."""
    tiles = units // stack
    s_tok = stack * tokens
    dense = tiles * 2 * (2 * s_tok * s_tok * head_dim)
    sparse = units * nnz * 4 * head_dim
    io = units * tokens * head_dim * dtype_bytes * 4  # q, k, v, out
    return AttentionCost(edges=units * nnz, dense_flops=dense, sparse_flops=sparse, bytes_min=io)


def hwgate_forward_cost(batch: int, frames: int = 192, embed: int = 128,
                        depths=(2, 2, 4), heads=(2, 4, 8), tp: int = 2,
                        nw: int = 4, window: int = 16) -> dict:
    """Aggregate per-forward attention cost for HWGATE (flagship config)."""
    from sl_hwgat_tpu.graphs.adjacency import windowed_block_adj

    nnz = int((windowed_block_adj(tp, window, 1)[0] != 0).sum())
    tokens = tp * window
    total = dict(edges=0, dense_flops=0, sparse_flops=0, bytes_min=0)
    f = frames
    for i, (d_i, h_i) in enumerate(zip(depths, heads)):
        dim = embed * 2**i
        dh = dim // h_i
        units = batch * (f // tp) * nw * h_i
        c = window_attention_cost(units, tokens, dh, nnz)
        for blk in range(d_i):
            total["edges"] += c.edges
            total["dense_flops"] += c.dense_flops
            total["sparse_flops"] += c.sparse_flops
            total["bytes_min"] += c.bytes_min
        f //= tp
    return total
