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


def hwgate_step_roofline(batch: int, frames: int = 192, embed: int = 128,
                         depths=(2, 2, 4), heads=(2, 4, 8), tp: int = 2,
                         nw: int = 4, window: int = 16, kps: int = 64,
                         num_classes: int = 2002, ff_ratio: float = 2.0,
                         train: bool = True,
                         mxu_flops: float = 47.3e12,
                         shape_flops: float = 27.0e12,
                         mem_bw: float = 1.05e12,
                         dtype_bytes: int = 2) -> dict:
    """Analytic speed-of-light for one HWGATE train (or eval) step.

    Sequential roofline: every GEMM contributes max(FLOPs/peak, bytes/BW)
    — big projection/FFN GEMMs at the measured big-matmul bf16 rate, the
    32-token attention supertiles at the measured shape-calibrated rate
    (`bench.py` calibration constants) — plus AdamW optimizer HBM traffic.
    Train counts each GEMM 3× (forward, input-grad, weight-grad) and
    attention at the measured fwd+bwd/fwd ratio (~2.5, kernel batch-23).

    Deliberately EXCLUDED: LayerNorm / residual / roll / window-partition
    elementwise+relayout traffic — that is implementation overhead, not
    compulsory work, so (measured / this) directly quantifies how much of
    the step is spent outside the GEMM+attention core.
    """

    def gemm_t(m, k, n, count=1):
        flops = 2.0 * m * k * n * count
        byts = float(m * k + k * n + m * n) * dtype_bytes * count
        return max(flops / mxu_flops, byts / mem_bw), flops

    total_t, total_flops = 0.0, 0.0
    mult = 3 if train else 1  # fwd + dgrad + wgrad GEMMs
    f = frames
    for i, (d_i, h_i) in enumerate(zip(depths, heads)):
        dim = embed * 2**i
        tok = batch * f * kps
        hidden = int(dim * ff_ratio)
        for _ in range(d_i):
            for (k_, n_, cnt) in ((dim, dim, 3),       # q, k, v projections
                                  (dim, dim, 1),       # output projection
                                  (dim, hidden, 1),    # fc1
                                  (hidden, dim, 1)):   # fc2
                t1, fl = gemm_t(tok, k_, n_, cnt)
                total_t += mult * t1
                total_flops += mult * fl
        if i < len(depths) - 1:
            f //= tp
    # classifier head + Fourier embed (embed/2 random features per coord)
    t1, fl = gemm_t(batch, embed * 2 ** (len(depths) - 1), num_classes)
    total_t += mult * t1
    total_flops += mult * fl
    t1, fl = gemm_t(batch * frames * kps, 2, embed // 2)
    total_t += mult * t1
    total_flops += mult * fl

    # attention supertiles at the shape-calibrated rate
    attn = hwgate_forward_cost(batch, frames, embed, depths, heads, tp, nw, window)
    attn_t = max(attn["dense_flops"] / shape_flops,
                 attn["bytes_min"] / 2 / mem_bw)  # bytes_min assumes f32; bf16 halves it
    attn_mult = 2.5 if train else 1.0  # measured fwd+bwd/fwd ≈ 2099/840
    total_t += attn_mult * attn_t
    total_flops += attn_mult * attn["dense_flops"]

    if train:
        # AdamW: read p/m/v + write p/m/v, f32 master copies
        n_params = 0
        f2 = frames
        for i, d_i in enumerate(depths):
            dim = embed * 2**i
            hidden = int(dim * ff_ratio)
            n_params += d_i * (3 * dim * dim + dim * dim + 2 * dim * hidden)
        n_params += embed * 2 ** (len(depths) - 1) * num_classes
        total_t += n_params * 4 * 6 / mem_bw

    return {"seconds": total_t, "flops": total_flops,
            "clips_per_sec": batch / total_t}


def banded_attention_cost(groups: int, heads: int, frames: int, vtok: int,
                          head_dim: int, dtype_bytes: int = 4,
                          compact: bool = True) -> AttentionCost:
    """Roofline accounting for the banded (GATE/WGATE) attention op
    (VERDICT r2 item 6). ``edges`` counts the full (V, 3V) band either way
    (both impls cover the same edge set); ``dense_flops`` is what the chosen
    formulation issues — the compact identity-temporal form
    (`ops/attention.py::compact_banded_frame_attention`) does the (V, V)
    same-frame block + 2 elementwise temporal dots instead of (V, 3V)."""
    bhf = groups * heads * frames
    edges = bhf * vtok * 3 * vtok
    if compact:
        dense = bhf * 2 * (2 * vtok * vtok * head_dim) + bhf * 2 * (2 * vtok * head_dim)
    else:
        dense = bhf * 2 * (2 * vtok * 3 * vtok * head_dim)
    sparse = edges * 4 * head_dim
    io = bhf * vtok * head_dim * dtype_bytes * 4  # q, k, v, out (compulsory)
    return AttentionCost(edges=edges, dense_flops=dense, sparse_flops=sparse,
                         bytes_min=io)
