"""Child process for bench.py: measure one attention implementation on the
TPU and print a single JSON line {impl, time_us, edges}.

Run as: python bench_kernel.py {pallas|stacked} [units]
Isolated in a subprocess so a wedged remote compile can be timed out by the
parent without losing the whole benchmark.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _enable_compile_cache(jax):
    """Persistent compile cache: remote (relay) compiles dominate child wall
    time (~2-5 min each, and the relay degrades within a session). With the
    cache a re-measure of an already-compiled config costs seconds, which is
    what makes the driver's end-of-round bench.py run robust late in a
    session. Must go through jax.config.update: the axon sitecustomize
    imports jax at interpreter startup, so env vars set at module scope here
    are read too late."""
    if os.environ.get("BENCH_NO_CACHE") == "1":
        return
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _import_tile_masks(adj):
    import numpy as np

    from sl_hwgat_tpu.ops.pallas_attention import _tile_masks

    return _tile_masks(np.asarray(adj), 32, 32, 4)


def _timed_repeats(loop, x0, inner, outer, force, repeats=None):
    """Time `repeats` independent measurements, each `outer` chained calls of
    `loop` (one jitted fori_loop of `inner` ops) ended by one forced sync, and
    return per-op seconds for every repeat.

    Round-3 postmortem (VERDICT r3 item 1): a single timed measurement per
    config let ~25% session/relay variance decide the round headline (479µs
    in-session vs 598µs driver-measured for the same kernel). Repeats are
    nearly free — the compile is shared — and the median over ≥5 is robust to
    one slow relay round-trip. Each repeat keeps the round-3 structure
    (outer·inner ops per sync) so the relay's device→host sync cost stays
    amortized over ~100 ops exactly as before; repeats only add more of the
    same measurement, never a different one."""
    import time as _time

    repeats = repeats or int(os.environ.get("BENCH_REPEATS", "5"))
    y = loop(x0)
    force(y)  # warmup + compile; completion forced through the relay
    per_op = []
    for _ in range(repeats):
        t0 = _time.perf_counter()
        for _ in range(outer):
            y = loop(y)
        force(y)
        per_op.append((_time.perf_counter() - t0) / (outer * inner))
    return per_op


def _repeat_stats(per_op):
    import statistics

    med = statistics.median(per_op)
    return {
        "time_us": med * 1e6,
        "time_us_min": min(per_op) * 1e6,
        "time_us_max": max(per_op) * 1e6,
        "n_repeats": len(per_op),
        "spread_pct": round(100.0 * (max(per_op) - min(per_op)) / med, 1),
    }


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    units = int(sys.argv[2]) if len(sys.argv) > 2 else 12288

    import jax

    _enable_compile_cache(jax)
    if os.environ.get("BENCH_CPU") == "1":
        # syntax/numerics validation without touching the TPU relay (the axon
        # sitecustomize pins jax_platforms, so the env var alone is ignored)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sl_hwgat_tpu import graphs
    from sl_hwgat_tpu.ops.attention import stacked_window_attention
    from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention

    adj = graphs.windowed_block_adj(2)[0]
    nnz = int((adj != 0).sum())
    n_tok, dh = 32, 64
    r = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(r.normal(size=(units, n_tok, dh)).astype(np.float32))
        for _ in range(3)
    )

    if impl == "pair_tscore_bf16":
        # Headline estimator (round 4): the production kernel AND its XLA
        # shape calibration timed INTERLEAVED in one process, ratio taken
        # per pair, median ratio reported. Measuring them in separate
        # children let chip-state drift between the two measurements move
        # the ratio by ±0.03 (kernel 544–588µs and calib 462–525µs moved
        # TOGETHER across sessions but were sampled minutes apart).
        from sl_hwgat_tpu.ops.pallas_attention import _pack_t

        os.environ.setdefault("PALLAS_ATTN_BATCHED", "1")
        kp = _pack_t(jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16), 32, None, 4)[0]
        vp_ = _pack_t(jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16), 32, None, 4)[0]
        qp = _pack_t(jnp.swapaxes(q, 1, 2).astype(jnp.bfloat16), 32, None, 4)[0]

        kern_body = lambda qq: pallas_window_attention(
            qq, kp, vp_, adj, scale=0.125, stack=4,
            transposed="tscore_prepacked", out_dtype=jnp.bfloat16)

        T = units // 4
        ks2 = jnp.asarray(r.normal(size=(T, 128, 64)).astype(np.float32)
                          ).astype(jnp.bfloat16)

        def calib_body(x):
            s = jnp.einsum("tmk,tnk->tmn", x, ks2,
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return jnp.einsum("tmn,tnk->tmk", s, ks2,
                              preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        inner, outer = 30, 3
        rep = int(os.environ.get("BENCH_REPEATS", "5"))

        @jax.jit
        def loop_k(x):
            return jax.lax.fori_loop(0, inner, lambda i, y: kern_body(y), x)

        @jax.jit
        def loop_c(x):
            return jax.lax.fori_loop(0, inner, lambda i, y: calib_body(y), x)

        import statistics
        import time as _t

        def timed(loop, x0):
            y = x0
            t0 = _t.perf_counter()
            for _ in range(outer):
                y = loop(y)
            float(jnp.sum(y.astype(jnp.float32)))
            return (_t.perf_counter() - t0) / (outer * inner)

        # warm both compiles before any timing
        float(jnp.sum(loop_k(qp).astype(jnp.float32)))
        float(jnp.sum(loop_c(ks2).astype(jnp.float32)))
        pairs = []
        for _ in range(rep):
            tk = timed(loop_k, qp)
            tc = timed(loop_c, ks2)
            pairs.append((tk, tc))
        ratios = sorted(tc / tk for tk, tc in pairs)
        med_ratio = statistics.median(ratios)
        tks = [tk for tk, _ in pairs]
        rec = {
            "impl": impl, "edges": units * nnz,
            "time_us": statistics.median(tks) * 1e6,
            "time_us_min": min(tks) * 1e6,
            "time_us_max": max(tks) * 1e6,
            "n_repeats": rep,
            "spread_pct": round(100 * (max(tks) - min(tks))
                                / statistics.median(tks), 1),
            "calib_time_us": statistics.median(tc for _, tc in pairs) * 1e6,
            "ratio_vs_calib": round(med_ratio, 4),
            "ratio_min": round(ratios[0], 4),
            "ratio_max": round(ratios[-1], 4),
        }
        print(json.dumps(rec))
        return
    elif impl == "pallas":
        body = lambda q: pallas_window_attention(q, k, v, adj, scale=0.125, stack=4)
    elif impl in ("pallas_bwd", "pallas_bwd_bf16"):
        # forward + fused backward kernel (the train-step hot path): loop dq
        if impl.endswith("bf16"):
            k, v = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)

        def f(qq):
            o = pallas_window_attention(
                qq.astype(k.dtype), k, v, adj, scale=0.125, stack=4)
            return jnp.sum(o * o)

        body = lambda qq: jax.grad(f)(qq).astype(jnp.float32)
    elif impl == "pallas_dual":
        # dual-mask (tail-shift) mode: per_f=32 units/group, 3 groups
        tail = adj * (np.arange(32)[:, None] % 2 == np.arange(32)[None, :] % 2)
        body = lambda q: pallas_window_attention(
            q, k, v, adj, scale=0.125, stack=4,
            tail_adj=tail, units_per_group=32, groups=3)
    elif impl == "pallas_bf16":
        kb, vb = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        body = lambda q: pallas_window_attention(
            q.astype(jnp.bfloat16), kb, vb, adj, scale=0.125, stack=4)
    elif impl in ("pallas_tbf16", "pallas_tdual_bf16"):
        # transposed-layout kernel (minor dim 128): state is (U, dh, N) bf16.
        # NOTE (measured, batch-18/19): XLA does NOT cancel the interleaving
        # unpack/pack pair between iterations — this chain carries ~1.5ms of
        # relayouts; pallas_tpre_bf16 is the kernel-only measurement.
        kt = jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16)
        vt = jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16)
        q = jnp.swapaxes(q, 1, 2).astype(jnp.bfloat16)
        kwt = {}
        if impl == "pallas_tdual_bf16":
            tail = adj * (np.arange(32)[:, None] % 2 == np.arange(32)[None, :] % 2)
            kwt = dict(tail_adj=tail, units_per_group=32, groups=3)
        body = lambda qq: pallas_window_attention(
            qq, kt, vt, adj, scale=0.125, stack=4, transposed=True,
            out_dtype=jnp.bfloat16, **kwt)
    elif impl == "pallas_tpre_bf16":
        # KERNEL-ONLY truth for the transposed layout: state is pre-packed
        # (T, dh, SN) bf16 so the timing chain has no pack/unpack relayouts
        # (in the model those fuse into the qkv projection's output layout;
        # in a bare chain XLA materializes them — pallas_tbf16 measures that).
        from sl_hwgat_tpu.ops.pallas_attention import _pack_t

        kp = _pack_t(jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16), 32, None, 4)[0]
        vp_ = _pack_t(jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16), 32, None, 4)[0]
        q = _pack_t(jnp.swapaxes(q, 1, 2).astype(jnp.bfloat16), 32, None, 4)[0]
        body = lambda qq: pallas_window_attention(
            qq, kp, vp_, adj, scale=0.125, stack=4, transposed="prepacked",
            out_dtype=jnp.bfloat16)
    elif impl == "pallas_tspre_bf16":
        # KERNEL-ONLY truth for the transposed-SCORE production path
        # (transposed="tscore": sublane softmax, Sᵀ in VMEM — the batch-27/28
        # tmx/tmq schedule as wired into ops/pallas_attention.py).
        from sl_hwgat_tpu.ops.pallas_attention import _pack_t

        kp = _pack_t(jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16), 32, None, 4)[0]
        vp_ = _pack_t(jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16), 32, None, 4)[0]
        q = _pack_t(jnp.swapaxes(q, 1, 2).astype(jnp.bfloat16), 32, None, 4)[0]
        body = lambda qq: pallas_window_attention(
            qq, kp, vp_, adj, scale=0.125, stack=4,
            transposed="tscore_prepacked", out_dtype=jnp.bfloat16)
    elif impl in ("pallas_widepre_bf16", "pallas_widebwd_bf16"):
        # KERNEL-ONLY truth for the production WIDE path (transposed="wide"):
        # (H, DH, T_h, SN) model-layout inputs, per-supertile 128-aligned
        # lane slices (batched in-VMEM gather with PALLAS_ATTN_BATCHED=1 —
        # the batch-41 tsw_bstack schedule, 589.7µs raw probe).
        H = 8
        T, SN, DH = units // 4, 128, 64
        TH = T // H

        def widep(x):
            return jnp.swapaxes(x.reshape(H, TH, SN, DH), 2, 3).reshape(
                H, TH, DH, SN).transpose(0, 2, 1, 3).reshape(H, DH, TH, SN)

        kp = widep(k.astype(jnp.bfloat16))
        vp_ = widep(v.astype(jnp.bfloat16))
        q = widep(q.astype(jnp.bfloat16))
        if impl == "pallas_widebwd_bf16":
            def body(qq):
                def loss(qq_):
                    o = pallas_window_attention(
                        qq_, kp, vp_, adj, scale=0.125, stack=4,
                        transposed="wide", out_dtype=jnp.bfloat16)
                    return jnp.sum(o.astype(jnp.float32) ** 2), o
                (_, o), grads = jax.value_and_grad(loss, has_aux=True)(qq)
                return o + grads.astype(o.dtype)
        else:
            body = lambda qq: pallas_window_attention(
                qq, kp, vp_, adj, scale=0.125, stack=4, transposed="wide",
                out_dtype=jnp.bfloat16)
    elif impl == "pallas_tsbwd_bf16":
        # fwd + fused bwd through the transposed-score kernels (packing
        # relayouts included — the in-graph cost a model would pay unless the
        # qkv projection emits the transposed layout directly).
        kt = jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16)
        vt = jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16)
        q = jnp.swapaxes(q, 1, 2).astype(jnp.bfloat16)

        def fts(qq):
            o = pallas_window_attention(
                qq, kt, vt, adj, scale=0.125, stack=4, transposed="tscore",
                out_dtype=jnp.bfloat16)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        body = lambda qq: jax.grad(fts)(qq)
    elif impl == "pallas_tbwd_bf16":
        kt = jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16)
        vt = jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16)
        q = jnp.swapaxes(q, 1, 2).astype(jnp.bfloat16)

        def ft(qq):
            o = pallas_window_attention(
                qq, kt, vt, adj, scale=0.125, stack=4, transposed=True,
                out_dtype=jnp.bfloat16)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        body = lambda qq: jax.grad(ft)(qq)
    elif impl == "pallas_bwd_obf16":
        # fwd+bwd through the PRODUCTION config (bf16 in/out kernel store):
        # the round-1 bwd record (4133us) predates out_dtype and paid f32
        # cotangent streams.
        kb, vb = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        q = q.astype(jnp.bfloat16)

        def fo(qq):
            o = pallas_window_attention(
                qq, kb, vb, adj, scale=0.125, stack=4, out_dtype=jnp.bfloat16)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        body = lambda qq: jax.grad(fo)(qq)
    elif impl == "pallas_obf16":
        # conversion-free chain: bf16 in, bf16 out — the true fused-kernel
        # time without the XLA astype pass the f32-out measurement carries.
        kb, vb = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        q = q.astype(jnp.bfloat16)
        body = lambda qq: pallas_window_attention(
            qq, kb, vb, adj, scale=0.125, stack=4, out_dtype=jnp.bfloat16)
    elif impl.startswith("mm_"):
        # Round-2 MXU scheduling probes (matmul-only, no masking/softmax):
        #  mm_nt{,_bf16}: dot1 with a PRE-TRANSPOSED rhs (TG,DH,SN), standard
        #    (((1,),(0,)),...) contraction — tests whether Mosaic pays a
        #    per-tile transpose for the (((1,),(1,)),...) transposed-rhs form
        #    the round-1 kernel uses.
        #  mm_split{,_bf16}: all dot1s into a VMEM scratch, THEN all dot2s —
        #    two runs of independent same-shape matmuls, testing whether
        #    Mosaic pipelines back-to-back independent MXU ops better than
        #    the dependent dot1->dot2 chain per tile.
        #  mm_nt_split{,_bf16}: both changes combined.
        #  mm_dot1{,_bf16} / mm_dot1_nt{,_bf16}: ONE dot per tile (transposed
        #    vs standard form) — decomposes where the time goes.
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        T, SN, DH = units // 4, 128, 64
        TG = int(os.environ.get("PALLAS_ATTN_TG", "16"))
        dt = jnp.bfloat16 if impl.endswith("bf16") else jnp.float32
        base = impl[3:].removesuffix("_bf16")

        def dot_nn(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def dot_nt(a, b):
            return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        nt = "nt" in base
        split = "split" in base
        dot1_only = base.startswith("dot1")
        scratch = [pltpu.VMEM((TG, SN, SN), jnp.float32)] if split else []

        def kern(q_ref, kt_ref, o_ref, *s_ref):
            def dot1(g):
                return (dot_nn(q_ref[g], kt_ref[g]) if nt
                        else dot_nt(q_ref[g], q_ref[g]))

            if dot1_only:
                for g in range(TG):
                    o_ref[g] = dot1(g)[:, :DH]
            elif split:
                for g in range(TG):
                    s_ref[0][g] = dot1(g)
                for g in range(TG):
                    o_ref[g] = dot_nn(s_ref[0][g].astype(q_ref.dtype), q_ref[g])
            else:
                for g in range(TG):
                    o_ref[g] = dot_nn(dot1(g).astype(q_ref.dtype), q_ref[g])

        tile = pl.BlockSpec((TG, SN, DH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        tile_t = pl.BlockSpec((TG, DH, SN), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

        def mm(qq):
            qt = jnp.swapaxes(qq, 1, 2)  # (T, DH, SN) — transposed by XLA once
            return pl.pallas_call(
                kern, grid=(T // TG,), in_specs=[tile, tile_t], out_specs=tile,
                out_shape=jax.ShapeDtypeStruct((T, SN, DH), jnp.float32),
                scratch_shapes=scratch,
                interpret=jax.default_backend() != "tpu",
            )(qq.astype(dt), qt.astype(dt))

        body = lambda qq: mm(qq.reshape(T, SN, DH)).reshape(units, n_tok, dh)
    elif impl.startswith("floor_"):
        # Batch-15 floor probes. batch-14 found 1 dot/tile == 2 dots/tile
        # (1081 vs 1078µs) — compute is hidden; find the fixed cost.
        #  floor_copy{,_bf16}: o[g] = convert(q[g]) — pure stream floor.
        #  floor_dot1slim{,_bf16}: ONE dot per tile, single input stream.
        #  floor_bigm{,_bf16}: ONE (TG·128, 64)@(64,128) GEMM per grid step
        #    (shared rhs): does Mosaic reach XLA-like rates at large M?
        #  floor_sn256{,_bf16}: supertile 256 — T halves, per-tile GEMMs are
        #    (256,64)@(64,256) + (256,256)@(256,64): per-TILE overhead test.
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        dt = jnp.bfloat16 if impl.endswith("bf16") else jnp.float32
        base = impl[6:].removesuffix("_bf16")
        SN = 256 if base == "sn256" else 128
        DH = 64
        T = units // (SN // 32)  # supertiles of SN rows over units·32 tokens
        TG = int(os.environ.get("PALLAS_ATTN_TG", "16" if SN == 128 else "8"))

        def dot_nt(a, b):
            return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def dot_nn(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        # "pure" probes chain dt→dt with NO conversion pass in the timing
        # loop (batch-15 learning: the astype outside the kernel added an XLA
        # elementwise pass — ~143µs at these sizes — to every measurement).
        pure = "pure" in base
        out_dt = dt if pure else jnp.float32
        base = base.removeprefix("pure")

        if base == "copy":
            def kern(q_ref, o_ref):
                for g in range(TG):
                    o_ref[g] = q_ref[g].astype(out_dt)
        elif base == "slab":
            def kern(q_ref, o_ref):
                o_ref[:] = q_ref[:].astype(out_dt)  # one whole-block write
        elif base == "dot1slim":
            def kern(q_ref, o_ref):
                for g in range(TG):
                    o_ref[g] = dot_nt(q_ref[g], q_ref[g])[:, :DH].astype(out_dt)
        elif base == "bigm":
            def kern(q_ref, o_ref):
                qq = q_ref[:].reshape(TG * SN, DH)
                s = dot_nt(qq, q_ref[0])  # (TG·SN, SN) shared rhs
                o_ref[:] = s[:, :DH].reshape(TG, SN, DH).astype(out_dt)
        elif base == "sn256":
            def kern(q_ref, o_ref):
                for g in range(TG):
                    s = dot_nt(q_ref[g], q_ref[g])
                    o_ref[g] = dot_nn(s.astype(q_ref.dtype), q_ref[g]).astype(out_dt)
        else:
            raise SystemExit(f"unknown floor probe {impl}")

        tile = pl.BlockSpec((TG, SN, DH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

        def mm(qq):
            return pl.pallas_call(
                kern, grid=(T // TG,), in_specs=[tile], out_specs=tile,
                out_shape=jax.ShapeDtypeStruct((T, SN, DH), out_dt),
                interpret=jax.default_backend() != "tpu",
            )(qq)

        if pure:
            q = jnp.asarray(q.reshape(T, SN, DH)).astype(dt)
            body = mm
        else:
            body = lambda qq: mm(qq.reshape(T, SN, DH).astype(dt)).reshape(
                units, n_tok, dh)
    elif impl.startswith("tlay_"):
        # Batch-17: TRANSPOSED-LAYOUT probes. batch-16 found the copy floor
        # (589µs) is invariant to grid-step count — suspect: minor dim 64 is
        # half a 128-lane tile, so every stream is lane-padded 2×. These
        # probes hold q/k/v/out as (T, DH, SN) with minor dim 128:
        #  tlay_copy_bf16: pure copy of (T,64,128) — the padding test.
        #  tlay_mm_bf16:  S = dot((64,128)ᵀ-contract, ...) per tile +
        #                 Oᵀ = dot_nt(q, S) — both MXU ops, lanes full.
        #  tlay_fused_bf16: + reference-style mask/softmax between the dots.
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        dt = jnp.bfloat16 if impl.endswith("bf16") else jnp.float32
        base = impl[5:].removesuffix("_bf16")
        SN, DH = 128, 64
        T = units // 4
        TG = int(os.environ.get("PALLAS_ATTN_TG", "16"))

        def dot_tt(a, b):
            # a (DH, SN), b (DH, SN) → (SN, SN): contract leading dims
            return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def dot_nt(a, b):
            return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        if base == "copy":
            def kern(q_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    o_ref[g] = q_ref[g]
        elif base == "mm":
            def kern(q_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    s = dot_tt(q_ref[g], q_ref[g])           # (SN, SN) f32
                    o_ref[g] = dot_nt(q_ref[g], s.astype(q_ref.dtype)).astype(dt)
        elif base == "fused":
            from sl_hwgat_tpu.ops.pallas_attention import (_masked_attn_matrix,
                                                           _tile_masks)

            def kern(q_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    s = dot_tt(q_ref[g], q_ref[g])
                    a, _ = _masked_attn_matrix(s, al_ref[:], fl_ref[:], None, True)
                    o_ref[g] = dot_nt(q_ref[g], a.astype(q_ref.dtype)).astype(dt)
        else:
            raise SystemExit(f"unknown tlay probe {impl}")

        allowed_m, fill_m = _import_tile_masks(adj)
        tile = pl.BlockSpec((TG, DH, SN), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        mask = pl.BlockSpec((SN, SN), lambda i: (0, 0), memory_space=pltpu.VMEM)

        def mm(qq):
            return pl.pallas_call(
                kern, grid=(T // TG,), in_specs=[tile, mask, mask],
                out_specs=tile,
                out_shape=jax.ShapeDtypeStruct((T, DH, SN), dt),
                interpret=jax.default_backend() != "tpu",
            )(qq, jnp.asarray(allowed_m), jnp.asarray(fill_m))

        q = jnp.swapaxes(q.reshape(T, SN, DH), 1, 2).astype(dt)  # (T, DH, SN)
        body = mm
    elif impl.startswith("mix_"):
        # Batch-26: MIXED-LAYOUT probes. Batch-22 pinned the fused kernel to
        # its stream floor (845µs), set by 2× lane padding of minor-dim-64
        # bf16 streams; the all-transposed layout unpads the streams but lost
        # (1289µs — schedule stops overlapping). Asymmetric mix: only Q stays
        # row-major (T,SN,DH) (padded — keeps dot1 the natural nn form and
        # the masked-softmax schedule IDENTICAL to production), while K, V
        # stream and O writes transposed (T,DH,SN) — physically unpadded.
        #   S  = dot_nn(Q, Kᵀ)        (((1,),(0,)) — canonical matmul
        #   Oᵀ = dot_nt(Vᵀ, A)        (((1,),(1,)) — the form prod dot1 uses
        # Stream bytes: 5/8 of all-row-major → predicted floor ~530µs.
        #  mix_floor: zero-compute, exact stream config (the gate).
        #  mix_mm:    the two MXU dots only.
        #  mix_fused: full masking/softmax semantics (production-equivalent).
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from sl_hwgat_tpu.ops.pallas_attention import (_masked_attn_matrix,
                                                       _tile_masks)

        T, SN, DH = units // 4, 128, 64
        TG = int(os.environ.get("PALLAS_ATTN_TG", "16"))
        base = impl[4:]
        allowed_m, fill_m = _tile_masks(np.asarray(adj), 32, 32, 4)

        def dot_nn(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def dot_nt(a, b):
            return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        if base == "floor":
            def kern(q_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    qs = jnp.sum(q_ref[g].astype(jnp.float32))  # forces q load
                    o_ref[g] = ((kt_ref[g] + vt_ref[g]).astype(jnp.float32)
                                * qs).astype(jnp.bfloat16)
        elif base == "mm":
            def kern(q_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    s = dot_nn(q_ref[g], kt_ref[g])
                    o_ref[g] = dot_nt(vt_ref[g], s.astype(jnp.bfloat16)
                                      ).astype(jnp.bfloat16)
        elif base == "fused":
            def kern(q_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    q_g = q_ref[g]
                    s = dot_nn(q_g * jnp.asarray(0.125, q_g.dtype), kt_ref[g])
                    a, _ = _masked_attn_matrix(s, al_ref[:], fl_ref[:], None, True)
                    o_ref[g] = dot_nt(vt_ref[g], a.astype(jnp.bfloat16)
                                      ).astype(jnp.bfloat16)
        else:
            raise SystemExit(f"unknown mix probe {impl}")

        tile_q = pl.BlockSpec((TG, SN, DH), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        tile_t = pl.BlockSpec((TG, DH, SN), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        mask = pl.BlockSpec((SN, SN), lambda i: (0, 0), memory_space=pltpu.VMEM)

        qb = q.reshape(T, SN, DH).astype(jnp.bfloat16)
        vt0 = jnp.swapaxes(v.reshape(T, SN, DH), 1, 2).astype(jnp.bfloat16)
        kt0 = jnp.swapaxes(k.reshape(T, SN, DH), 1, 2).astype(jnp.bfloat16)

        def run(kk):
            # chain on the (T,DH,SN) k stream (output shape matches); q and v
            # are closure-captured constants — still re-streamed every call.
            return pl.pallas_call(
                kern, grid=(T // TG,),
                in_specs=[tile_q, tile_t, tile_t, mask, mask],
                out_specs=tile_t,
                out_shape=jax.ShapeDtypeStruct((T, DH, SN), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                interpret=jax.default_backend() != "tpu",
            )(qb, kk, vt0, jnp.asarray(allowed_m), jnp.asarray(fill_m))

        q = kt0
        body = run
    elif impl.startswith("tmx_"):
        # Batch-27: TRANSPOSED-SCORE mixed layout. Batch-26's mix_* showed
        # the (q rm, k/v/o transposed) config halves the stream floor (463µs)
        # but its dot2 form dot_nt(Vᵀ, A) needs A (f32, 128²) transposed per
        # tile — ~660µs of exposed serial work (mm 728 / fused 1134). This
        # variant computes the score matrix TRANSPOSED so no A-transpose ever
        # exists:
        #   Sᵀ = dot_nt(K, Q)        — both row-major; the exact form prod
        #                              dot1 uses (known fast)
        #   softmax over SUBLANES (keys are rows of Sᵀ)
        #   Oᵀ = dot_nn(Vᵀ, Aᵀ)      — K=keys on Aᵀ's sublanes: fully native
        # Streams: Q, K row-major (padded 2×), Vᵀ + Oᵀ unpadded = 6/8 of
        # production bytes → predicted floor ~560µs.
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from sl_hwgat_tpu.ops.pallas_attention import _nomax, _tile_masks

        T, SN, DH = units // 4, 128, 64
        TG = int(os.environ.get("PALLAS_ATTN_TG", "16"))
        base = impl[4:]
        allowed_m, fill_m = _tile_masks(np.asarray(adj), 32, 32, 4)
        allowed_T, fill_T = allowed_m.T.copy(), fill_m.T.copy()
        nomax = _nomax()

        def dot_nn(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def dot_nt(a, b):
            return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def masked_softmax_T(st, allowed_t, fill_t):
            keep = (allowed_t != 0) & (st != 0)
            st = jnp.where(keep, st, fill_t)
            if nomax:
                a = jnp.exp(st)
            else:
                a = jnp.exp(st - jnp.max(st, axis=0, keepdims=True))
            return a / jnp.sum(a, axis=0, keepdims=True)

        if base == "floor":
            def kern(q_ref, k_ref, vt_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    qs = jnp.sum(q_ref[g].astype(jnp.float32))
                    ks = jnp.sum(k_ref[g].astype(jnp.float32))
                    o_ref[g] = (vt_ref[g].astype(jnp.float32)
                                * (qs + ks)).astype(jnp.bfloat16)
        elif base == "mm":
            def kern(q_ref, k_ref, vt_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    st = dot_nt(k_ref[g], q_ref[g])
                    o_ref[g] = dot_nn(vt_ref[g], st.astype(jnp.bfloat16)
                                      ).astype(jnp.bfloat16)
        elif base == "fused":
            def kern(q_ref, k_ref, vt_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    qg = q_ref[g]
                    st = dot_nt(k_ref[g], qg * jnp.asarray(0.125, qg.dtype))
                    at = masked_softmax_T(st, al_ref[:], fl_ref[:])
                    o_ref[g] = dot_nn(vt_ref[g], at.astype(jnp.bfloat16)
                                      ).astype(jnp.bfloat16)
        else:
            raise SystemExit(f"unknown tmx probe {impl}")

        _nb = os.environ.get("PALLAS_ATTN_BUFS")
        _pm = pl.Buffered(buffer_count=int(_nb)) if _nb else None
        tile_rm = pl.BlockSpec((TG, SN, DH), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM, pipeline_mode=_pm)
        tile_t = pl.BlockSpec((TG, DH, SN), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM, pipeline_mode=_pm)
        mask = pl.BlockSpec((SN, SN), lambda i: (0, 0), memory_space=pltpu.VMEM)

        qb = q.reshape(T, SN, DH).astype(jnp.bfloat16)
        kb = k.reshape(T, SN, DH).astype(jnp.bfloat16)
        vt0 = jnp.swapaxes(v.reshape(T, SN, DH), 1, 2).astype(jnp.bfloat16)

        def run(vv):
            # chain on the (T,DH,SN) v stream; q/k are captured constants
            return pl.pallas_call(
                kern, grid=(T // TG,),
                in_specs=[tile_rm, tile_rm, tile_t, mask, mask],
                out_specs=tile_t,
                out_shape=jax.ShapeDtypeStruct((T, DH, SN), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                interpret=jax.default_backend() != "tpu",
            )(qb, kb, vv, jnp.asarray(allowed_T), jnp.asarray(fill_T))

        q = vt0
        body = run
    elif impl.startswith("tmq_"):
        # Batch-28: ALL-UNPADDED transposed-score layout. Combines the two
        # proven facts: (1) batch-26/27 — transposed (DH, SN) streams are
        # physically unpadded (mix_floor 463µs at 5/8 bytes, tmx_floor 548µs
        # at 6/8); (2) batch-27 — the transposed-score schedule (Sᵀ + sublane
        # softmax + Oᵀ = dot_nn(Vᵀ, Aᵀ)) overlaps VPU work fine (tmx_fused
        # 813µs, only 265µs over its floor). Here ALL FOUR streams are
        # (T, DH, SN): 4/8 of production bytes → predicted floor ~410µs.
        #   Sᵀ[k,q] = Σ_d Kᵀ[d,k]·Qᵀ[d,q] — contract dim 0 of both (the
        #   dot_tt form, measured at full MXU rate in the tlay probes)
        #   softmax over SUBLANES, then Oᵀ = dot_nn(Vᵀ, Aᵀ).
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from sl_hwgat_tpu.ops.pallas_attention import _nomax, _tile_masks

        T, SN, DH = units // 4, 128, 64
        TG = int(os.environ.get("PALLAS_ATTN_TG", "16"))
        base = impl[4:]
        allowed_m, fill_m = _tile_masks(np.asarray(adj), 32, 32, 4)
        allowed_T, fill_T = allowed_m.T.copy(), fill_m.T.copy()
        nomax = _nomax()

        def dot_tt(a, b):
            return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def dot_nn(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def masked_softmax_T(st, allowed_t, fill_t):
            keep = (allowed_t != 0) & (st != 0)
            st = jnp.where(keep, st, fill_t)
            if nomax:
                a = jnp.exp(st)
            else:
                a = jnp.exp(st - jnp.max(st, axis=0, keepdims=True))
            return a / jnp.sum(a, axis=0, keepdims=True)

        def bdot(a, b, ca, cb):
            return jax.lax.dot_general(
                a, b, (((ca,), (cb,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        def masked_softmax_Tb(st, allowed_t, fill_t):
            # batched (TG, SN_k, SN_q): keys on axis 1
            keep = (allowed_t[None] != 0) & (st != 0)
            st = jnp.where(keep, st, fill_t[None])
            if nomax:
                a = jnp.exp(st)
            else:
                a = jnp.exp(st - jnp.max(st, axis=1, keepdims=True))
            return a / jnp.sum(a, axis=1, keepdims=True)

        if base == "floor":
            def kern(qt_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    qs = jnp.sum(qt_ref[g].astype(jnp.float32))
                    ks = jnp.sum(kt_ref[g].astype(jnp.float32))
                    o_ref[g] = (vt_ref[g].astype(jnp.float32)
                                * (qs + ks)).astype(jnp.bfloat16)
        elif base == "bmm":
            # BATCHED MXU issue over the whole block: in the unpadded layout
            # the kernel is COMPUTE-bound (streams 415µs < MXU 477µs at the
            # XLA shape rate), so Mosaic's per-tile issue gap (~200µs,
            # tmq_mm 694µs) is now the long pole — one batched dot_general
            # per block is exactly the form the 477µs XLA calib uses.
            def kern(qt_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                st = bdot(kt_ref[:], qt_ref[:], 1, 1)       # (TG, SNk, SNq)
                o_ref[:] = bdot(vt_ref[:], st.astype(jnp.bfloat16),
                                2, 1).astype(jnp.bfloat16)  # (TG, DH, SNq)
        elif base == "bfused":
            def kern(qt_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                q = qt_ref[:]
                st = bdot(kt_ref[:], q * jnp.asarray(0.125, q.dtype), 1, 1)
                at = masked_softmax_Tb(st, al_ref[:], fl_ref[:])
                o_ref[:] = bdot(vt_ref[:], at.astype(jnp.bfloat16),
                                2, 1).astype(jnp.bfloat16)
        elif base == "mm":
            def kern(qt_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    st = dot_tt(kt_ref[g], qt_ref[g])
                    o_ref[g] = dot_nn(vt_ref[g], st.astype(jnp.bfloat16)
                                      ).astype(jnp.bfloat16)
        elif base == "fused":
            def kern(qt_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                for g in range(TG):
                    qg = qt_ref[g]
                    st = dot_tt(kt_ref[g], qg * jnp.asarray(0.125, qg.dtype))
                    at = masked_softmax_T(st, al_ref[:], fl_ref[:])
                    o_ref[g] = dot_nn(vt_ref[g], at.astype(jnp.bfloat16)
                                      ).astype(jnp.bfloat16)
        else:
            raise SystemExit(f"unknown tmq probe {impl}")

        _nb = os.environ.get("PALLAS_ATTN_BUFS")
        _pm = pl.Buffered(buffer_count=int(_nb)) if _nb else None
        tile_t = pl.BlockSpec((TG, DH, SN), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM, pipeline_mode=_pm)
        mask = pl.BlockSpec((SN, SN), lambda i: (0, 0), memory_space=pltpu.VMEM)

        qt0 = jnp.swapaxes(q.reshape(T, SN, DH), 1, 2).astype(jnp.bfloat16)
        kt0 = jnp.swapaxes(k.reshape(T, SN, DH), 1, 2).astype(jnp.bfloat16)
        vt0 = jnp.swapaxes(v.reshape(T, SN, DH), 1, 2).astype(jnp.bfloat16)

        def run(vv):
            # chain on the (T,DH,SN) v stream; q/k are captured constants
            return pl.pallas_call(
                kern, grid=(T // TG,),
                in_specs=[tile_t, tile_t, tile_t, mask, mask],
                out_specs=tile_t,
                out_shape=jax.ShapeDtypeStruct((T, DH, SN), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                interpret=jax.default_backend() != "tpu",
            )(qt0, kt0, vv, jnp.asarray(allowed_T), jnp.asarray(fill_T))

        q = vt0
        body = run
    elif impl.startswith("tsw_"):
        # Batch-41: MODEL-LAYOUT ("wide") transposed-score probes — round-4
        # queue #1. The production row-major path pays ~1.08ms/block of XLA
        # attn/reshape fusions writing 2×-lane-padded (·,·,64)-minor kernel
        # operands; the tscore path killed the padding but lost in-model to
        # the major-permute (h,dh,g,n)→(g·h,dh,n)→(t,dh,sn) around the call.
        # Here the kernel consumes the TransposedDense output DIRECTLY:
        # (h·dh, g, n) viewed as (H, DH, (g/4)·128) — a PURE RESHAPE (the
        # (g, n) axes are contiguous), zero relayout in or out. Blocks are
        # (1, DH, TG·SN) (last two dims (64, TG·128): 8/128-aligned, Mosaic-
        # legal); per-supertile planes are 128-aligned static lane slices,
        # which select whole (8,128) tiles — the probe measures whether that
        # slicing is free (unlike the sub-128 lp lane-slice tax, 1271µs).
        #   tsw_floor : zero-compute stream floor of the wide layout
        #   tsw_fused : unrolled tscore schedule on lane-sliced planes
        #   tsw_bstack: in-VMEM stack of slices → batched dots (tmq_bfused
        #               form, 487µs when fed pre-tiled blocks)
        #   tsw1_fused: one supertile per grid step ((1,DH,SN) blocks, no
        #               slicing) — measures the tiny-block grid overhead
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from sl_hwgat_tpu.ops.pallas_attention import _nomax, _tile_masks

        T, SN, DH, H = units // 4, 128, 64, 8
        TH = T // H  # supertiles per head row
        TG = int(os.environ.get("PALLAS_ATTN_TG", "16"))
        base = impl[4:]
        allowed_m, fill_m = _tile_masks(np.asarray(adj), 32, 32, 4)
        allowed_T, fill_T = allowed_m.T.copy(), fill_m.T.copy()
        nomax = _nomax()

        def dot_tt(a, b):
            return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def dot_nn(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def masked_softmax_T(st, allowed_t, fill_t):
            keep = (allowed_t != 0) & (st != 0)
            st = jnp.where(keep, st, fill_t)
            if nomax:
                a = jnp.exp(st)
            else:
                a = jnp.exp(st - jnp.max(st, axis=0, keepdims=True))
            return a / jnp.sum(a, axis=0, keepdims=True)

        def bdot(a, b, ca, cb):
            return jax.lax.dot_general(
                a, b, (((ca,), (cb,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        def masked_softmax_Tb(st, allowed_t, fill_t):
            keep = (allowed_t[None] != 0) & (st != 0)
            st = jnp.where(keep, st, fill_t[None])
            if nomax:
                a = jnp.exp(st)
            else:
                a = jnp.exp(st - jnp.max(st, axis=1, keepdims=True))
            return a / jnp.sum(a, axis=1, keepdims=True)

        one_tile = base.startswith("1")  # tsw1_*
        if one_tile:
            base = base.split("_", 1)[1]

        if one_tile:
            def kern(qt_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                qg = qt_ref[0]
                st = dot_tt(kt_ref[0], qg * jnp.asarray(0.125, qg.dtype))
                at = masked_softmax_T(st, al_ref[:], fl_ref[:])
                o_ref[0] = dot_nn(vt_ref[0], at.astype(jnp.bfloat16)
                                  ).astype(jnp.bfloat16)
        elif base == "floor":
            def kern(qt_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                qs = jnp.sum(qt_ref[0].astype(jnp.float32))
                ks = jnp.sum(kt_ref[0].astype(jnp.float32))
                o_ref[0] = (vt_ref[0].astype(jnp.float32)
                            * (qs + ks)).astype(jnp.bfloat16)
        elif base == "fused":
            def kern(qt_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                qw = qt_ref[0]
                kw = kt_ref[0]
                vw = vt_ref[0]
                for g in range(TG):
                    sl = slice(g * SN, (g + 1) * SN)
                    qg = qw[:, sl]
                    st = dot_tt(kw[:, sl], qg * jnp.asarray(0.125, qg.dtype))
                    at = masked_softmax_T(st, al_ref[:], fl_ref[:])
                    o_ref[0, :, sl] = dot_nn(
                        vw[:, sl], at.astype(jnp.bfloat16)).astype(jnp.bfloat16)
        elif base == "bstack":
            def kern(qt_ref, kt_ref, vt_ref, al_ref, fl_ref, o_ref):
                def tiles(w):  # (DH, TG·SN) → (TG, DH, SN) in-VMEM gather
                    return jnp.stack(
                        [w[:, g * SN:(g + 1) * SN] for g in range(TG)])

                q3 = tiles(qt_ref[0])
                st = bdot(tiles(kt_ref[0]),
                          q3 * jnp.asarray(0.125, q3.dtype), 1, 1)
                at = masked_softmax_Tb(st, al_ref[:], fl_ref[:])
                o3 = bdot(tiles(vt_ref[0]), at.astype(jnp.bfloat16), 2, 1)
                o_ref[0] = jnp.concatenate(
                    [o3[g] for g in range(TG)], axis=1).astype(jnp.bfloat16)
        else:
            raise SystemExit(f"unknown tsw probe {impl}")

        _nb = os.environ.get("PALLAS_ATTN_BUFS")
        _pm = pl.Buffered(buffer_count=int(_nb)) if _nb else None
        if one_tile:
            tile_w = pl.BlockSpec((1, DH, SN), lambda ih, it: (ih, 0, it),
                                  memory_space=pltpu.VMEM, pipeline_mode=_pm)
            grid = (H, TH)
            sem = ("parallel", "parallel")
        else:
            tile_w = pl.BlockSpec((1, DH, TG * SN),
                                  lambda ih, it: (ih, 0, it),
                                  memory_space=pltpu.VMEM, pipeline_mode=_pm)
            grid = (H, TH // TG)
            sem = ("parallel", "parallel")
        mask = pl.BlockSpec((SN, SN), lambda ih, it: (0, 0),
                            memory_space=pltpu.VMEM)

        def widen(x):  # (T, SN, DH) rm → (H, DH, TH·SN) model-wide layout
            return jnp.swapaxes(x.reshape(H, TH, SN, DH), 2, 3).reshape(
                H, TH, DH, SN).transpose(0, 2, 1, 3).reshape(H, DH, TH * SN)

        qt0 = widen(q.reshape(T, SN, DH)).astype(jnp.bfloat16)
        kt0 = widen(k.reshape(T, SN, DH)).astype(jnp.bfloat16)
        vt0 = widen(v.reshape(T, SN, DH)).astype(jnp.bfloat16)

        def run(vv):
            # chain on the (H, DH, TH·SN) v stream; q/k captured constants
            return pl.pallas_call(
                kern, grid=grid,
                in_specs=[tile_w, tile_w, tile_w, mask, mask],
                out_specs=tile_w,
                out_shape=jax.ShapeDtypeStruct((H, DH, TH * SN), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=sem),
                interpret=jax.default_backend() != "tpu",
            )(qt0, kt0, vv, jnp.asarray(allowed_T), jnp.asarray(fill_T))

        q = vt0
        body = run
    elif impl == "lp_fused_bf16":
        # LANE-PACKED TRANSPORT probe: batch-22 showed the fused kernel sits
        # within 2% of its zero-compute stream floor, and streams are 2×
        # lane-padded in HBM (minor dim 64). Here q/k/v/out are streamed as
        # (T/2, 128, 128) pairs (physically unpadded); the kernel statically
        # lane-slices each pair into two (128,64) tiles and runs the SAME
        # row-major fused schedule (full masking semantics, bf16 store).
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from sl_hwgat_tpu.ops.pallas_attention import (_masked_attn_matrix,
                                                       _tile_masks)

        T, SN, DH = units // 4, 128, 64
        T2 = T // 2
        TG2 = int(os.environ.get("PALLAS_ATTN_TG", "8"))
        allowed_m, fill_m = _tile_masks(np.asarray(adj), 32, 32, 4)

        def dot_nt(a, b):
            return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def kern(q_ref, k_ref, v_ref, al_ref, fl_ref, o_ref):
            for p in range(TG2):
                outs = []
                for hh in (0, 1):
                    sl = slice(hh * DH, (hh + 1) * DH)
                    qh = q_ref[p][:, sl]
                    kh = k_ref[p][:, sl]
                    vh = v_ref[p][:, sl]
                    s = dot_nt(qh * jnp.asarray(0.125, qh.dtype), kh)
                    a, _ = _masked_attn_matrix(s, al_ref[:], fl_ref[:], None, True)
                    outs.append(jnp.dot(a.astype(vh.dtype), vh,
                                        preferred_element_type=jnp.float32))
                o_ref[p] = jnp.concatenate(outs, axis=1).astype(jnp.bfloat16)

        tile = pl.BlockSpec((TG2, SN, 2 * DH), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        mask = pl.BlockSpec((SN, SN), lambda i: (0, 0), memory_space=pltpu.VMEM)

        def pack2(x):
            return jnp.swapaxes(x.reshape(T2, 2, SN, DH), 1, 2).reshape(
                T2, SN, 2 * DH)

        kp2 = pack2(k.reshape(T, SN, DH).astype(jnp.bfloat16))
        vp2 = pack2(v.reshape(T, SN, DH).astype(jnp.bfloat16))
        q = pack2(q.reshape(T, SN, DH).astype(jnp.bfloat16))  # prepacked state

        def run(qq):
            return pl.pallas_call(
                kern, grid=(T2 // TG2,), in_specs=[tile, tile, tile, mask, mask],
                out_specs=tile,
                out_shape=jax.ShapeDtypeStruct((T2, SN, 2 * DH), jnp.bfloat16),
                interpret=jax.default_backend() != "tpu",
            )(qq, kp2, vp2, jnp.asarray(allowed_m), jnp.asarray(fill_m))

        body = run
    elif impl.startswith("dmaflr_"):
        # Batch-22 diagnostics for the 589µs row-major copy floor:
        #  dmaflr_hbm: pure HBM→HBM async-copy per block, no VREG round trip —
        #    the true Pallas DMA floor (is 589µs DMA or VREG-copy?).
        #  dmaflr_3stream: copy with THREE bf16 input streams + 1 output —
        #    the real fwd kernel's stream configuration, zero compute.
        #  dmaflr_qkvpack: same bytes as 3stream but ONE packed (3,TG,SN,dh)
        #    input stream — does stream COUNT matter?
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        T, SN, DH = units // 4, 128, 64
        TG = int(os.environ.get("PALLAS_ATTN_TG", "16"))
        base = impl[7:]
        qb = q.reshape(T, SN, DH).astype(jnp.bfloat16)

        if base == "hbm":
            def kern(i_ref, o_ref, sem):
                i = pl.program_id(0)
                cp = pltpu.make_async_copy(
                    i_ref.at[pl.ds(i * TG, TG)], o_ref.at[pl.ds(i * TG, TG)], sem)
                cp.start()
                cp.wait()

            def mm(x):
                return pl.pallas_call(
                    kern, grid=(T // TG,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                    out_shape=jax.ShapeDtypeStruct((T, SN, DH), jnp.bfloat16),
                    scratch_shapes=[pltpu.SemaphoreType.DMA],
                    compiler_params=pltpu.CompilerParams(has_side_effects=True),
                    interpret=jax.default_backend() != "tpu",
                )(x)

            q = qb
            body = mm
        elif base == "3stream":
            def kern3(a_ref, b_ref, c_ref, o_ref):
                for g in range(TG):
                    o_ref[g] = a_ref[g] + b_ref[g] * 0 + c_ref[g] * 0

            tile = pl.BlockSpec((TG, SN, DH), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

            def mm3(x):
                return pl.pallas_call(
                    kern3, grid=(T // TG,), in_specs=[tile] * 3, out_specs=tile,
                    out_shape=jax.ShapeDtypeStruct((T, SN, DH), jnp.bfloat16),
                    interpret=jax.default_backend() != "tpu",
                )(x, k.reshape(T, SN, DH).astype(jnp.bfloat16),
                  v.reshape(T, SN, DH).astype(jnp.bfloat16))

            q = qb
            body = mm3
        elif base == "qkvpack":
            def kernp(qkv_ref, o_ref):
                for g in range(TG):
                    o_ref[g] = (qkv_ref[0, g] + qkv_ref[1, g] * 0
                                + qkv_ref[2, g] * 0)

            tile3 = pl.BlockSpec((3, TG, SN, DH), lambda i: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM)
            tile = pl.BlockSpec((TG, SN, DH), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
            packed = jnp.stack([
                qb, k.reshape(T, SN, DH).astype(jnp.bfloat16),
                v.reshape(T, SN, DH).astype(jnp.bfloat16)])

            def mmp(x):
                return pl.pallas_call(
                    kernp, grid=(T // TG,), in_specs=[tile3], out_specs=tile,
                    out_shape=jax.ShapeDtypeStruct((T, SN, DH), jnp.bfloat16),
                    interpret=jax.default_backend() != "tpu",
                )(packed)

            q = qb
            body = mmp
        else:
            raise SystemExit(f"unknown dma floor probe {impl}")
    elif impl.startswith("xrelay_"):
        # Batch-36: XLA relayout probes. The step profile (kernel_batch35)
        # shows ~18ms/step of "attn/reshape" HBM ops — the (g,n,h,dh) →
        # (g,h,n,dh) head-split transposes around the attention kernel.
        # Measure the bare XLA cost of that transpose at stage shapes vs a
        # same-bytes copy (roofline: ~95us for 100MB r+w at 1.05TB/s).
        #   xrelay_copy_bf16 | xrelay_s0_bf16 (g6144,h2) | xrelay_s2_bf16
        #   (g1536,h8) | and f32 variants | xrelay_s0pallas_bf16: the same
        #   relayout as a trivial Pallas kernel (strided BlockSpec read).
        base = impl[7:].removesuffix("_bf16").removesuffix("_f32")
        dt = jnp.bfloat16 if impl.endswith("bf16") else jnp.float32
        N, DH = 32, 64
        gg, hh = (6144, 2) if "s0" in base else (1536, 8)
        x0 = jnp.asarray(r.normal(size=(gg, N, hh, DH)).astype(np.float32)).astype(dt)

        if base == "copy":
            x0 = x0.reshape(gg * hh, N, DH)
            body = lambda t: t + jnp.asarray(1, dt)  # same-bytes r+w pass
        elif base in ("s0", "s2"):
            fwd = lambda t: t.transpose(0, 2, 1, 3).reshape(gg * hh, N, DH)
            bwd = lambda t: t.reshape(gg, hh, N, DH).transpose(0, 2, 1, 3)
            body = lambda t: bwd(fwd(t) + jnp.asarray(1, dt))  # round trip: 2 transposes
        elif base in ("s0pallas", "s2pallas"):
            import jax.experimental.pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            TGg = 16 // hh if hh <= 16 else 1

            def kern(x_ref, o_ref):
                # x block (TGg, N, hh, DH) → o block (TGg, hh, N, DH)
                o_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)

            bi = pl.BlockSpec((TGg, N, hh, DH), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
            bo = pl.BlockSpec((TGg, hh, N, DH), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)

            def prelay(t):
                return pl.pallas_call(
                    kern, grid=(gg // TGg,), in_specs=[bi], out_specs=bo,
                    out_shape=jax.ShapeDtypeStruct((gg, hh, N, DH), dt),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel",)),
                    interpret=jax.default_backend() != "tpu",
                )(t)

            body = lambda t: jnp.swapaxes(prelay(t), 1, 2)  # back via XLA? no —
            # chain shape must match input: swap back cheaply in XLA for the loop
        else:
            raise SystemExit(f"unknown xrelay probe {impl}")
        q = x0
    elif impl.startswith("xstrided_"):
        # Batch-39: can the fused kernel CONSUME the model layout directly?
        # The attn relayout fusions move ~375MB/block — exactly the 2×
        # lane-padded (.., 64)-minor kernel operands (batch-38 analysis).
        # Reading the UNPADDED (g, n, h, dh) tensor with a strided BlockSpec
        # (grid (g_tiles, h), block (TGg, n, 1, dh)) skips the materialized
        # relayout entirely IF the 128B-run DMA sustains copy bandwidth.
        #   xstrided_s0_bf16 (h=2) / xstrided_s2_bf16 (h=8): strided read →
        #   row-major supertile write (the kernel's input acquisition cost).
        #   xstrided_ref_bf16: same bytes from an already-flat (g*h, n, dh).
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        N, DH = 32, 64
        base = impl[9:].removesuffix("_bf16")
        gg, hh = (6144, 2) if base != "s2" else (1536, 8)
        TGg = 64 // hh  # supertile rows: TGg·N per head-slice block
        x0 = jnp.asarray(r.normal(size=(gg, N, hh, DH)).astype(np.float32)
                         ).astype(jnp.bfloat16)

        if base == "ref":
            xf = x0.transpose(0, 2, 1, 3).reshape(gg * hh, N, DH)

            def kernf(x_ref, o_ref):
                o_ref[:] = x_ref[:]

            tile = pl.BlockSpec((TGg * hh, N, DH), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

            def runf(t):
                return pl.pallas_call(
                    kernf, grid=(gg // TGg,), in_specs=[tile], out_specs=tile,
                    out_shape=jax.ShapeDtypeStruct((gg * hh, N, DH), jnp.bfloat16),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel",)),
                    interpret=jax.default_backend() != "tpu",
                )(t)

            q = xf
            body = runf
        else:
            def kern(x_ref, o_ref):
                o_ref[:] = x_ref[:, :, 0]  # (TGg, N, DH)

            bi = pl.BlockSpec((TGg, N, 1, DH), lambda i, j: (i, 0, j, 0),
                              memory_space=pltpu.VMEM)
            bo = pl.BlockSpec((TGg, N, DH), lambda i, j: (j * (gg // TGg) + i, 0, 0),
                              memory_space=pltpu.VMEM)

            def run(t):
                return pl.pallas_call(
                    kern, grid=(gg // TGg, hh), in_specs=[bi], out_specs=bo,
                    out_shape=jax.ShapeDtypeStruct((gg * hh, N, DH), jnp.bfloat16),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel", "parallel")),
                    interpret=jax.default_backend() != "tpu",
                )(t)

            # chain on the flat output; regenerate the 4-D view each iter via
            # reshape (major-axis only: (g*h,N,DH) → h-minor is wrong order —
            # use a fixed input and chain on a dummy scalar add instead)
            def body_(t):
                y = run(x0 + t[0, 0, 0].astype(jnp.bfloat16) * 0)
                return y

            q = jnp.zeros((gg * hh, N, DH), jnp.bfloat16)
            body = body_
    elif impl in ("matmul_only", "matmul_k128", "matmul_only_bf16"):
        # upper bound: the two supertile matmuls without masking/softmax.
        # matmul_k128 pads the contraction dim 64→128 with zeros: if the time
        # is unchanged, the MXU is latency/op-bound at K=64 (FLOPs are free)
        # and the lever is op count, not FLOP reduction.
        # matmul_only_bf16: same schedule in bf16 — the fused bf16 kernel's
        # MXU floor (fused-minus-this = VPU masking/softmax cost in bf16).
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        # Single operand plays q/k/v (timing-identical; avoids closure-captured
        # constants that blow the remote-compile request limit).
        T, SN, DH = units // 4, 128, 64
        pad_k = impl == "matmul_k128"
        if pad_k:
            DH = 128
        TG = int(os.environ.get("PALLAS_ATTN_TG", "8"))
        dt = jnp.bfloat16 if impl.endswith("bf16") else jnp.float32

        def kern(q_ref, o_ref):
            for g in range(TG):
                s = jax.lax.dot_general(q_ref[g], q_ref[g], (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                o_ref[g] = jax.lax.dot_general(
                    s.astype(q_ref.dtype), q_ref[g], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        tile = pl.BlockSpec((TG, SN, DH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

        def mm(qq):
            return pl.pallas_call(
                kern, grid=(T // TG,), in_specs=[tile], out_specs=tile,
                out_shape=jax.ShapeDtypeStruct((T, SN, DH), jnp.float32),
                interpret=jax.default_backend() != "tpu",
            )(qq.astype(dt))

        if pad_k:
            body = lambda qq: mm(jnp.pad(qq.reshape(T, SN, 64),
                                         [(0, 0), (0, 0), (0, 64)]))[
                :, :, :64].reshape(units, n_tok, dh)
        else:
            body = lambda qq: mm(qq.reshape(T, SN, DH)).reshape(units, n_tok, dh)
    elif impl == "softmax_only":
        # the complement diagnostic: same streaming + the full masked-softmax
        # VPU pass, but the two MXU dots replaced by one cheap concat. The
        # fused kernel's time should be ≈ max-ish(matmul_only, this) if MXU
        # and VPU overlap, or their sum if Mosaic serializes them.
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from sl_hwgat_tpu.ops.pallas_attention import (_masked_attn_matrix,
                                                       _tile_masks)

        T, SN, DH = units // 4, 128, 64
        TG = int(os.environ.get("PALLAS_ATTN_TG", "16"))
        allowed_m, fill_m = _tile_masks(np.asarray(adj), 32, 32, 4)

        def kern_sm(q_ref, al_ref, fl_ref, o_ref):
            for g in range(TG):
                s = jnp.concatenate([q_ref[g], q_ref[g]], axis=1)  # (SN, SN)
                a, _ = _masked_attn_matrix(s, al_ref[:], fl_ref[:], None, True)
                o_ref[g] = a[:, :DH]

        tile = pl.BlockSpec((TG, SN, DH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        mask = pl.BlockSpec((SN, SN), lambda i: (0, 0), memory_space=pltpu.VMEM)

        def sm(qq):
            return pl.pallas_call(
                kern_sm, grid=(T // TG,), in_specs=[tile, mask, mask],
                out_specs=tile,
                out_shape=jax.ShapeDtypeStruct((T, SN, DH), jnp.float32),
                interpret=jax.default_backend() != "tpu",
            )(qq, jnp.asarray(allowed_m), jnp.asarray(fill_m))

        body = lambda qq: sm(qq.reshape(T, SN, DH)).reshape(units, n_tok, dh)
    elif impl.startswith("banded_"):
        # GATE-shape banded attention: jnp (XLA) vs fused Pallas kernel.
        # Shapes: the FDMSE-ISL GATE config — B=16 clips, 8 heads, F=192
        # frames, V=29 joints (padded 32 in the kernel), dh=16.
        # edges per op = B·H·F·V·3V (the useful band, both impls equal).
        from sl_hwgat_tpu.graphs.adjacency import additive_mask
        from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES, edges_to_dense
        from sl_hwgat_tpu.ops.attention import (banded_frame_attention,
                                                compact_banded_frame_attention)
        from sl_hwgat_tpu.ops.pallas_banded import pallas_banded_frame_attention

        B, H, F, V, DH = 16, 8, 192, 29, 16
        eye = np.eye(V, dtype=np.float32)
        spatial = edges_to_dense(BODY29_EDGES, V, self_loops=False)
        band = np.stack([additive_mask(eye), additive_mask(spatial),
                         additive_mask(eye)])
        rb = np.random.default_rng(1)
        qb, kb, vb = (
            jnp.asarray(rb.normal(size=(B, H, F, V, DH)).astype(np.float32))
            for _ in range(3)
        )
        dt = jnp.bfloat16 if impl.endswith("bf16") else jnp.float32
        kb, vb = kb.astype(dt), vb.astype(dt)
        bandj = jnp.asarray(band)
        nnz = B * H * F * V * 3 * V

        if "packedpre" in impl:
            # kernel-only truth: inputs pre-packed (GH, dh, F·Vp), the chain
            # carries no pack/unpack relayouts (cf. pallas_tspre_bf16)
            from sl_hwgat_tpu.ops.pallas_banded import (
                _cache_band, _fwd_kernel_packed, _pack_plane, _packed_call,
                _packed_masks)

            bkey = _cache_band(band)
            masks = _packed_masks(bkey, 32, F)
            kp_, vp_ = (_pack_plane(x.astype(dt), 32) for x in (kb, vb))
            qb = _pack_plane(qb.astype(dt), 32)
            attn = lambda qq: _packed_call(
                _fwd_kernel_packed, 1, qq, kp_, vp_, (), masks,
                scale=0.25, vp=32, out_dtype=dt)
        elif "packed" in impl:
            from sl_hwgat_tpu.ops.pallas_banded import \
                pallas_packed_banded_attention

            odt = dt if impl.endswith("bf16") else jnp.float32
            attn = lambda qq: pallas_packed_banded_attention(
                qq.astype(dt), kb, vb, band, scale=0.25, out_dtype=odt)
        elif "pallas" in impl:
            attn = lambda qq: pallas_banded_frame_attention(
                qq.astype(dt), kb, vb, band, scale=0.25)
        elif "compact" in impl:
            # identity-temporal compact form (3x less SDDMM/SpMM work; equal
            # numerics — ops/attention.py::compact_banded_frame_attention)
            spj = jnp.asarray(band[1])
            attn = lambda qq: compact_banded_frame_attention(
                qq.astype(dt), kb, vb, spj, scale=0.25)
        else:
            attn = lambda qq: banded_frame_attention(
                qq.astype(dt), kb, vb, bandj, scale=0.25)
        if "bwd" in impl:
            fb = lambda qq: jnp.sum(attn(qq).astype(jnp.float32) ** 2)
            inner_body = lambda qq: jax.grad(fb)(qq).astype(qq.dtype)
        elif "packedpre" in impl:
            inner_body = attn  # conversion-free chain (dt in, dt out)
        else:
            inner_body = lambda qq: attn(qq).astype(jnp.float32)

        inner, outer = 20, 3

        @jax.jit
        def loopb(x):
            return jax.lax.fori_loop(0, inner, lambda i, y: inner_body(y), x)

        per_op = _timed_repeats(loopb, qb, inner, outer,
                                lambda y: float(jnp.sum(y)))
        rec = {"impl": impl, "edges": nnz}
        rec.update(_repeat_stats(per_op))
        rec["edges_per_sec"] = nnz / (rec["time_us"] / 1e6)
        print(json.dumps(rec))
        return
    elif impl.startswith("ell_"):
        # GATE-shape TRUE gather/scatter ELL attention (edge-space SDDMM +
        # edge softmax + gather-SpMM, `ops/sparse_attention.py`) on the SAME
        # spatio-temporal topology the banded op covers: F·V = 5568 nodes,
        # neighbors = same-frame spatial edges + self + ±1-frame same-joint.
        # Head-to-head with `banded_xla` (3303µs fwd f32 on this chip) to
        # settle the sparse-regime policy with on-chip data (VERDICT item 4).
        from sl_hwgat_tpu.graphs.adjacency import dense_to_ell
        from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES, edges_to_dense
        from sl_hwgat_tpu.ops.sparse_attention import ell_graph_attention

        B, H, F, V, DH = 16, 8, 192, 29, 16
        T = F * V
        spatial = edges_to_dense(BODY29_EDGES, V, self_loops=False)
        dense = np.zeros((T, T), np.float32)
        for f in range(F):
            s = slice(f * V, (f + 1) * V)
            dense[s, s] = spatial
            if f > 0:
                p = slice((f - 1) * V, f * V)
                dense[s, p] = np.eye(V)
                dense[p, s] = np.eye(V)
        col_idx, valid = dense_to_ell(dense)
        nnz = B * H * int(valid.sum())

        rb = np.random.default_rng(1)
        dt = jnp.bfloat16 if impl.endswith("bf16") else jnp.float32
        qe, ke, ve = (
            jnp.asarray(rb.normal(size=(B, H, T, DH)).astype(np.float32)).astype(dt)
            for _ in range(3)
        )
        colj, valj = jnp.asarray(col_idx), jnp.asarray(valid)

        def attn(qq):
            return ell_graph_attention(qq, ke, ve, colj, valj, scale=0.25)

        if "bwd" in impl:
            fb = lambda qq: jnp.sum(attn(qq) ** 2)
            inner_body = lambda qq: jax.grad(fb)(qq).astype(dt)
        else:
            inner_body = lambda qq: attn(qq).astype(dt)

        inner, outer = 20, 3

        @jax.jit
        def loope(x):
            return jax.lax.fori_loop(0, inner, lambda i, y: inner_body(y), x)

        per_op = _timed_repeats(loope, qe, inner, outer,
                                lambda y: float(jnp.sum(y.astype(jnp.float32))))
        rec = {"impl": impl, "edges": nnz}
        rec.update(_repeat_stats(per_op))
        rec["edges_per_sec"] = nnz / (rec["time_us"] / 1e6)
        print(json.dumps(rec))
        return
    elif impl.startswith("calib_"):
        # Chip/shape calibration probes. Results feed bench.py's roofline:
        #  calib_big_{f32,bf16}: 2048^3 dense matmul -> overall MXU peak
        #  calib_shape_{f32,bf16}: the kernel's exact batched shapes
        #    (T,128,64)@(T,64,128) + (T,128,128)@(T,128,64) via XLA einsum
        #    -> the achievable speed of light for this op's shape class
        dt = jnp.bfloat16 if impl.endswith("bf16") else jnp.float32
        if "big" in impl:
            m = jnp.asarray(r.normal(size=(2048, 2048)).astype(np.float32)).astype(dt)

            def body_mm(x):
                return jax.lax.dot_general(
                    x, m, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt)

            flops_per_op = 2 * 2048**3
            x0 = m
        else:
            T = units // 4
            ks2 = jnp.asarray(r.normal(size=(T, 128, 64)).astype(np.float32)).astype(dt)

            def body_mm(x):
                s = jnp.einsum("tmk,tnk->tmn", x, ks2,
                               preferred_element_type=jnp.float32).astype(dt)
                return jnp.einsum("tmn,tnk->tmk", s, ks2,
                                  preferred_element_type=jnp.float32).astype(dt)

            flops_per_op = T * 2 * 2 * 128 * 128 * 64
            x0 = ks2

        inner, outer = 30, 3

        @jax.jit
        def loop_mm(x):
            return jax.lax.fori_loop(0, inner, lambda i, y: body_mm(y), x)

        per_op = _timed_repeats(loop_mm, x0, inner, outer,
                                lambda y: float(jnp.sum(y.astype(jnp.float32))))
        rec = {"impl": impl}
        rec.update(_repeat_stats(per_op))
        rec["tflops"] = flops_per_op / (rec["time_us"] / 1e6) / 1e12
        print(json.dumps(rec))
        return
    elif impl in ("hybrid", "hybrid_bf16"):
        from sl_hwgat_tpu.ops.hybrid_attention import hybrid_window_attention

        if impl.endswith("bf16"):
            kb, vb = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
            body = lambda q: hybrid_window_attention(
                q.astype(jnp.bfloat16), kb, vb, adj, scale=0.125, stack=4
            ).astype(jnp.float32)
        else:
            body = lambda q: hybrid_window_attention(q, k, v, adj, scale=0.125, stack=4)
    elif impl in ("hybrid_bwd", "hybrid_bwd_bf16"):
        from sl_hwgat_tpu.ops.hybrid_attention import hybrid_window_attention

        if impl.endswith("bf16"):
            k, v = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)

        def fh(qq):
            o = hybrid_window_attention(
                qq.astype(k.dtype), k, v, adj, scale=0.125, stack=4)
            return jnp.sum(o * o)

        body = lambda qq: jax.grad(fh)(qq).astype(jnp.float32)
    elif impl == "stacked_bf16":
        kb, vb = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        body = lambda q: stacked_window_attention(
            q.astype(jnp.bfloat16), kb, vb, adj, scale=0.125, stack=4)
    else:
        body = lambda q: stacked_window_attention(q, k, v, adj, scale=0.125, stack=4)

    inner, outer = 30, 3

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, inner, lambda i, y: body(y), x)

    per_op = _timed_repeats(loop, q, inner, outer,
                            lambda y: float(jnp.sum(y.astype(jnp.float32))))
    rec = {"impl": impl, "edges": units * nnz}
    rec.update(_repeat_stats(per_op))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
