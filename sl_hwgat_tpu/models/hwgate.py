"""HWGATE — Hierarchical Windowed Graph Attention Transformer Encoder (flagship).

TPU-native re-design of reference `hwgat/models/HWGATE.py:8-360`:

- window partition/reverse are pure layout maps (`ops/window.py`);
- the adjacency-masked MSA runs through the stacked-supertile path
  (`ops/attention.py`): (window, head) units of 32 tokens × head_dim 64 are
  packed 4-at-a-time into 128-row supertiles so both attention matmuls are
  MXU-shaped;
- the reference's shifted-window mask (`HWGATE.py:169-187`) is all-ones for
  every temporal group except the last, where it blocks attention between
  wrapped and non-wrapped frames (Swin semantics, multiplicative {1,0}).
  Instead of carrying an (f·nW, N, N) mask tensor, shifted blocks split the
  groups into [0, f-1) ("main", plain adjacency) and the last group ("tail",
  adjacency ∧ shift mask) and run the stacked kernel twice — static shapes,
  identical numerics;
- the train-time random attention pruning (`HWGATE.py:94-100`) draws one
  uniform scalar per MSA call from the ``prune`` RNG stream;
- zero-score quirk (`HWGATE.py:110`) is always on to match training numerics.

Default hyperparameters follow ``HWGATEParams`` (`models/model_params.py:243-259`):
embed 128, TP=2, depths (2,2,4), heads (2,4,8), window 16, ff_ratio 2.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sl_hwgat_tpu.graphs.adjacency import windowed_block_adj
from sl_hwgat_tpu.models.common import (
    DENSE_INIT,
    DenseFromTransposed,
    DenseFromWide,
    FastDropout,
    FastLayerNorm,
    FeatureDense,
    FeatureDenseFromWide,
    FeatureFeedForward,
    FeedForward,
    FourierEmbed,
    PositionalEncoding,
    TransposedDense,
    layer_norm,
)
from sl_hwgat_tpu.ops.attention import stacked_window_attention
from sl_hwgat_tpu.ops.window import (
    feature_major_entry,
    feature_major_roll,
    feature_major_temporal_merge,
    temporal_merge,
    window_partition,
    window_reverse,
)


def _supertile_stack(tokens: int) -> tuple[int, int | None]:
    """Choose (stack, pad_tokens) so stack·pad ≈ 128 MXU rows."""
    if tokens >= 128:
        return 1, None
    pad = tokens
    if tokens % 8 != 0:
        pad = ((tokens + 7) // 8) * 8
    stack = max(1, 128 // pad)
    return stack, (pad if pad != tokens else None)


def shift_tail_mask(tokens_per_frame: int, temporal_patch: int, shift: int) -> "np.ndarray":
    """Shift mask for the LAST temporal group of a shifted block.

    Tokens are ordered (frame-in-patch, joint); the first
    ``(TP-shift)·tokens_per_frame`` rows hold ordinary frames, the rest hold
    wrapped frames, and cross attention between the two segments is blocked.
    ≡ `HWGATE.py:169-183` / `HGATE.py:156-171` evaluated at the last group.
    """
    import numpy as np

    n = temporal_patch * tokens_per_frame
    split = (temporal_patch - shift) * tokens_per_frame
    m = np.zeros((n, n), dtype=np.float32)
    m[:split, :split] = 1.0
    m[split:, split:] = 1.0
    return m


class WindowedMSA(nn.Module):
    """Multi-head self-attention over token windows with a shared
    multiplicative adjacency mask. ≡ `HWGATE.py:65-118` (prune=True) and
    `HGATE.py:65-108` (prune=False).

    ``groups_per_clip``: number of window groups per batch element, laid out
    (f, nW); when ``tail_shift_mask`` is set, the groups of the last temporal
    index additionally apply it (shifted-block Swin masking).
    """

    dim: int
    num_heads: int
    adj: tuple  # hashable static (N, N) {0,1} mask (tuple of tuples)
    windows_per_frame: int = 4
    temporal_groups: int = 1  # f = frames // temporal_patch at this stage
    prune: bool = False
    tail_shift_mask: tuple | None = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    # 'auto' → fused Pallas kernel on TPU, jnp stacked path elsewhere;
    # 'stacked' is also the right choice under GSPMD sharding (partitionable).
    attn_impl: str = "auto"
    # 'float32' (exact reference parity) or 'bfloat16' (fast path: q/k/v and
    # the AV matmul in bf16, scores/softmax accumulated in f32).
    attn_dtype: str = "float32"
    # mixed precision for the qkv/proj projections (params stay f32); implies
    # bf16 attention when set to 'bfloat16'.
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        g, n, d = x.shape
        h = self.num_heads
        dh = d // h
        scale = dh**-0.5
        cdt = jnp.dtype(self.compute_dtype)
        attn_bf16 = self.attn_dtype == "bfloat16" or cdt == jnp.bfloat16

        impl = self.attn_impl
        if impl == "auto":
            import jax

            # Measured policy (v5e, tools/kernel_batch*_results.jsonl): the
            # fully-fused kernel wins both in isolation fwd (1191 vs 1782µs
            # bf16) and in the FULL train step (170.7 vs 184.6ms at batch 16)
            # — the hybrid's isolated fwd+bwd win (3194 vs 4199µs) does not
            # survive in-graph, where its (T,SN,SN) score round-trips contend
            # with the projection GEMMs' HBM traffic. Hybrid stays selectable
            # via attn_impl='hybrid' / --attn-impl.
            impl = "pallas" if jax.default_backend() == "tpu" else "stacked"

        from sl_hwgat_tpu.parallel import kernel_sharding

        stack0, stack0_pad = _supertile_stack(n)
        tp = kernel_sharding.tp_size()
        # Factored sharding: arrays stay 4-D (h, g, n, dh); tp splits heads,
        # dp/sp split groups — zero-movement entry into the shard_map (the
        # flat head-major contiguous split it replaces put EVERY mesh axis on
        # the head axis at stage 2 and forced a replicate+slice of q/k/v).
        factored = impl == "pallas" and tp > 1 and h % tp == 0
        import os

        # PALLAS_ATTN_TRANSPOSED: "1" = lane-softmax transposed kernel,
        # "tscore" = transposed-score (sublane-softmax) kernel — see
        # ops/pallas_attention.py::_fwd_kernel_ts. The transposed (U, dh, N)
        # streams are physically UNPADDED (minor dim 128 vs the 2×
        # lane-padded (N, dh=64) blocks); the projections emit/consume the
        # transposed layout directly via dot_general dimension numbers
        # (TransposedDense/DenseFromTransposed), so no activation transpose
        # is materialized around the kernel.
        t_env = os.environ.get("PALLAS_ATTN_TRANSPOSED", "0")
        use_t = (
            impl == "pallas"
            and not factored
            and t_env in ("1", "tscore")
            and (self.tail_shift_mask is None
                 or (self.windows_per_frame * h) % stack0 == 0)
        )
        # 'wide' (round-4 #1): the kernel consumes the (h·dh, g, n)
        # TransposedDense output as a PURE VIEW (H, DH, G/stack, stack·n) —
        # no relayout in, none out (DenseFromWide contracts (h, dh) directly).
        # Units are h-major; supertiles stack `stack0` consecutive groups, so
        # shifted blocks need windows_per_frame % stack == 0 (a supertile
        # never straddles temporal groups). Single-chip layout: disabled
        # under a sharded-attention context.
        use_wide = (
            impl == "pallas"
            and not factored
            and t_env == "wide"
            and stack0_pad is None
            and (stack0 * n) % 128 == 0
            and g % stack0 == 0
            and (self.tail_shift_mask is None
                 or self.windows_per_frame % stack0 == 0)
            and not kernel_sharding.has_context()
        )
        if use_wide:
            use_t = False
        # Separate q/k/v projections instead of a fused (d, 3d) qkv Dense:
        # each kernel's output features are HEAD-MAJOR (h, dh), so a Megatron
        # column split P(None, 'tp') lands exactly on head groups and stays
        # expressible through every reshape down to the kernel call — the
        # fused layout's (3, h, dh) column order makes the tp split cross the
        # q/k boundary, which GSPMD can only fix by replicating (involuntary
        # full remat at every stage-2 block, VERDICT r2 item 2).
        if use_wide:
            # (d, g, n) → (h, dh, g/stack, stack·n): pure view, zero copies
            q, k, v = (
                TransposedDense(d, dtype=cdt, name=nm)(x)
                .reshape(h, dh, g // stack0, stack0 * n)
                for nm in ("q", "k", "v")
            )
        elif use_t:
            # feature-major projections: (d, g, n) → (g·h, dh, n), only
            # major-axis permutes (the token axis stays minor throughout)
            q, k, v = (
                TransposedDense(d, dtype=cdt, name=nm)(x)
                .reshape(h, dh, g, n).transpose(2, 0, 1, 3).reshape(g * h, dh, n)
                for nm in ("q", "k", "v")
            )
        else:
            qh, kh, vh = (
                nn.Dense(d, kernel_init=DENSE_INIT, dtype=cdt, name=nm)(x)
                .reshape(g, n, h, dh) for nm in ("q", "k", "v")
            )
            if factored:
                q, k, v = (t.transpose(2, 0, 1, 3) for t in (qh, kh, vh))  # (H,G,N,dh)
            else:
                # head-minor unit order (b, f, nW, h): contiguous dp/sp splits
                # land on batch/frames, aligned with the producer sharding
                q, k, v = (t.transpose(0, 2, 1, 3).reshape(g * h, n, dh)
                           for t in (qh, kh, vh))
        if attn_bf16:
            q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
        elif q.dtype != jnp.float32:
            q, k, v = (t.astype(jnp.float32) for t in (q, k, v))
        if os.environ.get("PALLAS_ATTN_RELAYOUT") == "split":
            # probe knob: keep XLA from mega-fusing the head-split relayouts
            # of q/k/v with surrounding passes (the fused form measured
            # 345 GB/s moving ~375MB/block — tools/kernel_batch35/36)
            import jax

            q, k, v = jax.lax.optimization_barrier((q, k, v))

        prune_u = None
        if self.prune and train:
            # One uniform scalar per MSA call, shared across the batch
            # (reference: torch.rand(1), `HWGATE.py:96`).
            import jax

            prune_u = jax.random.uniform(self.make_rng("prune"), ())

        stack, pad = _supertile_stack(n)
        adj = np.asarray(self.adj, dtype=np.float32)  # static: baked into the kernel
        nw = self.windows_per_frame
        f = self.temporal_groups
        tail_adj = None
        if self.tail_shift_mask is not None:
            tail_adj = adj * np.asarray(self.tail_shift_mask, dtype=np.float32)

        if factored:
            # 4-D (H, G, N, dh) arrays: tp shards heads, dp/sp shard groups —
            # zero-movement shard_map entry (see kernel_sharding.call_factored)
            kwf = dict(scale=scale, stack=stack, pad_tokens=pad, prune_u=prune_u,
                       out_dtype=jnp.bfloat16 if attn_bf16 else None)
            if tail_adj is not None:
                kwf.update(tail_adj=tail_adj, units_per_group=nw, groups=f)
            out = kernel_sharding.call_factored(q, k, v, adj, **kwf)
            if out is not None:
                out = out.astype(cdt).transpose(1, 2, 0, 3).reshape(g, n, d)
                out = nn.Dense(d, kernel_init=DENSE_INIT, dtype=cdt, name="proj")(out)
                return FastDropout(self.proj_drop, deterministic=not train)(out)
            # context/shape made the factored split inapplicable — fall back
            # to the flat head-minor unit order
            factored = False
            q, k, v = (t.transpose(0, 2, 1, 3).reshape(g * h, n, dh)
                       for t in (qh, kh, vh))
            if attn_bf16:
                q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
            elif q.dtype != jnp.float32:
                q, k, v = (t.astype(jnp.float32) for t in (q, k, v))

        def fused(qu, ku, vu, mask, **tail_kw):
            """Fused attention — per-shard under shard_map when a
            `parallel.kernel_sharding` context is active. 'hybrid' = XLA
            batched GEMMs + fused Pallas masked-softmax (one HBM round-trip
            of scores); 'pallas' = fully-fused kernel (scores never leave
            VMEM). See ops/hybrid_attention.py for the on-chip tradeoff."""
            from sl_hwgat_tpu.parallel import kernel_sharding

            kw = dict(scale=scale, stack=stack, pad_tokens=pad,
                      prune_u=prune_u, **tail_kw)
            if impl == "pallas" and attn_bf16:
                # bf16 store halves the kernel's output HBM traffic; the
                # MXU accumulates f32 and the model casts to compute_dtype
                # right after anyway (rounding moves into the kernel store).
                kw["out_dtype"] = jnp.bfloat16
            if use_wide:
                kw["transposed"] = "wide"
            elif use_t:
                kw["transposed"] = "tscore" if t_env == "tscore" else True
            out = kernel_sharding.call_sharded(qu, ku, vu, mask, impl=impl, **kw)
            if out is None:
                if impl == "hybrid":
                    from sl_hwgat_tpu.ops.hybrid_attention import hybrid_window_attention

                    kw.pop("out_dtype", None)
                    out = hybrid_window_attention(qu, ku, vu, mask, **kw)
                else:
                    from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention

                    out = pallas_window_attention(qu, ku, vu, mask, **kw)
            return out

        def attend(qu, ku, vu, mask):
            if impl in ("pallas", "hybrid"):
                return fused(qu, ku, vu, mask)
            return stacked_window_attention(
                qu, ku, vu, mask, scale=scale, stack=stack, pad_tokens=pad,
                prune_u=prune_u,
            )

        if self.tail_shift_mask is None:
            out = attend(q, k, v, adj)
        else:
            u = g * h
            per_f = nw * h

            # Unit order is (b, f, nW, h): window_partition flattens (b, f, nW)
            # major→minor and heads were appended after the group index, so the
            # shift-masked units are the last per_f of every f consecutive
            # groups of per_f.
            if use_wide:
                # one fused call; per head row the temporal-group period is
                # nw groups (units are h-major in the wide layout)
                out = fused(q, k, v, adj, tail_adj=tail_adj,
                            units_per_group=nw, groups=f)
            elif impl in ("pallas", "hybrid") and per_f % stack == 0:
                # One fused kernel over all units: the kernel selects the plain
                # vs shift-masked adjacency per supertile (no split/concat HBM
                # round-trip, uniform unit axis for sharding).
                out = fused(q, k, v, adj, tail_adj=tail_adj,
                            units_per_group=per_f, groups=f)
            else:
                # Split units by temporal group: [0, f-1) use the plain
                # adjacency, the last group also applies the shift mask.
                def split(t):
                    t = t.reshape(-1, f, per_f, n, dh)
                    return (t[:, : f - 1].reshape(-1, n, dh),
                            t[:, f - 1 :].reshape(-1, n, dh))

                (qm, qt), (km, kt), (vm, vt) = split(q), split(k), split(v)
                parts = []
                if f > 1:
                    parts.append(attend(qm, km, vm, adj).reshape(-1, f - 1, per_f, n, dh))
                parts.append(attend(qt, kt, vt, tail_adj).reshape(-1, 1, per_f, n, dh))
                out = jnp.concatenate(parts, axis=1).reshape(u, n, dh)

        if use_wide:
            # (H, DH, T_h, SN) → (h, dh, g, n) is a pure view; the projection
            # contracts (h, dh) in place — zero-relayout exit
            out = DenseFromWide(d, dtype=cdt, name="proj")(
                out.astype(cdt).reshape(h, dh, g, n))
        elif use_t:
            # consume the kernel's transposed (U, dh, N) output directly in
            # the projection's dot_general — no materialized relayout
            out = DenseFromTransposed(d, dtype=cdt, name="proj")(
                out.astype(cdt).reshape(g, h, dh, n))
        else:
            out = out.astype(cdt).reshape(g, h, n, dh).transpose(0, 2, 1, 3).reshape(g, n, d)
            out = nn.Dense(d, kernel_init=DENSE_INIT, dtype=cdt, name="proj")(out)
        return FastDropout(self.proj_drop, deterministic=not train)(out)


class PartAttentionBlock(nn.Module):
    """LN → windowed MSA (with optional temporal roll) → residual → FFN.
    ≡ `HWGATE.py:138-221`."""

    dim: int
    num_heads: int
    window_size: int
    temporal_patch: int
    shift_size: int
    adj: tuple
    drop: float = 0.0
    attn_drop: float = 0.0
    ff_ratio: float = 2.0
    prune: bool = True
    attn_impl: str = "auto"
    attn_dtype: str = "float32"
    compute_dtype: str = "float32"
    stream_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stream_dtype 'bfloat16': the residual stream between blocks runs in
        # bf16 (LN statistics still reduce in f32 via dtype promotion; only
        # the LN OUTPUT is stored bf16) — halves the bytes of every
        # LN/convert/relayout/GEMM-input pass over the (B,F,K,D) stream. The
        # step profile (tools/kernel_batch35) showed those f32 passes, not
        # compute, dominating the time above the roofline.
        sdt = jnp.dtype(self.stream_dtype)
        b, f_total, k, d = x.shape
        shortcut = x
        if self.shift_size > 0:
            x = jnp.roll(x, -self.shift_size, axis=1)
        xw = window_partition(x, self.window_size, self.temporal_patch)
        xw = layer_norm("norm1")(xw).astype(sdt)
        tail_mask = None
        if self.shift_size > 0:
            tail_mask = tuple(
                map(tuple, shift_tail_mask(self.window_size, self.temporal_patch, self.shift_size).tolist())
            )
        xw = WindowedMSA(
            dim=self.dim,
            num_heads=self.num_heads,
            adj=self.adj,
            windows_per_frame=k // self.window_size,
            temporal_groups=f_total // self.temporal_patch,
            prune=self.prune,
            tail_shift_mask=tail_mask,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            attn_impl=self.attn_impl,
            attn_dtype=self.attn_dtype,
            compute_dtype=self.compute_dtype,
            name="attn",
        )(xw, train=train)
        x = window_reverse(xw, self.window_size, self.temporal_patch, f_total, k)
        if self.shift_size > 0:
            x = jnp.roll(x, self.shift_size, axis=1)
        x = shortcut + x.astype(sdt)
        x = x + FeedForward(
            hidden=int(self.dim * self.ff_ratio), out=self.dim, drop_rate=self.drop,
            compute_dtype=self.compute_dtype, name="ff",
        )(layer_norm("norm2")(x).astype(sdt), train=train).astype(sdt)
        return x


class FMWindowedMSA(nn.Module):
    """``WindowedMSA`` on the FEATURE-MAJOR stream (d, b, f, nW·TP·W).

    The qkv ``FeatureDense`` outputs view as the wide kernel's
    (H, DH, T_h, 128) input with ZERO relayout (lanes are already supertile
    token order), and ``FeatureDenseFromWide`` contracts (h, dh) back in
    place — no head-split crossing exists anywhere in the block. Param tree
    ≡ ``WindowedMSA`` (q/k/v/proj with nn.Dense kernels), so both layouts
    share one checkpoint."""

    dim: int
    num_heads: int
    adj: tuple
    windows_per_frame: int = 4
    temporal_groups: int = 1
    prune: bool = False
    tail_shift_mask: tuple | None = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    attn_dtype: str = "float32"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, xf, train: bool = False):
        from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention

        _, b, f, length = xf.shape
        h = self.num_heads
        dh = self.dim // h
        n = length // self.windows_per_frame
        stack, pad = _supertile_stack(n)
        cdt = jnp.dtype(self.compute_dtype)
        attn_bf16 = self.attn_dtype == "bfloat16" or cdt == jnp.bfloat16

        q, k, v = (
            FeatureDense(self.dim, dtype=cdt, name=nm)(xf)
            .reshape(h, dh, (b * f * length) // (stack * n), stack * n)
            for nm in ("q", "k", "v")
        )
        adt = jnp.bfloat16 if attn_bf16 else jnp.float32
        if q.dtype != adt:
            q, k, v = (t.astype(adt) for t in (q, k, v))

        prune_u = None
        if self.prune and train:
            import jax

            prune_u = jax.random.uniform(self.make_rng("prune"), ())

        adj = np.asarray(self.adj, dtype=np.float32)
        tail_kw = {}
        if self.tail_shift_mask is not None:
            tail_adj = adj * np.asarray(self.tail_shift_mask, dtype=np.float32)
            tail_kw = dict(tail_adj=tail_adj,
                           units_per_group=self.windows_per_frame, groups=f)
        od = jnp.bfloat16 if attn_bf16 else None
        # Under make_sharded_steps, run the wide kernel per-shard (tp on
        # heads, dp/sp on supertiles — `kernel_sharding.call_wide`); None ⇒
        # no context / split inapplicable → single fused call.
        from sl_hwgat_tpu.parallel import kernel_sharding

        out = kernel_sharding.call_wide(
            q, k, v, adj, scale=dh**-0.5, stack=stack, prune_u=prune_u,
            out_dtype=od, **tail_kw)
        if out is None:
            kw = dict(scale=dh**-0.5, stack=stack, pad_tokens=pad,
                      prune_u=prune_u, transposed="wide", **tail_kw)
            if od is not None:
                kw["out_dtype"] = od
            out = pallas_window_attention(q, k, v, adj, **kw)  # (h, dh, T_h, 128)
        out = FeatureDenseFromWide(self.dim, dtype=cdt, name="proj")(
            out.astype(cdt))
        out = out.reshape(self.dim, b, f, length)
        return FastDropout(self.proj_drop, deterministic=not train)(out)


class FMPartAttentionBlock(nn.Module):
    """``PartAttentionBlock`` on the feature-major stream: LN/FFN/residual
    operate on (d, b, f, 128); the temporal roll is a lane regrouping
    (`ops/window.py::feature_major_roll`). Param tree ≡ the token block."""

    dim: int
    num_heads: int
    window_size: int
    temporal_patch: int
    shift_size: int
    adj: tuple
    drop: float = 0.0
    attn_drop: float = 0.0
    ff_ratio: float = 2.0
    prune: bool = True
    attn_impl: str = "auto"
    attn_dtype: str = "float32"
    compute_dtype: str = "float32"
    stream_dtype: str = "float32"

    @nn.compact
    def __call__(self, xf, train: bool = False):
        sdt = jnp.dtype(self.stream_dtype)
        _, b, f, length = xf.shape
        shortcut = xf
        if self.shift_size > 0:
            xf = feature_major_roll(xf, -self.shift_size, self.window_size,
                                    self.temporal_patch)
        xn = FastLayerNorm(name="norm1", axis=0)(xf).astype(sdt)
        tail_mask = None
        if self.shift_size > 0:
            tail_mask = tuple(map(tuple, shift_tail_mask(
                self.window_size, self.temporal_patch, self.shift_size).tolist()))
        a = FMWindowedMSA(
            dim=self.dim,
            num_heads=self.num_heads,
            adj=self.adj,
            windows_per_frame=length // (self.temporal_patch * self.window_size),
            temporal_groups=f,
            prune=self.prune,
            tail_shift_mask=tail_mask,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            attn_dtype=self.attn_dtype,
            compute_dtype=self.compute_dtype,
            name="attn",
        )(xn, train=train)
        if self.shift_size > 0:
            a = feature_major_roll(a, self.shift_size, self.window_size,
                                   self.temporal_patch)
        x = shortcut + a.astype(sdt)
        x = x + FeatureFeedForward(
            hidden=int(self.dim * self.ff_ratio), out=self.dim,
            drop_rate=self.drop, compute_dtype=self.compute_dtype, name="ff",
        )(FastLayerNorm(name="norm2", axis=0)(x).astype(sdt),
          train=train).astype(sdt)
        return x


class HWGATE(nn.Module):
    """Flagship hierarchical windowed graph-attention classifier.

    Input (B, F, K=64, C) → logits (B, num_classes).
    """

    kp_dim: int = 2
    num_kps: int = 64
    temporal_dim: int = 192
    num_classes: int = 2002
    embed_dim: int = 128
    temporal_patch: int = 2
    pe: bool = True
    depths: Sequence[int] = (2, 2, 4)
    num_heads: Sequence[int] = (2, 4, 8)
    window_size: int = 16
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.0
    ff_ratio: float = 2.0
    prune_attn: bool = True
    attn_impl: str = "auto"
    attn_dtype: str = "float32"
    # mixed precision: 'bfloat16' runs every projection/FFN matmul and the
    # attention kernel in bf16 with f32 params/LN/softmax/head (the residual
    # stream and loss stay f32) — ~2x MXU peak on TPU.
    compute_dtype: str = "float32"
    # residual-stream dtype between blocks. 'auto' follows compute_dtype:
    # the bf16 fast path keeps the stream bf16 too (LN stats still reduce in
    # f32) — halves the HBM bytes of every pass over the stream; measured
    # train 127.9→113.5ms and eval 47.7→39.1ms (tools/kernel_batch37).
    # Set 'float32' to pin an f32 stream under bf16 compute.
    stream_dtype: str = "auto"
    # rematerialize each block's activations in the backward pass
    # (jax.checkpoint): trades ~1 extra forward of FLOPs for O(depth) less
    # activation HBM — lifts the per-chip batch ceiling (b64 OOMs without it)
    remat: bool = False
    # 'feature': the round-4 FEATURE-MAJOR stream regime — the stream stays
    # (D, B, f, nW·TP·W) through LN/FFN/residual for the whole model, the
    # wide Pallas kernel consumes the projections' output as a pure view,
    # and the per-block head-split layout crossings (~18 ms/step, round-4
    # profile) disappear; one real relayout at model entry. Measured (b16
    # bf16 rbg flagship): train 95.4 → 87.3 ms (183 clips/s, 0.94 of the
    # step roofline), eval 38.6 → 31.0 ms. 'token': the (B, F, K, D) stream
    # with per-block window partition. 'auto' (default): feature on TPU when
    # the window geometry packs to 128 lanes, token elsewhere (CPU pallas
    # runs interpreted — pathological). Under a sharded-attention context FM
    # runs the wide kernel per-shard (`kernel_sharding.call_wide`: tp on
    # heads, dp/sp on supertiles) and only steps aside when tp cannot split
    # every stage's head count. Checkpoints are interchangeable across all
    # three.
    stream_layout: str = "auto"

    def _stream(self) -> str:
        return (self.compute_dtype if self.stream_dtype == "auto"
                else self.stream_dtype)

    def _use_feature_major(self) -> bool:
        if self.stream_layout == "token":
            return False
        if self.stream_layout == "feature":
            # the FM block has exactly one attention path (the wide Pallas
            # kernel); an explicit 'xla'/'hybrid'/'stacked' request would be
            # silently ignored — refuse instead (ADVICE r4)
            if self.attn_impl not in ("auto", "pallas"):
                raise ValueError(
                    f"stream_layout='feature' runs the wide Pallas kernel; "
                    f"attn_impl={self.attn_impl!r} is not expressible on the "
                    f"feature-major stream — use attn_impl='auto'/'pallas' "
                    f"or stream_layout='token'")
        if self.stream_layout == "auto":
            import jax

            if (jax.default_backend() != "tpu"
                    or self.attn_impl not in ("auto", "pallas")):
                return False
        from sl_hwgat_tpu.parallel import kernel_sharding

        n = self.temporal_patch * self.window_size
        stack, pad = _supertile_stack(n)
        nw = self.num_kps // self.window_size
        if not (pad is None and stack * n == 128 and nw % stack == 0
                and self.num_kps == nw * self.window_size):
            return False
        # Under a sharded-attention context the wide kernel runs per-shard
        # (`kernel_sharding.call_wide`: tp on heads, dp/sp on supertiles) —
        # FM only steps aside when tp cannot split every stage's head count
        # (the token path's factored split per-block fallback handles that).
        tp = kernel_sharding.tp_size()
        if tp > 1 and any(h % tp for h in self.num_heads):
            return False
        return True

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_layers = len(self.depths)
        # Identical topology across the 4 windows (model_params.py:261-369):
        # one (TP·W, TP·W) mask serves every (window, head) unit.
        adj = tuple(
            map(tuple, windowed_block_adj(self.temporal_patch, self.window_size, 1)[0].tolist())
        )

        x = FourierEmbed(self.embed_dim, self.kp_dim, name="fourier")(x)
        if self.pe:
            x = PositionalEncoding(
                self.embed_dim, self.temporal_dim, self.drop_rate, name="pos_encoder"
            )(x, train=train)
        x = x.astype(jnp.dtype(self._stream()))

        # static_argnums indexes flax's lifted call args (0=scope, 1=x,
        # 2=train); train must be static for the python control flow inside
        fm = self._use_feature_major()
        base_cls = FMPartAttentionBlock if fm else PartAttentionBlock
        block_cls = (nn.remat(base_cls, static_argnums=(2,))
                     if self.remat else base_cls)
        if fm:
            x = feature_major_entry(x, self.window_size, self.temporal_patch)
        for i in range(num_layers):
            dim = int(self.embed_dim * 2**i)
            for j in range(self.depths[i]):
                x = block_cls(
                    dim=dim,
                    num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    temporal_patch=self.temporal_patch,
                    shift_size=0 if j % 2 == 0 else self.temporal_patch // 2,
                    adj=adj,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    ff_ratio=self.ff_ratio,
                    prune=self.prune_attn,
                    attn_impl=self.attn_impl,
                    attn_dtype=self.attn_dtype,
                    compute_dtype=self.compute_dtype,
                    stream_dtype=self._stream(),
                    name=f"layers_{i}_blocks_{j}",
                )(x, train)
            if i < num_layers - 1:
                x = (feature_major_temporal_merge(x, self.window_size,
                                                  self.temporal_patch)
                     if fm else temporal_merge(x, self.temporal_patch))

        if fm:
            x = FastLayerNorm(name="norm", axis=0)(x)
            x = jnp.mean(x, axis=(2, 3)).T  # (d, b) → (b, d)
        else:
            x = layer_norm("norm")(x)
            x = jnp.mean(x, axis=(1, 2))  # AvgPool1d over f·K tokens, `HWGATE.py:328,354`
        return nn.Dense(self.num_classes, kernel_init=DENSE_INIT, name="head")(x)


def hwgate_from_dataset(dataset_params: dict, input_dim: int, **overrides) -> HWGATE:
    """≡ ``HWGATEParams`` defaults (`model_params.py:243-259`)."""
    kw = dict(
        kp_dim=input_dim,
        num_kps=64,
        temporal_dim=dataset_params["src_len"],
        num_classes=dataset_params["num_class"],
        embed_dim=128,
        temporal_patch=2,
        pe=True,
        depths=(2, 2, 4),
        num_heads=(2, 4, 8),
        window_size=16,
        drop_rate=0.1,
        attn_drop_rate=0.0,
        ff_ratio=2.0,
    )
    kw.update(overrides)
    return HWGATE(**kw)
