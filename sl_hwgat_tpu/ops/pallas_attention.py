"""Fused adjacency-masked window attention as a Pallas TPU kernel.

One kernel fuses SDDMM (QKᵀ on the supertile), reference-exact masking
(multiplicative adjacency + zero-score quirk + optional train-time pruning),
edge softmax, and SpMM (·V) — the (SN×SN) score matrix lives only in VMEM,
never in HBM. The backward pass is a second Pallas kernel that recomputes the
attention matrix flash-style and emits dQ/dK/dV in the same pass.

Layout contract (set up by ``pallas_window_attention``): units of N tokens are
padded to Np and stacked ``stack`` per supertile of SN = stack·Np = 128 rows;
per-unit isolation follows the exact-zero-underflow argument documented in
``ops/attention.py::stacked_window_attention`` (cross-unit/padded entries sit
at 2·NEG < NEG so even fully-masked rows renormalize within their own unit).

Numerics are bit-compatible with the jnp ``stacked_window_attention`` path;
tests compare both forward and gradients. On non-TPU backends the kernels run
in interpreter mode automatically.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sl_hwgat_tpu.ops.attention import NEG, UNIT_NEG


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _masked_attn_matrix(s, allowed, fill, prune_u, zero_quirk):
    """Scores → attention probabilities with reference-exact masking.

    ``allowed``: {0,1} plane of in-unit adjacency edges. ``fill``: constant
    plane of replacement scores — NEG for every in-unit entry (covers both
    masked edges and the zero-score quirk) and 2·NEG for cross-unit/padded
    entries. One compare + one and + one select replaces the two chained
    ``where``s (VPU passes are a significant cost at 32-token windows).
    """
    if prune_u is not None:
        unit = fill == jnp.float32(NEG)  # all in-unit entries carry fill == NEG
        s_iso = jnp.where(unit, s, jnp.float32(UNIT_NEG))
        prob = jnp.exp(s_iso - jnp.max(s_iso, axis=-1, keepdims=True))
        prob = prob / jnp.sum(prob, axis=-1, keepdims=True)
        s = jnp.where(prob > prune_u, 0.0, s)
    keep = (allowed != 0) & (s != 0) if zero_quirk else (allowed != 0)
    s = jnp.where(keep, s, fill)
    if _nomax():
        # softmax without the max shift: exp(NEG)=0 exactly, and real scores
        # are far from the f32 exp overflow bound (~88) at trained scales —
        # saves a reduce + subtract VPU pass per tile. Shift-invariance makes
        # this allclose (not bit-equal) to the shifted form.
        a = jnp.exp(s)
        return a / jnp.sum(a, axis=-1, keepdims=True), s
    a = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    return a / jnp.sum(a, axis=-1, keepdims=True), s


def _masked_attn_matrix_ts(st, allowed_t, fill_t, prune_u, zero_quirk):
    """Transposed-SCORE twin of ``_masked_attn_matrix``: the score matrix is
    stored (keys, queries) so every softmax reduction runs over SUBLANES
    (axis 0). Mask planes arrive pre-transposed (built in ``_attention_fwd``).
    Semantics are otherwise identical — the reference softmax is over keys,
    which are the rows here."""
    if prune_u is not None:
        unit = fill_t == jnp.float32(NEG)
        s_iso = jnp.where(unit, st, jnp.float32(UNIT_NEG))
        prob = jnp.exp(s_iso - jnp.max(s_iso, axis=0, keepdims=True))
        prob = prob / jnp.sum(prob, axis=0, keepdims=True)
        st = jnp.where(prob > prune_u, 0.0, st)
    keep = (allowed_t != 0) & (st != 0) if zero_quirk else (allowed_t != 0)
    st = jnp.where(keep, st, fill_t)
    if _nomax():
        a = jnp.exp(st)
        return a / jnp.sum(a, axis=0, keepdims=True), st
    a = jnp.exp(st - jnp.max(st, axis=0, keepdims=True))
    return a / jnp.sum(a, axis=0, keepdims=True), st


def _compact_diag(x, stack, np_):
    """(SN, SN) → (stack, np_, np_) diagonal (within-unit) blocks via static
    slices — cheap VPU moves, no gathers."""
    xg = x.reshape(stack, np_, stack * np_)
    return jnp.stack([xg[g, :, g * np_:(g + 1) * np_] for g in range(stack)])


def _expand_diag(p, stack, np_):
    """(stack, np_, np_) → (SN, SN) block-diagonal with exact zeros off-diag."""
    rows = []
    for g in range(stack):
        parts = []
        if g:
            parts.append(jnp.zeros((np_, g * np_), p.dtype))
        parts.append(p[g])
        if g < stack - 1:
            parts.append(jnp.zeros((np_, (stack - 1 - g) * np_), p.dtype))
        rows.append(jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0])
    return jnp.concatenate(rows, axis=0)


def _masked_attn_matrix_compact(s, allowed_c, prune_u, zero_quirk, stack, np_):
    """Bit-identical to ``_masked_attn_matrix`` ∘ ``_expand_diag``: the
    cross-unit entries of the full (SN, SN) softmax are exp(2·NEG − max) = 0
    exactly in f32, so masking/softmax runs on the compacted (stack, np_, np_)
    diagonal blocks — the VPU does ~¼ the elementwise work per supertile.

    ``allowed_c``: compacted {0,1} adjacency blocks (hoisted per grid step).
    Returns the EXPANDED (SN, SN) probability plane (exact zeros off-diag) so
    the SpMM stays one MXU-shaped dot.
    """
    sc_raw = _compact_diag(s, stack, np_)
    sc = sc_raw
    if prune_u is not None:
        prob = jnp.exp(sc - jnp.max(sc, axis=-1, keepdims=True))
        prob = prob / jnp.sum(prob, axis=-1, keepdims=True)
        sc = jnp.where(prob > prune_u, 0.0, sc)
    keep = (allowed_c != 0) & (sc != 0) if zero_quirk else (allowed_c != 0)
    sc = jnp.where(keep, sc, jnp.float32(NEG))
    a_c = jnp.exp(sc - jnp.max(sc, axis=-1, keepdims=True))
    a_c = a_c / jnp.sum(a_c, axis=-1, keepdims=True)
    # (expanded probs, compact probs, compact passthrough mask): the
    # passthrough marks entries whose raw score survived masking/pruning —
    # gradient flows only there (≡ the full path's s_masked == s).
    return _expand_diag(a_c, stack, np_), a_c, (sc == sc_raw)


def _compact_enabled():
    import os

    return os.environ.get("PALLAS_ATTN_COMPACT", "0") == "1"


def _nomax():
    import os

    return os.environ.get("PALLAS_ATTN_NOMAX", "0") == "1"


def _tile_loop(body, tiles_per_step):
    """Iterate the per-supertile body.

    Default: python unroll (known-good Mosaic path on the v5e remote-compile
    relay). ``PALLAS_ATTN_FORI=1`` switches to ``lax.fori_loop`` with dynamic
    ref indexing — constant compile time in tiles_per_step. Validated
    on-hardware (round 4): compiles via Mosaic, bit-identical output to the
    unrolled path at the production config, but 2.3× slower (2122µs vs 864µs
    fwd, pallas_obf16) — keep unrolled for production; this is the escape
    hatch for configs whose unroll blows the compile budget.
    """
    import os

    if os.environ.get("PALLAS_ATTN_FORI") == "1":
        jax.lax.fori_loop(0, tiles_per_step, body, 0)
    else:
        for g in range(tiles_per_step):
            body(g, 0)


def _sddmm(q, k, scale):
    """scale·q @ kᵀ without materializing the transpose (MXU contraction on
    the shared head-dim axis)."""
    return jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _tile_masks_for(g, sel_ref, allowed_ref, fill_ref, dual, tiles_per_step=1):
    """Per-tile (allowed, fill) planes.

    Single-mask mode: the refs hold one (SN, SN) plane each. Dual mode (the
    tail-shift unification): refs hold a stacked pair (2, SN, SN) and
    ``sel_ref[g]`` (SMEM, one int per supertile) picks the plane — plane 1 is
    the shift-masked adjacency used by the last temporal group of each window
    set (reference `HWGATE.py:196-211`); a VPU select, measured cheap."""
    if not dual:
        return allowed_ref[:], fill_ref[:]
    # ``sel_ref`` holds the WHOLE (T,) selector in SMEM (rank-1 SMEM blocks
    # must be whole-array for Mosaic); index by global supertile id.
    sel = sel_ref[pl.program_id(0) * tiles_per_step + g] == 1
    allowed = jnp.where(sel, allowed_ref[1], allowed_ref[0])
    fill = jnp.where(sel, fill_ref[1], fill_ref[0])
    return allowed, fill


def _batched(fn_env="PALLAS_ATTN_BATCHED"):
    """Batched-matmul kernel variant switch.

    The unrolled per-tile dot_generals leave the MXU idle between 128×128×64
    ops: measured 2264µs matmul-only at the stage-0 working set, while XLA's
    batched einsum on the SAME shapes runs 746µs (calib_shape_f32,
    tools/kernel_batch3_results.jsonl). The batched variant issues one
    batched dot_general over all tiles of the block so Mosaic can pipeline
    MXU issue; VPU masking/softmax broadcasts over the tile axis."""
    import os

    return os.environ.get(fn_env, "0") == "1"


def _block_masks(sel_ref, allowed_ref, fill_ref, dual, tiles_per_step):
    """(allowed, fill) for a whole block — (SN, SN) single-mask (broadcasts
    over tiles) or (TG, SN, SN) selected per tile in dual mode."""
    if not dual:
        return allowed_ref[:], fill_ref[:]
    base = pl.program_id(0) * tiles_per_step
    selv = jnp.stack([sel_ref[base + g] for g in range(tiles_per_step)])
    sel3 = (selv == 1)[:, None, None]
    allowed = jnp.where(sel3, allowed_ref[1][None], allowed_ref[0][None])
    fill = jnp.where(sel3, fill_ref[1][None], fill_ref[0][None])
    return allowed, fill


def _bdot(a, b, contract_a, contract_b):
    """Batched (leading-axis) dot_general with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel_batched(u_ref, sel_ref, q_ref, k_ref, v_ref, allowed_ref,
                        fill_ref, o_ref, *, scale, zero_quirk, prune,
                        tiles_per_step, dual):
    pu = u_ref[0] if prune else None
    allowed, fill = _block_masks(sel_ref, allowed_ref, fill_ref, dual,
                                 tiles_per_step)
    q = q_ref[:]
    v = v_ref[:]
    s = _bdot(q * jnp.asarray(scale, q.dtype), k_ref[:], 2, 2)  # (TG,SN,SN)
    a, _ = _masked_attn_matrix(s, allowed, fill, pu, zero_quirk)
    o_ref[:] = _bdot(a.astype(v.dtype), v, 2, 1).astype(o_ref.dtype)


def _fwd_kernel(u_ref, sel_ref, q_ref, k_ref, v_ref, allowed_ref, fill_ref, o_ref,
                *, scale, zero_quirk, prune, tiles_per_step, dual, stack=None):
    pu = u_ref[0] if prune else None
    compact = _compact_enabled() and stack is not None
    if compact:
        np_ = allowed_ref.shape[-1] // stack
        ac = [_compact_diag(allowed_ref[i] if dual else allowed_ref[:],
                            stack, np_)
              for i in range(2 if dual else 1)]  # hoisted once per grid step

    def body(g, _):
        v = v_ref[g]
        s = _sddmm(q_ref[g], k_ref[g], scale)
        if compact:
            if dual:
                sel = sel_ref[pl.program_id(0) * tiles_per_step + g] == 1
                allowed_c = jnp.where(sel, ac[1], ac[0])
            else:
                allowed_c = ac[0]
            a, _, _ = _masked_attn_matrix_compact(
                s, allowed_c, pu, zero_quirk, stack, np_)
        else:
            allowed, fill = _tile_masks_for(g, sel_ref, allowed_ref, fill_ref,
                                            dual, tiles_per_step)
            a, _ = _masked_attn_matrix(s, allowed, fill, pu, zero_quirk)
        o_ref[g] = jnp.dot(a.astype(v.dtype), v,
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return 0

    _tile_loop(body, tiles_per_step)


def _bwd_kernel_batched(u_ref, sel_ref, q_ref, k_ref, v_ref, do_ref,
                        allowed_ref, fill_ref, dq_ref, dk_ref, dv_ref, *,
                        scale, zero_quirk, prune, tiles_per_step, dual):
    pu = u_ref[0] if prune else None
    allowed, fill = _block_masks(sel_ref, allowed_ref, fill_ref, dual,
                                 tiles_per_step)
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    dt = q.dtype
    do = do_ref[:].astype(dt)
    s = _bdot(q * jnp.asarray(scale, dt), k, 2, 2)
    a, s_masked = _masked_attn_matrix(s, allowed, fill, pu, zero_quirk)
    a_lp = a.astype(dt)
    dv_ref[:] = _bdot(a_lp, do, 1, 1).astype(dt)      # Aᵀ dO per tile
    da = _bdot(do, v, 2, 2)                            # dO Vᵀ
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
    ds = (ds * (s_masked == s).astype(jnp.float32)).astype(dt)
    dq_ref[:] = (_bdot(ds, k, 2, 1) * scale).astype(dt)
    dk_ref[:] = (_bdot(ds, q, 1, 1) * scale).astype(dt)


def _bwd_kernel(u_ref, sel_ref, q_ref, k_ref, v_ref, do_ref, allowed_ref, fill_ref,
                dq_ref, dk_ref, dv_ref, *, scale, zero_quirk, prune, tiles_per_step,
                dual, stack=None):
    pu = u_ref[0] if prune else None

    compact = _compact_enabled() and stack is not None
    if compact:
        np_ = allowed_ref.shape[-1] // stack
        ac = [_compact_diag(allowed_ref[i] if dual else allowed_ref[:],
                            stack, np_)
              for i in range(2 if dual else 1)]

    def body(g, _):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        dt = q.dtype
        do = do_ref[g].astype(dt)
        s = _sddmm(q, k, scale)
        da = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if compact:
            if dual:
                sel = sel_ref[pl.program_id(0) * tiles_per_step + g] == 1
                allowed_c = jnp.where(sel, ac[1], ac[0])
            else:
                allowed_c = ac[0]
            a, a_c, passthrough_c = _masked_attn_matrix_compact(
                s, allowed_c, pu, zero_quirk, stack, np_)
            da_c = _compact_diag(da, stack, np_)
            # off-diagonal a is exactly 0 → the softmax-grad row sums and ds
            # reduce to the compact blocks (≡ the full computation)
            ds_c = a_c * (da_c - jnp.sum(da_c * a_c, axis=-1, keepdims=True))
            ds_c = ds_c * passthrough_c.astype(jnp.float32)
            ds = _expand_diag(ds_c, stack, np_).astype(dt)
        else:
            allowed, fill = _tile_masks_for(g, sel_ref, allowed_ref, fill_ref,
                                            dual, tiles_per_step)
            a, s_masked = _masked_attn_matrix(s, allowed, fill, pu, zero_quirk)
            ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
            # gradient flows only through entries that kept their raw score
            # (masked / zero / pruned entries were replaced by constants; the
            # prune mask itself is detached in the reference, HWGATE.py:95)
            passthrough = (s_masked == s).astype(jnp.float32)
            ds = (ds * passthrough).astype(dt)
        a_lp = a.astype(dt)
        # dV = Aᵀ dO ; dA = dO Vᵀ — expressed as dot_generals (no transposes)
        dv_ref[g] = jax.lax.dot_general(
            a_lp, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dt)
        dq_ref[g] = (jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale).astype(dt)
        dk_ref[g] = (
            jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        ).astype(dt)
        return 0

    _tile_loop(body, tiles_per_step)


def _fwd_kernel_t(u_ref, sel_ref, q_ref, k_ref, v_ref, allowed_ref, fill_ref,
                  o_ref, *, scale, zero_quirk, prune, tiles_per_step, dual):
    """Transposed-layout forward: blocks are (TG, DH, SN) — minor dim 128.

    Rationale (measured, tools/kernel_batch16): with the row-major (SN, DH=64)
    layout every stream is lane-padded 64→128, so even a pure copy of the
    working set costs 589µs bf16; the (DH, SN) layout fills all 128 lanes.
    All contractions keep their natural transposed forms:
      S    = QᵀᵀKᵀ        — contract dim0×dim0 → (SN, SN)
      Oᵀ   = Vᵀ Aᵀ        — contract dim1×dim1 → (DH, SN)
    """
    pu = u_ref[0] if prune else None

    def body(g, _):
        allowed, fill = _tile_masks_for(g, sel_ref, allowed_ref, fill_ref, dual,
                                        tiles_per_step)
        q = q_ref[g]  # (DH, SN)
        s = jax.lax.dot_general(
            q * jnp.asarray(scale, q.dtype), k_ref[g],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        a, _ = _masked_attn_matrix(s, allowed, fill, pu, zero_quirk)
        v = v_ref[g]
        o_ref[g] = jax.lax.dot_general(
            v, a.astype(v.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return 0

    _tile_loop(body, tiles_per_step)


def _bwd_kernel_t(u_ref, sel_ref, q_ref, k_ref, v_ref, do_ref, allowed_ref,
                  fill_ref, dq_ref, dk_ref, dv_ref, *, scale, zero_quirk,
                  prune, tiles_per_step, dual):
    """Transposed-layout backward; every gradient contraction also has a
    natural (DH, SN)-minor form:
      dVᵀ = dOᵀ A   (dim1×dim0) ; dA = dOᵀᵀVᵀ (dim0×dim0)
      dQᵀ = Kᵀ dSᵀ  (dim1×dim1) ; dKᵀ = Qᵀ dS (dim1×dim0)
    """
    pu = u_ref[0] if prune else None

    def body(g, _):
        allowed, fill = _tile_masks_for(g, sel_ref, allowed_ref, fill_ref, dual,
                                        tiles_per_step)
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        dt = q.dtype
        do = do_ref[g].astype(dt)  # (DH, SN)
        s = jax.lax.dot_general(
            q * jnp.asarray(scale, dt), k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        a, s_masked = _masked_attn_matrix(s, allowed, fill, pu, zero_quirk)
        a_lp = a.astype(dt)
        dv_ref[g] = jax.lax.dot_general(
            do, a_lp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        da = jax.lax.dot_general(
            do, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
        ds = (ds * (s_masked == s).astype(jnp.float32)).astype(dt)
        dq_ref[g] = (jax.lax.dot_general(
            k, ds, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dt)
        dk_ref[g] = (jax.lax.dot_general(
            q, ds, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dt)
        return 0

    _tile_loop(body, tiles_per_step)


def _masked_attn_matrix_tsb(st, allowed_t, fill_t, prune_u, zero_quirk):
    """Batched (TG, SN_k, SN_q) twin of ``_masked_attn_matrix_ts``: keys on
    axis 1; single-mask planes broadcast over the tile axis."""
    al = allowed_t[None]
    fl = fill_t[None]
    if prune_u is not None:
        unit = fl == jnp.float32(NEG)
        s_iso = jnp.where(unit, st, jnp.float32(UNIT_NEG))
        prob = jnp.exp(s_iso - jnp.max(s_iso, axis=1, keepdims=True))
        prob = prob / jnp.sum(prob, axis=1, keepdims=True)
        st = jnp.where(prob > prune_u, 0.0, st)
    keep = (al != 0) & (st != 0) if zero_quirk else (al != 0)
    st = jnp.where(keep, st, fl)
    if _nomax():
        a = jnp.exp(st)
        return a / jnp.sum(a, axis=1, keepdims=True), st
    a = jnp.exp(st - jnp.max(st, axis=1, keepdims=True))
    return a / jnp.sum(a, axis=1, keepdims=True), st


def _fwd_kernel_ts_batched(u_ref, sel_ref, q_ref, k_ref, v_ref, allowed_ref,
                           fill_ref, o_ref, *, scale, zero_quirk, prune,
                           tiles_per_step, dual):
    """Batched transposed-score forward: ONE batched dot_general per block
    for Sᵀ and one for Oᵀ (the exact form of the 477µs XLA shape calib).
    Rationale: in the all-unpadded layout the kernel is COMPUTE-bound
    (stream floor 415µs < MXU 477µs at the XLA rate), so Mosaic's per-tile
    MXU issue gap — invisible in the stream-bound row-major kernel where the
    batched variant measured neutral — becomes the long pole. Single-mask
    only (batched + dual is rejected by Mosaic, kernel_batch4)."""
    pu = u_ref[0] if prune else None
    q = q_ref[:]
    st = _bdot(k_ref[:], q * jnp.asarray(scale, q.dtype), 1, 1)  # (TG,SNk,SNq)
    at, _ = _masked_attn_matrix_tsb(st, allowed_ref[:], fill_ref[:], pu,
                                    zero_quirk)
    v = v_ref[:]
    o_ref[:] = _bdot(v, at.astype(v.dtype), 2, 1).astype(o_ref.dtype)


def _bwd_kernel_ts_batched(u_ref, sel_ref, q_ref, k_ref, v_ref, do_ref,
                           allowed_ref, fill_ref, dq_ref, dk_ref, dv_ref, *,
                           scale, zero_quirk, prune, tiles_per_step, dual):
    """Batched transposed-score backward (single-mask): every contraction is
    one batched dot_general over the block's tile axis."""
    pu = u_ref[0] if prune else None
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    dt = q.dtype
    do = do_ref[:].astype(dt)  # (TG, DH, SN_q)
    st = _bdot(k, q * jnp.asarray(scale, dt), 1, 1)
    at, st_masked = _masked_attn_matrix_tsb(st, allowed_ref[:], fill_ref[:],
                                            pu, zero_quirk)
    at_lp = at.astype(dt)
    dv_ref[:] = _bdot(do, at_lp, 2, 2).astype(dt)          # (TG, DH, SN_k)
    dat = _bdot(v, do, 1, 1)                               # (TG, SN_k, SN_q)
    dst = at * (dat - jnp.sum(dat * at, axis=1, keepdims=True))
    dst = (dst * (st_masked == st).astype(jnp.float32)).astype(dt)
    dq_ref[:] = (_bdot(k, dst, 2, 1) * scale).astype(dt)   # (TG, DH, SN_q)
    dk_ref[:] = (_bdot(q, dst, 2, 2) * scale).astype(dt)   # (TG, DH, SN_k)


def _fwd_kernel_wide(u_ref, sel_ref, q_ref, k_ref, v_ref, allowed_ref,
                     fill_ref, o_ref, *, scale, zero_quirk, prune,
                     tiles_per_step, dual, sn):
    """Model-layout ("wide") transposed-score forward (round-4 queue #1).

    Blocks are (1, DH, TG·SN) lane-major slabs of the (H, DH, G·N) array —
    a PURE VIEW of the TransposedDense output (h·dh, g, n): the (g, n) axes
    are contiguous, so the model feeds the kernel with ZERO relayout (the
    row-major path pays ~1.08ms/block of 2×-lane-padded attn/reshape
    fusions; the earlier tscore path paid a major permute instead). Each
    supertile is a 128-aligned static lane slice — whole (8, 128) tiles, no
    sub-lane extracts. Schedule per tile ≡ ``_fwd_kernel_ts`` (Sᵀ, sublane
    softmax, Oᵀ = Vᵀ Aᵀ). Units are h-major (h, b, f, nW); the sel vector
    indexes supertiles within ONE head row (grid axis 1)."""
    pu = u_ref[0] if prune else None
    qw = q_ref[0]
    kw = k_ref[0]
    vw = v_ref[0]
    for g in range(tiles_per_step):
        sl = slice(g * sn, (g + 1) * sn)
        if dual:
            sel = sel_ref[pl.program_id(1) * tiles_per_step + g] == 1
            allowed_t = jnp.where(sel, allowed_ref[1], allowed_ref[0])
            fill_t = jnp.where(sel, fill_ref[1], fill_ref[0])
        else:
            allowed_t, fill_t = allowed_ref[:], fill_ref[:]
        qg = qw[:, sl]
        st = jax.lax.dot_general(
            kw[:, sl], qg * jnp.asarray(scale, qg.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        at, _ = _masked_attn_matrix_ts(st, allowed_t, fill_t, pu, zero_quirk)
        vg = vw[:, sl]
        o_ref[0, :, sl] = jax.lax.dot_general(
            vg, at.astype(vg.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel_wide(u_ref, sel_ref, q_ref, k_ref, v_ref, do_ref, allowed_ref,
                     fill_ref, dq_ref, dk_ref, dv_ref, *, scale, zero_quirk,
                     prune, tiles_per_step, dual, sn):
    """Wide-layout backward: per-supertile lane slices, contractions ≡
    ``_bwd_kernel_ts`` (all gradients emitted in the same wide layout the
    projections consume)."""
    pu = u_ref[0] if prune else None
    qw = q_ref[0]
    kw = k_ref[0]
    vw = v_ref[0]
    dow = do_ref[0]
    for g in range(tiles_per_step):
        sl = slice(g * sn, (g + 1) * sn)
        if dual:
            sel = sel_ref[pl.program_id(1) * tiles_per_step + g] == 1
            allowed_t = jnp.where(sel, allowed_ref[1], allowed_ref[0])
            fill_t = jnp.where(sel, fill_ref[1], fill_ref[0])
        else:
            allowed_t, fill_t = allowed_ref[:], fill_ref[:]
        q = qw[:, sl]
        k = kw[:, sl]
        v = vw[:, sl]
        dt = q.dtype
        do = dow[:, sl].astype(dt)
        st = jax.lax.dot_general(
            k, q * jnp.asarray(scale, dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        at, st_masked = _masked_attn_matrix_ts(st, allowed_t, fill_t, pu,
                                               zero_quirk)
        at_lp = at.astype(dt)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            do, at_lp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        dat = jax.lax.dot_general(
            v, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dst = at * (dat - jnp.sum(dat * at, axis=0, keepdims=True))
        dst = (dst * (st_masked == st).astype(jnp.float32)).astype(dt)
        dq_ref[0, :, sl] = (jax.lax.dot_general(
            k, dst, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dt)
        dk_ref[0, :, sl] = (jax.lax.dot_general(
            q, dst, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dt)


def _fwd_kernel_wide_batched(u_ref, sel_ref, q_ref, k_ref, v_ref, allowed_ref,
                             fill_ref, o_ref, *, scale, zero_quirk, prune,
                             tiles_per_step, dual, sn):
    """Batched wide forward (single-mask): gather the block's 128-aligned
    lane slices into (TG, DH, SN) in VMEM, then ONE batched dot_general for
    Sᵀ and one for Oᵀ — the tmq_bfused schedule. Measured (batch-41):
    589.7µs vs the 567µs wide stream floor and 889µs unrolled — the in-VMEM
    gather costs ~nothing while batching closes Mosaic's per-tile MXU issue
    gap. Mirrors ``_fwd_kernel_ts_batched`` semantics exactly."""
    del dual  # batched + dual rejected by Mosaic (kernel_batch4)
    pu = u_ref[0] if prune else None

    def tiles(w):
        return jnp.stack(
            [w[:, g * sn:(g + 1) * sn] for g in range(tiles_per_step)])

    q3 = tiles(q_ref[0])
    k3 = tiles(k_ref[0])
    v3 = tiles(v_ref[0])
    st = _bdot(k3, q3 * jnp.asarray(scale, q3.dtype), 1, 1)  # (TG,SNk,SNq)
    at, _ = _masked_attn_matrix_tsb(st, allowed_ref[:], fill_ref[:], pu,
                                    zero_quirk)
    o3 = _bdot(v3, at.astype(v3.dtype), 2, 1)                # (TG,DH,SNq)
    o_ref[0] = jnp.concatenate(
        [o3[g] for g in range(tiles_per_step)], axis=1).astype(o_ref.dtype)


def _bwd_kernel_wide_batched(u_ref, sel_ref, q_ref, k_ref, v_ref, do_ref,
                             allowed_ref, fill_ref, dq_ref, dk_ref, dv_ref, *,
                             scale, zero_quirk, prune, tiles_per_step, dual,
                             sn):
    """Batched wide backward (single-mask): ≡ ``_bwd_kernel_ts_batched``
    contractions on gathered (TG, DH, SN) tiles, gradients scattered back to
    the wide slab."""
    del dual
    pu = u_ref[0] if prune else None

    def tiles(w):
        return jnp.stack(
            [w[:, g * sn:(g + 1) * sn] for g in range(tiles_per_step)])

    def widen(x3, dst):
        dst[0] = jnp.concatenate(
            [x3[g] for g in range(tiles_per_step)], axis=1)

    q3 = tiles(q_ref[0])
    k3 = tiles(k_ref[0])
    v3 = tiles(v_ref[0])
    dt = q3.dtype
    do3 = tiles(do_ref[0]).astype(dt)
    st = _bdot(k3, q3 * jnp.asarray(scale, dt), 1, 1)
    at, st_masked = _masked_attn_matrix_tsb(st, allowed_ref[:], fill_ref[:],
                                            pu, zero_quirk)
    at_lp = at.astype(dt)
    widen(_bdot(do3, at_lp, 2, 2).astype(dt), dv_ref)       # (TG, DH, SN_k)
    dat = _bdot(v3, do3, 1, 1)                              # (TG, SN_k, SN_q)
    dst = at * (dat - jnp.sum(dat * at, axis=1, keepdims=True))
    dst = (dst * (st_masked == st).astype(jnp.float32)).astype(dt)
    widen((_bdot(k3, dst, 2, 1) * scale).astype(dt), dq_ref)
    widen((_bdot(q3, dst, 2, 2) * scale).astype(dt), dk_ref)


def _call_wide(kernel, n_out, h, t_h, sn, dh, tiles_per_step, args, interpret,
               out_dtype=jnp.float32, dual=False):
    """2-D grid pallas_call for the wide layout: grid (H, T_h/TG), blocks
    (1, DH, TG·SN) slabs of the (H, DH, T_h·SN) arrays."""
    grid = (h, t_h // tiles_per_step)
    nbuf = _n_buffers()
    pmode = None if nbuf is None else pl.Buffered(buffer_count=nbuf)
    tile_spec = pl.BlockSpec((1, dh, tiles_per_step * sn),
                             lambda ih, it: (ih, 0, it),
                             memory_space=pltpu.VMEM, pipeline_mode=pmode)
    if dual:
        mask_spec = pl.BlockSpec((2, sn, sn), lambda ih, it: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((sn, sn), lambda ih, it: (0, 0),
                                 memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1,), lambda ih, it: (0,),
                               memory_space=pltpu.SMEM)
    sel_spec = pl.BlockSpec((t_h,), lambda ih, it: (0,),
                            memory_space=pltpu.SMEM)
    n_tensor_in = len(args) - 4
    in_specs = [scalar_spec, sel_spec] + [tile_spec] * n_tensor_in + [
        mask_spec, mask_spec]
    out_specs = tuple([tile_spec] * n_out) if n_out > 1 else tile_spec
    shape = jax.ShapeDtypeStruct((h, dh, t_h * sn), out_dtype)
    out_shape = tuple([shape] * n_out) if n_out > 1 else shape
    params = {}
    import os

    if os.environ.get("PALLAS_ATTN_PARSEM", "1") == "1":
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(*args)


def _fwd_kernel_ts(u_ref, sel_ref, q_ref, k_ref, v_ref, allowed_ref, fill_ref,
                   o_ref, *, scale, zero_quirk, prune, tiles_per_step, dual):
    """Transposed-score forward (the batch-27/28 'tmx/tmq' schedule): streams
    are (TG, DH, SN) like ``_fwd_kernel_t``, but the score matrix is computed
    TRANSPOSED — Sᵀ[k,q] = Σ_d Kᵀ[d,k]·Qᵀ[d,q] (keys on sublanes) — so the
    softmax reduces over sublanes and the aggregation is the fully-native
    Oᵀ = Vᵀ Aᵀ (dim1×dim0). Measured (tools/kernel_batch27/28): unlike the
    lane-softmax transposed schedule (1289µs), this one keeps VPU/MXU overlap
    while its streams stay physically unpadded."""
    pu = u_ref[0] if prune else None

    def body(g, _):
        allowed_t, fill_t = _tile_masks_for(g, sel_ref, allowed_ref, fill_ref,
                                            dual, tiles_per_step)
        q = q_ref[g]  # (DH, SN)
        st = jax.lax.dot_general(
            k_ref[g], q * jnp.asarray(scale, q.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        at, _ = _masked_attn_matrix_ts(st, allowed_t, fill_t, pu, zero_quirk)
        v = v_ref[g]
        o_ref[g] = jax.lax.dot_general(
            v, at.astype(v.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return 0

    _tile_loop(body, tiles_per_step)


def _bwd_kernel_ts(u_ref, sel_ref, q_ref, k_ref, v_ref, do_ref, allowed_ref,
                   fill_ref, dq_ref, dk_ref, dv_ref, *, scale, zero_quirk,
                   prune, tiles_per_step, dual):
    """Transposed-score backward; every gradient contraction keeps a natural
    (DH, SN)-minor form with the transposed probability plane Aᵀ:
      dVᵀ = dOᵀ Aᵀᵀ  (dim1×dim1) ; dAᵀ = Vᵀᵀ dOᵀ (dim0×dim0)
      dQᵀ = Kᵀ dSᵀ   (dim1×dim0) ; dKᵀ = Qᵀ dSᵀᵀ (dim1×dim1)
    and the softmax-grad row sums reduce over sublanes (keys)."""
    pu = u_ref[0] if prune else None

    def body(g, _):
        allowed_t, fill_t = _tile_masks_for(g, sel_ref, allowed_ref, fill_ref,
                                            dual, tiles_per_step)
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        dt = q.dtype
        do = do_ref[g].astype(dt)  # (DH, SN_q)
        st = jax.lax.dot_general(
            k, q * jnp.asarray(scale, dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        at, st_masked = _masked_attn_matrix_ts(st, allowed_t, fill_t, pu,
                                               zero_quirk)
        at_lp = at.astype(dt)
        dv_ref[g] = jax.lax.dot_general(
            do, at_lp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)  # (DH, SN_k)
        dat = jax.lax.dot_general(
            v, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (SN_k, SN_q)
        dst = at * (dat - jnp.sum(dat * at, axis=0, keepdims=True))
        dst = (dst * (st_masked == st).astype(jnp.float32)).astype(dt)
        dq_ref[g] = (jax.lax.dot_general(
            k, dst, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dt)
        dk_ref[g] = (jax.lax.dot_general(
            q, dst, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dt)
        return 0

    _tile_loop(body, tiles_per_step)


def _pack_t(x, n, pad_tokens, stack):
    """(U, dh, N) → (T, dh, SN): pad tokens, then lay a supertile's ``stack``
    units side-by-side along lanes (token j of in-tile unit s at lane
    s·Np + j — the SAME (row, col) semantics as the row-major supertile, so
    all mask planes and the sel logic are shared)."""
    u, dh, _ = x.shape
    np_ = n if pad_tokens is None else pad_tokens
    if np_ != n:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, np_ - n)])
    t = u // stack
    return x.reshape(t, stack, dh, np_).transpose(0, 2, 1, 3).reshape(
        t, dh, stack * np_), t, stack * np_, np_


def _unpack_t(x, u, n, np_, stack, dh):
    t = u // stack
    return x.reshape(t, dh, stack, np_).transpose(0, 2, 1, 3).reshape(
        u, dh, np_)[:, :, :n]


def _pad_stack(q, k, v, n, pad_tokens, stack):
    np_ = n if pad_tokens is None else pad_tokens
    if np_ != n:
        padcfg = [(0, 0), (0, np_ - n), (0, 0)]
        q, k, v = jnp.pad(q, padcfg), jnp.pad(k, padcfg), jnp.pad(v, padcfg)
    u, _, dh = q.shape
    t = u // stack
    sn = stack * np_
    return (x.reshape(t, sn, dh) for x in (q, k, v)), t, sn, np_


def _pad_tiles(t_pad, t, *arrays):
    """Pad the supertile axis (axis 0) of stacked operands with zeros up to
    ``t_pad`` (see ``_pick_tiles_per_step``); padded tiles compute garbage
    rows that the caller slices off."""
    if t_pad == t:
        return arrays
    return tuple(
        jnp.pad(a, [(0, t_pad - t)] + [(0, 0)] * (a.ndim - 1)) for a in arrays)


def _tile_masks(adj, n, np_, stack):
    """(allowed, fill) planes for one supertile (see ``_masked_attn_matrix``)."""
    adj_p = np.zeros((np_, np_), dtype=np.float32)
    adj_p[:n, :n] = np.asarray(adj, dtype=np.float32)
    valid = np.zeros((np_,), np.float32)
    valid[:n] = 1.0
    tok = np.tile(valid, stack)
    outer = tok[None, :] * tok[:, None]
    allowed = np.kron(np.eye(stack, dtype=np.float32), adj_p) * outer
    unit_blk = np.kron(np.eye(stack, dtype=np.float32), np.ones((np_, np_), np.float32)) * outer
    fill = np.where(unit_blk != 0, np.float32(NEG), np.float32(2 * NEG))
    return allowed, fill


def _n_buffers():
    """Stream buffer depth for the auto pipeline (PALLAS_ATTN_BUFS, default
    the pipeliner's builtin double buffering). Measured batch-28: see
    ROADMAP."""
    import os

    v = os.environ.get("PALLAS_ATTN_BUFS")
    return int(v) if v else None


def _call(kernel, n_out, t, sn, dh, tiles_per_step, args, interpret,
          out_dtype=jnp.float32, dual=False, transposed=False):
    grid = (t // tiles_per_step,)
    blk = (tiles_per_step, dh, sn) if transposed else (tiles_per_step, sn, dh)
    nbuf = _n_buffers()
    pmode = None if nbuf is None else pl.Buffered(buffer_count=nbuf)
    tile_spec = pl.BlockSpec(blk, lambda i: (i, 0, 0), memory_space=pltpu.VMEM,
                             pipeline_mode=pmode)
    if dual:
        mask_spec = pl.BlockSpec((2, sn, sn), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((sn, sn), lambda i: (0, 0), memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
    # whole-array SMEM block: rank-1 SMEM blocks must cover the array (or be
    # 128-multiples) for Mosaic; the kernel indexes by global supertile id
    sel_spec = pl.BlockSpec((t,), lambda i: (0,), memory_space=pltpu.SMEM)
    n_tensor_in = len(args) - 4  # minus scalar u, sel, and the two masks
    in_specs = [scalar_spec, sel_spec] + [tile_spec] * n_tensor_in + [mask_spec, mask_spec]
    out_specs = tuple([tile_spec] * n_out) if n_out > 1 else tile_spec
    shape = jax.ShapeDtypeStruct((t, dh, sn) if transposed else (t, sn, dh),
                                 out_dtype)
    out_shape = tuple([shape] * n_out) if n_out > 1 else shape
    params = {}
    import os

    if os.environ.get("PALLAS_ATTN_PARSEM", "1") == "1":
        # grid steps are fully independent (each writes its own output
        # block); 'parallel' dimension semantics measured +3% on fwd AND bwd
        # (batch-23: 842/2037µs vs 864/2099). Default on; opt out with
        # PALLAS_ATTN_PARSEM=0.
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(*args)


_ADJ_CACHE: dict[Any, np.ndarray] = {}


def _masks(adj_key, tail, n, np_, stack):
    """Mask planes for single- or dual-mask mode.

    ``tail`` is None (single mask) or ``(tail_adj_key, per_group, groups)``:
    units are ordered (…, group, unit-in-group); the LAST of every ``groups``
    consecutive blocks of ``per_group`` units uses the tail (shift-masked)
    adjacency — exactly the unit layout `models/hwgate.py` produces
    (reference `HWGATE.py:196-211`)."""
    adj = _ADJ_CACHE[adj_key]
    allowed_m, fill_m = _tile_masks(adj, n, np_, stack)
    if tail is None:
        return allowed_m, fill_m, False
    tail_key, per_group, groups = tail
    if per_group % stack:
        raise ValueError(
            f"units per temporal group ({per_group}) must be a multiple of the "
            f"supertile stack ({stack}) so no supertile mixes mask planes")
    allowed2, fill2 = _tile_masks(_ADJ_CACHE[tail_key], n, np_, stack)
    return np.stack([allowed_m, allowed2]), np.stack([fill_m, fill2]), True


def _make_sel(t, stack, tail, unit_offset):
    """(t,) int32 per-supertile mask selector. ``unit_offset`` shifts the
    group phase — a traced scalar under shard_map, where each shard's unit 0
    is globally ``axis_index * per_shard_units``."""
    if tail is None:
        return jnp.zeros((t,), jnp.int32)
    _, per_group, groups = tail
    starts = np.arange(t, dtype=np.int32) * stack
    if unit_offset is None:
        group_of_tile = starts // per_group
        return jnp.asarray(
            (group_of_tile % groups == groups - 1).astype(np.int32))
    group_of_tile = (jnp.asarray(starts) + unit_offset) // per_group
    return (group_of_tile % groups == groups - 1).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _attention(q, k, v, u_val, sel, prune, adj_key, scale, stack, pad_tokens,
               zero_quirk_tail):
    out, _ = _attention_fwd(q, k, v, u_val, sel, prune, adj_key, scale, stack,
                            pad_tokens, zero_quirk_tail)
    return out


def _attention_fwd(q, k, v, u_val, sel, prune, adj_key, scale, stack,
                   pad_tokens, zero_quirk_tail):
    zero_quirk, tail, out_dtype, transposed = zero_quirk_tail
    tscore = transposed in ("tscore", "tscore_prepacked")
    if transposed == "wide":
        # (H, DH, T_h, SN): a pure view of the TransposedDense output —
        # zero-relayout entry (see _fwd_kernel_wide)
        h, dh, t_h, sn = q.shape
        np_ = sn // stack
        n = np_  # wide mode requires pad_tokens is None (caller-checked)
        allowed_m, fill_m, dual = _masks(adj_key, tail, n, np_, stack)
        allowed_m = np.swapaxes(allowed_m, -1, -2).copy()
        fill_m = np.swapaxes(fill_m, -1, -2).copy()
        batched = _batched() and not dual
        tiles_per_step, t_pad = _pick_tiles_per_step(t_h, sn, dh,
                                                     batched=batched)
        qs, ks, vs = (x.reshape(h, dh, t_h * sn) for x in (q, k, v))
        if t_pad != t_h:
            padw = [(0, 0), (0, 0), (0, (t_pad - t_h) * sn)]
            qs, ks, vs = (jnp.pad(x, padw) for x in (qs, ks, vs))
            sel_p = jnp.pad(sel, (0, t_pad - t_h))
        else:
            sel_p = sel
        kern = functools.partial(
            _fwd_kernel_wide_batched if batched else _fwd_kernel_wide,
            scale=scale, zero_quirk=zero_quirk, prune=prune,
            tiles_per_step=tiles_per_step, dual=dual, sn=sn)
        o = _call_wide(
            kern, 1, h, t_pad, sn, dh, tiles_per_step,
            (u_val, sel_p, qs, ks, vs, jnp.asarray(allowed_m),
             jnp.asarray(fill_m)),
            _interpret(), out_dtype=jnp.dtype(out_dtype), dual=dual)
        out = o[:, :, : t_h * sn].reshape(h, dh, t_h, sn)
        return out, (q, k, v, u_val, sel)
    if transposed in ("prepacked", "tscore_prepacked"):
        t, dh, sn = q.shape
        np_ = sn // stack
        n = np_ if pad_tokens is None else -1  # caller guarantees no padding
        u_units = t * stack
        qs, ks, vs = q, k, v
    elif transposed:
        u_units, dh, n = q.shape
        (qs, _, _, _), (ks, _, _, _), (vs, t, sn, np_) = (
            _pack_t(x, n, pad_tokens, stack) for x in (q, k, v))
    else:
        u_units, n, dh = q.shape
        (qs, ks, vs), t, sn, np_ = _pad_stack(q, k, v, n, pad_tokens, stack)
    allowed_m, fill_m, dual = _masks(adj_key, tail, n, np_, stack)
    if tscore:  # the kernel consumes transposed (keys, queries) mask planes
        allowed_m = np.swapaxes(allowed_m, -1, -2).copy()
        fill_m = np.swapaxes(fill_m, -1, -2).copy()
    batched = _batched() and not dual
    tiles_per_step, t_pad = _pick_tiles_per_step(t, sn, dh, batched=batched)
    qs, ks, vs, sel_p = _pad_tiles(t_pad, t, qs, ks, vs, sel)
    # Batched + dual is rejected by Mosaic (i1 vector reshape in the per-tile
    # mask select, kernel_batch4: dual_batched failed) — and the batched
    # variant measured neutral anyway; keep the validated unrolled path there.
    if tscore:
        base_kern = _fwd_kernel_ts_batched if batched else _fwd_kernel_ts
    elif transposed:
        base_kern = _fwd_kernel_t
    elif batched:
        base_kern = _fwd_kernel_batched
    else:
        base_kern = functools.partial(_fwd_kernel, stack=stack)
    kern = functools.partial(
        base_kern, scale=scale, zero_quirk=zero_quirk, prune=prune,
        tiles_per_step=tiles_per_step, dual=dual,
    )
    o = _call(
        kern, 1, t_pad, sn, dh, tiles_per_step,
        (u_val, sel_p, qs, ks, vs, jnp.asarray(allowed_m), jnp.asarray(fill_m)),
        _interpret(), out_dtype=jnp.dtype(out_dtype), dual=dual,
        transposed=bool(transposed),
    )
    o = o[:t]
    if transposed in ("prepacked", "tscore_prepacked"):
        out = o
    elif transposed:
        out = _unpack_t(o, u_units, n, np_, stack, dh)
    else:
        out = o.reshape(u_units, np_, dh)[:, :n]
    return out, (q, k, v, u_val, sel)


def _attention_bwd(prune, adj_key, scale, stack, pad_tokens, zero_quirk_tail,
                   res, g):
    zero_quirk, tail, _, transposed = zero_quirk_tail
    tscore = transposed in ("tscore", "tscore_prepacked")
    q, k, v, u_val, sel = res
    if transposed in ("prepacked", "tscore_prepacked"):
        raise NotImplementedError("prepacked is a forward-only bench mode")
    if transposed == "wide":
        h, dh, t_h, sn = q.shape
        np_ = sn // stack
        allowed_m, fill_m, dual = _masks(adj_key, tail, np_, np_, stack)
        allowed_m = np.swapaxes(allowed_m, -1, -2).copy()
        fill_m = np.swapaxes(fill_m, -1, -2).copy()
        batched = _batched() and not dual
        tiles_per_step, t_pad = _pick_tiles_per_step(t_h, sn, dh,
                                                     batched=batched)
        qs, ks, vs, gs = (x.reshape(h, dh, t_h * sn) for x in (q, k, v, g))
        if t_pad != t_h:
            padw = [(0, 0), (0, 0), (0, (t_pad - t_h) * sn)]
            qs, ks, vs, gs = (jnp.pad(x, padw) for x in (qs, ks, vs, gs))
            sel_p = jnp.pad(sel, (0, t_pad - t_h))
        else:
            sel_p = sel
        kern = functools.partial(
            _bwd_kernel_wide_batched if batched else _bwd_kernel_wide,
            scale=scale, zero_quirk=zero_quirk, prune=prune,
            tiles_per_step=tiles_per_step, dual=dual, sn=sn)
        dq, dk, dv = _call_wide(
            kern, 3, h, t_pad, sn, dh, tiles_per_step,
            (u_val, sel_p, qs, ks, vs, gs, jnp.asarray(allowed_m),
             jnp.asarray(fill_m)),
            _interpret(), out_dtype=q.dtype, dual=dual)

        def unw(x):
            return x[:, :, : t_h * sn].reshape(h, dh, t_h, sn)

        return unw(dq), unw(dk), unw(dv), None, None
    if transposed:
        u_units, dh, n = q.shape
        (qs, _, _, _), (ks, _, _, _), (vs, _, _, _), (gs, t, sn, np_) = (
            _pack_t(x, n, pad_tokens, stack) for x in (q, k, v, g))
    else:
        u_units, n, dh = q.shape
        (qs, ks, vs), t, sn, np_ = _pad_stack(q, k, v, n, pad_tokens, stack)
        if np_ != n:
            g = jnp.pad(g, [(0, 0), (0, np_ - n), (0, 0)])
        gs = g.reshape(t, sn, dh)
    allowed_m, fill_m, dual = _masks(adj_key, tail, n, np_, stack)
    if tscore:
        allowed_m = np.swapaxes(allowed_m, -1, -2).copy()
        fill_m = np.swapaxes(fill_m, -1, -2).copy()
    batched = _batched() and not dual
    tiles_per_step, t_pad = _pick_tiles_per_step(t, sn, dh, batched=batched)
    qs, ks, vs, gs, sel_p = _pad_tiles(t_pad, t, qs, ks, vs, gs, sel)
    if tscore:
        base_kern = _bwd_kernel_ts_batched if batched else _bwd_kernel_ts
    elif transposed:
        base_kern = _bwd_kernel_t
    elif batched:
        base_kern = _bwd_kernel_batched
    else:
        base_kern = functools.partial(_bwd_kernel, stack=stack)
    kern = functools.partial(
        base_kern, scale=scale, zero_quirk=zero_quirk, prune=prune,
        tiles_per_step=tiles_per_step, dual=dual,
    )
    dq, dk, dv = _call(
        kern, 3, t_pad, sn, dh, tiles_per_step,
        (u_val, sel_p, qs, ks, vs, gs, jnp.asarray(allowed_m),
         jnp.asarray(fill_m)),
        _interpret(), out_dtype=q.dtype, dual=dual, transposed=bool(transposed),
    )

    if transposed:
        def unstack(x):
            return _unpack_t(x[:t], u_units, n, np_, stack, dh)
    else:
        def unstack(x):
            return x[:t].reshape(u_units, np_, dh)[:, :n]

    return unstack(dq), unstack(dk), unstack(dv), None, None


_attention.defvjp(_attention_fwd, _attention_bwd)


def _pick_tiles_per_step(t: int, sn: int, dh: int, preferred: int = 16,
                         batched: bool = False) -> tuple[int, int]:
    """Supertiles per grid step: enough to amortize grid overhead, small
    enough to keep q/k/v/(do)/outputs inside the 16MB scoped-VMEM limit.

    Returns ``(tg, t_pad)``: when no divisor of ``t`` ≥ 8 exists below the cap
    (odd/prime supertile counts), the caller pads the supertile axis to
    ``t_pad`` (a multiple of ``tg``) instead of silently degrading to tg=1 —
    the padded tiles cost ≤ (tg-1)/t extra stream/compute, vs the ~2× grid-
    overhead cliff of tiny tile groups (VERDICT r2 weak-5).

    On-hardware sweep (v5e, tools/kernel_*_results.jsonl): fwd tg16 beats tg8
    (f32 2133 vs 2186us; bf16 1191 vs 1322us); tg32 fails to compile (VMEM).
    bwd tg16 validated on hardware in batch-14 (4133us vs 4199us at tg8) —
    both default to 16. ``PALLAS_ATTN_TG`` overrides both (divisor-rounded,
    no padding)."""
    import os

    override = os.environ.get("PALLAS_ATTN_TG")
    if override:
        tg = int(override)
        while t % tg:
            tg -= 1
        return max(1, tg), t
    # VMEM sanity bound: up to 8 streamed operands (q,k,v,do,o,dq,dk,dv) ×
    # double buffering, plus per-iteration (SN,SN) score intermediates. The
    # unrolled kernels keep ~3 f32 planes live per iteration; the BATCHED
    # tscore backward materializes ~5 whole-(TG,SN,SN) planes at once
    # (st, at, at_lp, dat, dst — ADVICE r2), so its score term scales with TG.
    score_planes = 5 if batched else 3
    per_tile = 2 * 8 * sn * dh * 4 + score_planes * sn * sn * 4
    budget = 12 * 1024 * 1024
    cap = max(1, min(t, preferred, budget // max(per_tile, 1)))
    best = cap
    while t % best:
        best -= 1
    if best >= min(t, 8, cap):
        return best, t
    return cap, ((t + cap - 1) // cap) * cap


def _cache_adj(adj: np.ndarray):
    key = (adj.shape, adj.tobytes())
    _ADJ_CACHE.setdefault(key, np.asarray(adj, dtype=np.float32))
    return key


def pallas_window_attention(q, k, v, adj: np.ndarray, *, scale: float,
                            stack: int = 4, pad_tokens: int | None = None,
                            zero_quirk: bool = True, prune_u=None,
                            tail_adj: np.ndarray | None = None,
                            units_per_group: int | None = None,
                            groups: int | None = None,
                            unit_offset=None,
                            sel=None,
                            out_dtype=None,
                            transposed: bool | str = False):
    """Drop-in fused replacement for ``stacked_window_attention``.

    q, k, v: (U, N, dh) float32; ``adj``: static (N, N) {0,1} numpy mask.
    Differentiable via the fused backward kernel.

    Shifted-block mode (``tail_adj`` given): units are ordered
    (…, group, unit-in-group) with ``groups`` temporal groups of
    ``units_per_group`` units; the last group of each period attends under
    ``tail_adj`` (adjacency × Swin shift mask) instead of ``adj`` — one fused
    kernel over all units replaces the split/concat two-call formulation.
    ``unit_offset`` (traced scalar ok) shifts the group phase of unit 0; under
    shard_map pass ``axis_index * per_shard_units`` so each shard selects the
    right mask planes. ``sel`` overrides the selector entirely: a (U/stack,)
    int32 vector (traced ok), 1 where the supertile uses the tail mask —
    for shard layouts whose units are not globally contiguous (the factored
    head/group sharding in `parallel/kernel_sharding.py::call_factored`).
    """
    if transposed not in (False, True, "prepacked", "tscore",
                          "tscore_prepacked", "wide"):
        # an unknown string is truthy and would silently take the transposed
        # lane-softmax path with wrong-layout inputs (ADVICE r2)
        raise ValueError(f"unknown transposed mode: {transposed!r}")
    if transposed == "wide":
        # q/k/v: (H, DH, T_h, SN) — the (h·dh, g, n) TransposedDense output
        # viewed with groups packed `stack` per supertile; units are h-major,
        # so `units_per_group`/`sel` count GROUPS within one head row.
        if pad_tokens is not None:
            raise ValueError("wide mode requires unpadded tokens "
                             "(stack*n == SN)")
        if q.ndim != 4:
            raise ValueError("wide mode takes (H, DH, T_h, SN) inputs")
    key = _cache_adj(adj)
    tail = None
    if tail_adj is not None:
        tail = (_cache_adj(tail_adj), int(units_per_group), int(groups))
    prune = prune_u is not None
    u_val = jnp.asarray([prune_u if prune else 0.0], jnp.float32)
    if transposed == "wide":
        n_tiles = q.shape[2]  # supertiles per head row
    else:
        n_tiles = q.shape[0] * (
            stack if transposed in ("prepacked", "tscore_prepacked") else 1
        ) // stack
    if sel is None:
        sel = _make_sel(n_tiles, stack, tail, unit_offset)
    else:
        sel = jnp.asarray(sel, jnp.int32)
    # out_dtype (default f32): bf16 halves the kernel's HBM write traffic —
    # MXU accumulation stays f32, rounding happens only on the final store.
    # The model casts attention output to compute_dtype right after anyway.
    od = jnp.float32 if out_dtype is None else jnp.dtype(out_dtype)
    return _attention(q, k, v, u_val, sel, prune, key, float(scale), int(stack),
                      pad_tokens,
                      (bool(zero_quirk), tail, str(np.dtype(od)),
                       transposed if isinstance(transposed, str)
                       else bool(transposed)))
