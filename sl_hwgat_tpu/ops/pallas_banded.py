"""Fused banded (block-tridiagonal ELL) graph attention as a Pallas TPU kernel.

The banded models (GATE/WGATE — reference `hwgat/models/GATE.py:56-66`,
`WGATE.py:94-104`) attend each frame's V joints to the 3V keys of frames
f−1/f/f+1 under additive adjacency masks. The jnp formulation
(`ops/attention.py::banded_frame_attention`) materializes the (G,H,F,V,3V)
score tensor in HBM; this kernel keeps scores in VMEM.

Layout: V joints are padded to Vp (lane-friendly), FT = 128 // Vp consecutive
frames form one 128-row *sub-tile*, and TG sub-tiles form one grid block.
Each sub-tile's keys are its own rows plus one frame each side — reachable
in-kernel because the k/v/q/do arrays are streamed THREE times with block
index maps i−1 / i / i+1 (clamped), so neighbor sub-tiles are always resident.

Masking is additive and f32-exact vs ``banded_frame_attention``: static
(128,128) planes carry the band adjacency values {0, NEG} per (query,key)
sub-tile pair; out-of-band pairs add NEG = −1e4, whose softmax contribution
underflows to exactly 0 in f32 (same argument as the windowed kernel).

The backward is a second fused kernel (flash-style): each grid step
recomputes the score rows of its TG sub-tiles PLUS one query sub-tile from
each neighbor block, and accumulates dK/dV for its own block entirely in
VMEM — no atomics, no HBM score traffic. ``D = Σ(dO·O)`` is precomputed in
XLA (one cheap fused elementwise reduce).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -10000.0
ROWS = 128  # sub-tile rows (MXU-native)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_BAND_CACHE: dict[Any, np.ndarray] = {}


def _cache_band(band: np.ndarray):
    key = (band.shape, band.tobytes())
    _BAND_CACHE.setdefault(key, np.asarray(band, dtype=np.float32))
    return key


def _planes(band_key, vp: int, ft: int) -> np.ndarray:
    """(3, 128, 128) additive planes: query sub-tile vs [prev|self|next] key
    sub-tile. Row = fq·Vp + vq (fq ∈ [0,FT)), col likewise for the key tile.

    band: (3, V, V) additive masks [prev | self | next] with entries
    {0, NEG}. Padded joints (v ≥ V) carry NEG columns; padded query rows are
    sliced off after the kernel.
    """
    band = _BAND_CACHE[band_key]
    v = band.shape[1]
    bp = np.full((3, vp, vp), np.float32(NEG))
    bp[:, :v, :v] = band
    planes = np.full((3, ft * vp, ft * vp), np.float32(NEG))
    for fq in range(ft):
        for fk in range(ft):
            # key-frame offset relative to fq, for each plane position
            for p, shift in ((0, -ft), (1, 0), (2, ft)):
                df = (fk + shift) - fq
                if df == -1:
                    planes[p, fq * vp:(fq + 1) * vp, fk * vp:(fk + 1) * vp] = bp[0]
                elif df == 0:
                    planes[p, fq * vp:(fq + 1) * vp, fk * vp:(fk + 1) * vp] = bp[1]
                elif df == 1:
                    planes[p, fq * vp:(fq + 1) * vp, fk * vp:(fk + 1) * vp] = bp[2]
    return planes


def _row_mask(s_tile, planes_ref, first, last):
    """Additive (128, 3·128) mask for one sub-tile row: NEG-out the prev/next
    planes at the global sequence boundaries."""
    neg = jnp.float32(NEG)
    left = jnp.where(first, neg, planes_ref[0])
    right = jnp.where(last, neg, planes_ref[2])
    return jnp.concatenate([left, planes_ref[1], right], axis=1)


def _sub(ref_l, ref_m, ref_r, g, tg):
    """Sub-tile g of the mid block, with g ∈ [-2, TG+1] reaching into the
    streamed neighbor blocks."""
    if g < 0:
        return ref_l[0, tg + g]
    if g >= tg:
        return ref_r[0, g - tg]
    return ref_m[0, g]


def _kcat(ref_l, ref_m, ref_r, g, tg):
    """Keys/values of sub-tiles g−1..g+1 side-by-side along lanes: (dh, 3·ROWS)."""
    return jnp.concatenate(
        [_sub(ref_l, ref_m, ref_r, gg, tg) for gg in (g - 1, g, g + 1)], axis=1)


def _softmax_rows(s):
    a = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    return a / jnp.sum(a, axis=-1, keepdims=True)


def _dot_nt(a, b):
    """a (M,K) · bᵀ where b is (N,K)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nn(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tt(a, b):
    """Contract leading dims: a (K, M), b (K, N) → (M, N)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(q_ref, kl_ref, km_ref, kr_ref, vl_ref, vm_ref, vr_ref,
                planes_ref, o_ref, *, scale, tg, n_tiles):
    # Transposed layout: sub-tiles are (dh, ROWS) — minor dim 128. With dh=16
    # the row-major layout lane-padded every stream 8×; here lanes are full.
    # S/P/dS stay (query_row, key_col) so masks and softmax are unchanged.
    base = pl.program_id(1) * tg
    for g in range(tg):
        s_glob = base + g
        q = q_ref[0, g]                                  # (dh, ROWS)
        kcat = _kcat(kl_ref, km_ref, kr_ref, g, tg)      # (dh, 3·ROWS)
        vcat = _kcat(vl_ref, vm_ref, vr_ref, g, tg)
        s = _dot_tt(q * jnp.asarray(scale, q.dtype), kcat)   # (ROWS, 3·ROWS)
        s = s + _row_mask(s, planes_ref, s_glob == 0, s_glob == n_tiles - 1)
        p = _softmax_rows(s)
        o_ref[0, g] = _dot_nt(vcat, p.astype(vcat.dtype))    # (dh, ROWS)


def _bwd_kernel(q_l, q_m, q_r, k_l, k_m, k_r, v_l, v_m, v_r,
                do_l, do_m, do_r, d_l, d_m, d_r, planes_ref,
                dq_ref, dk_ref, dv_ref, *, scale, tg, n_tiles):
    """Per block: dQ for its TG sub-tiles; dK/dV accumulated in VMEM from the
    ds rows of query sub-tiles −1..TG (one beyond each edge)."""
    base = pl.program_id(1) * tg
    sc = jnp.float32(scale)
    dh = q_m.shape[2]
    zeros = jnp.zeros((dh, ROWS), jnp.float32)
    dk_acc = [zeros] * tg
    dv_acc = [zeros] * tg

    for g in range(-1, tg + 1):
        s_glob = base + g
        in_range = (s_glob >= 0) & (s_glob <= n_tiles - 1)
        q = _sub(q_l, q_m, q_r, g, tg)                   # (dh, ROWS)
        do = _sub(do_l, do_m, do_r, g, tg)
        # D rides row-major (ROWS, dh_pad): one lane per query row
        dvec = _sub(d_l, d_m, d_r, g, tg)[:, :1]         # (ROWS, 1)
        kcat = _kcat(k_l, k_m, k_r, g, tg)               # (dh, 3·ROWS)
        vcat = _kcat(v_l, v_m, v_r, g, tg)
        s = _dot_tt(q.astype(jnp.float32) * sc, kcat.astype(jnp.float32))
        s = s + _row_mask(s, planes_ref, s_glob == 0, s_glob == n_tiles - 1)
        p = _softmax_rows(s)
        dp = _dot_tt(do.astype(jnp.float32), vcat.astype(jnp.float32))
        ds = p * (dp - dvec)                             # (ROWS, 3·ROWS)
        ds = jnp.where(in_range, ds, 0.0)
        if 0 <= g < tg:
            dq_ref[0, g] = (_dot_nt(kcat.astype(jnp.float32), ds)
                            * sc).astype(dq_ref.dtype)
        p0 = jnp.where(in_range, p, 0.0)
        for j, gg in enumerate((g - 1, g, g + 1)):
            if 0 <= gg < tg:
                ds_blk = ds[:, j * ROWS:(j + 1) * ROWS]
                p_blk = p0[:, j * ROWS:(j + 1) * ROWS]
                dk_acc[gg] = dk_acc[gg] + _dot_nn(q.astype(jnp.float32), ds_blk) * sc
                dv_acc[gg] = dv_acc[gg] + _dot_nn(do.astype(jnp.float32), p_blk)
    for g in range(tg):
        dk_ref[0, g] = dk_acc[g].astype(dk_ref.dtype)
        dv_ref[0, g] = dv_acc[g].astype(dv_ref.dtype)


def _pack(x, vp):
    """(G, H, F, V, dh) → (G·H, n_tiles, dh, ROWS) padded (transposed layout:
    minor dim 128 — one XLA relayout that fuses with the caller's own
    transposes; inverse pairs cancel between chained calls)."""
    g, h, f, v, dh = x.shape
    if vp != v:
        x = jnp.pad(x, [(0, 0)] * 3 + [(0, vp - v), (0, 0)])
    ft = ROWS // vp
    return x.reshape(g * h, f // ft, ROWS, dh).swapaxes(2, 3)


def _pack_rows(x, vp):
    """Row-major (GH, n_tiles, ROWS, dh) pack — used only for the tiny D
    stream, whose per-query scalar must index SUBLANES."""
    g, h, f, v, dh = x.shape
    if vp != v:
        x = jnp.pad(x, [(0, 0)] * 3 + [(0, vp - v), (0, 0)])
    ft = ROWS // vp
    return x.reshape(g * h, f // ft, ROWS, dh)


def _unpack(x, g, h, f, v, dh, vp):
    ft = ROWS // vp
    x = x.swapaxes(2, 3).reshape(g, h, f // ft, ft, vp, dh)[:, :, :, :, :v]
    return x.reshape(g, h, f, v, dh)


def _specs(tg, dh, n_grid_t, rows_major=False):
    """(left, mid, right) block specs over a (GH, n_tiles, dh, ROWS) array
    ((GH, n_tiles, ROWS, dh) when ``rows_major``). Neighbor indices clamp at
    the edges; boundary masking makes the clamped data irrelevant."""
    shape = (1, tg, ROWS, dh) if rows_major else (1, tg, dh, ROWS)

    def mk(off):
        def imap(b, i):
            j = i + off
            j = jnp.clip(j, 0, n_grid_t - 1) if off else i
            return (b, j, 0, 0)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    return mk(-1), mk(0), mk(1)


def _pick_tg(n_tiles: int, preferred: int = 8) -> int:
    import os

    override = os.environ.get("PALLAS_BANDED_TG")
    if override:
        preferred = int(override)
    tg = max(1, min(preferred, n_tiles))
    while n_tiles % tg:
        tg -= 1
    return tg


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _banded(q, k, v, band_key, scale, vp):
    out, _ = _banded_fwd(q, k, v, band_key, scale, vp)
    return out


def _banded_fwd(q, k, v, band_key, scale, vp):
    g, h, f, vtok, dh = q.shape
    ft = ROWS // vp
    qs, ks, vs = (_pack(x, vp) for x in (q, k, v))
    gh, n_tiles = qs.shape[0], qs.shape[1]
    tg = _pick_tg(n_tiles)
    planes = jnp.asarray(_planes(band_key, vp, ft))
    kl, km, kr = _specs(tg, dh, n_tiles // tg)
    plane_spec = pl.BlockSpec((3, ROWS, ROWS), lambda b, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, tg=tg, n_tiles=n_tiles),
        grid=(gh, n_tiles // tg),
        in_specs=[km, kl, km, kr, kl, km, kr, plane_spec],
        out_specs=km,
        out_shape=jax.ShapeDtypeStruct(qs.shape, jnp.float32),
        interpret=_interpret(),
    )(qs, ks, ks, ks, vs, vs, vs, planes)
    return _unpack(out, g, h, f, vtok, dh, vp), (q, k, v)


def _banded_bwd(band_key, scale, vp, res, grad):
    q, k, v = res
    g, h, f, vtok, dh = q.shape
    ft = ROWS // vp
    # D = rowsum(dO · O): recompute O via the fwd kernel (cheap relative to
    # a second HBM round of the score tensor) — or fold from the residual.
    out, _ = _banded_fwd(q, k, v, band_key, scale, vp)
    d = jnp.sum(grad.astype(jnp.float32) * out, axis=-1, keepdims=True)  # (G,H,F,V,1)

    qs, ks, vs = (_pack(x, vp) for x in (q, k, v))
    gs = _pack(grad, vp)
    # D rides row-major at full dh width (broadcast): per-query scalars must
    # index sublanes, and a 1-lane block is hostile to Mosaic tiling.
    ds_rows = _pack_rows(jnp.broadcast_to(d, d.shape[:-1] + (dh,)), vp)
    gh, n_tiles = qs.shape[0], qs.shape[1]
    # bwd keeps (TG+2) unrolled sub-tiles' (128, 384) score/prob/ds planes
    # live on the VMEM stack; tg 8 measured 18M > the 16M scoped limit
    # (tools/kernel_batch16) — default 4.
    tg = _pick_tg(n_tiles, preferred=4)
    planes = jnp.asarray(_planes(band_key, vp, ft))
    kl, km, kr = _specs(tg, dh, n_tiles // tg)
    dl, dm, dr = _specs(tg, dh, n_tiles // tg, rows_major=True)
    plane_spec = pl.BlockSpec((3, ROWS, ROWS), lambda b, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(qs.shape, q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, tg=tg, n_tiles=n_tiles),
        grid=(gh, n_tiles // tg),
        in_specs=[kl, km, kr, kl, km, kr, kl, km, kr, kl, km, kr,
                  dl, dm, dr, plane_spec],
        out_specs=(km, km, km),
        out_shape=(shape, shape, shape),
        interpret=_interpret(),
    )(qs, qs, qs, ks, ks, ks, vs, vs, vs, gs, gs, gs,
      ds_rows, ds_rows, ds_rows, planes)

    def un(x):
        return _unpack(x, g, h, f, vtok, dh, vp)

    return un(dq), un(dk), un(dv)


_banded.defvjp(_banded_fwd, _banded_bwd)


# ---------------------------------------------------------------------------
# Round-4 "packed" banded kernel (VERDICT r3 item 3, second attempt).
#
# Why the round-2 kernel above lost to XLA (5.9ms vs 3.2ms at the GATE
# config) — three structural costs, each fixed here:
#   1. Triple streaming: every q/k/v/do array was streamed 3× (l/m/r
#      neighbor block specs). Here each input is streamed ONCE as a whole
#      (dh, F·Vp) plane per (b,h) grid step — dh=16, F·Vp=6144 is 196KB
#      bf16, trivially VMEM-resident.
#   2. Serialized MXU issue: per-sub-tile unrolled dots paid the Mosaic
#      issue gap 2·TG times per grid step (the same gap the windowed
#      kernel's batch-29 program measured at ~200µs). Here ONE batched
#      dot_general covers all F/FT tiles per plane (tmq_bmm form).
#   3. 3× score FLOPs + kcat concats: the ±1-frame key blocks are
#      IDENTITY-masked (additive_mask(eye) — `GATE.py:142`/`WGATE.py:190`
#      band structure), i.e. each query has exactly ONE prev-frame and ONE
#      next-frame key: a per-token dot product, not a matmul. Those scores
#      are computed on the VPU as Σ_d(Q ⊙ shift(K, ±Vp lanes)) — the MXU
#      only computes the same-frame V×V spatial block.
#
# Layout: (G·H, dh, F·Vp) — dh-major, every stream physically unpadded
# (sublane dim 16 = 2 sublane tiles, lane dim a multiple of 128). Scores are
# transposed (key, query) per 128-token tile (FT = 128//Vp frames), softmax
# runs over key-sublanes + the two VPU band scalars. f32-exact masking
# semantics as `banded_frame_attention` (NEG = −1e4 additive, underflow to
# exact 0 — same argument as the windowed kernel).
# ---------------------------------------------------------------------------


def _bdot(a, b, ca, cb):
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _shift_lanes(x, vp, left):
    """Shift (dh, L) right (left=False) or left by vp lanes, zero-filled."""
    pad = jnp.zeros((x.shape[0], vp), x.dtype)
    if left:
        return jnp.concatenate([x[:, vp:], pad], axis=1)
    return jnp.concatenate([pad, x[:, :-vp]], axis=1)


def _band_scores(qw, kw, vp, scale):
    """VPU ±1-frame identity-band scores: (s_prev, s_next) each (1, L) f32,
    plus the shifted key planes (reused for the value aggregation)."""
    kprev = _shift_lanes(kw, vp, left=False)
    knext = _shift_lanes(kw, vp, left=True)
    qf = qw.astype(jnp.float32)
    s_prev = jnp.sum(qf * kprev.astype(jnp.float32), axis=0,
                     keepdims=True) * scale
    s_next = jnp.sum(qf * knext.astype(jnp.float32), axis=0,
                     keepdims=True) * scale
    return s_prev, s_next


def _tiles(w, n_tiles):
    """(dh, L) → (n_tiles, dh, 128): in-VMEM stack of 128-aligned lane
    slices (measured ~free — the tsw_bstack schedule, kernel_batch41)."""
    return jnp.stack([w[:, t * ROWS:(t + 1) * ROWS] for t in range(n_tiles)])


def _untile(x3, n_tiles):
    return jnp.concatenate([x3[t] for t in range(n_tiles)], axis=1)


def _packed_softmax(st, s_prev, s_next, n_tiles):
    """st (T, 128k, 128q) masked scores; s_prev/s_next (1, L) masked band
    scores. Returns (a_self, a_prev, a_next, spt, snt) — normalized
    probabilities, the band ones as (T, 1, 128q)."""
    spt = _tiles(s_prev, n_tiles)                       # (T, 1, 128)
    snt = _tiles(s_next, n_tiles)
    m = jnp.maximum(jnp.max(st, axis=1, keepdims=True),
                    jnp.maximum(spt, snt))              # (T, 1, 128)
    e_self = jnp.exp(st - m)
    e_prev = jnp.exp(spt - m)
    e_next = jnp.exp(snt - m)
    denom = jnp.sum(e_self, axis=1, keepdims=True) + e_prev + e_next
    return e_self / denom, e_prev / denom, e_next / denom


def _fwd_kernel_packed_mm(q_ref, k_ref, v_ref, mself_ref, padd_ref, nadd_ref,
                          o_ref, *, scale, n_tiles, vp):
    """Decomposition probe: the two batched dots only (no VPU band scores,
    masking, softmax, or identity aggregation). Selected HOST-side (distinct
    kernel ⇒ distinct jit cache entry) and forward-only — see
    ``pallas_packed_banded_attention``."""
    qw, kw, vw = q_ref[0], k_ref[0], v_ref[0]           # (dh, L)
    qs, ks, vs = (_tiles(w, n_tiles) for w in (qw, kw, vw))
    st = _bdot(ks, qs, 1, 1)
    o3 = _bdot(vs, st.astype(vw.dtype), 2, 1)
    o_ref[0] = _untile(o3, n_tiles).astype(o_ref.dtype)


def _fwd_kernel_packed(q_ref, k_ref, v_ref, mself_ref, padd_ref, nadd_ref,
                       o_ref, *, scale, n_tiles, vp):
    qw, kw, vw = q_ref[0], k_ref[0], v_ref[0]           # (dh, L)
    s_prev, s_next = _band_scores(qw, kw, vp, scale)
    s_prev = s_prev + padd_ref[:]
    s_next = s_next + nadd_ref[:]

    qs, ks, vs = (_tiles(w, n_tiles) for w in (qw, kw, vw))
    st = _bdot(ks, qs, 1, 1) * jnp.float32(scale) + mself_ref[:][None]
    a_self, ap, an = _packed_softmax(st, s_prev, s_next, n_tiles)

    o3 = _bdot(vs, a_self.astype(vw.dtype), 2, 1)       # (T, dh, 128q)
    o = _untile(o3, n_tiles)
    vprev = _shift_lanes(vw, vp, left=False).astype(jnp.float32)
    vnext = _shift_lanes(vw, vp, left=True).astype(jnp.float32)
    o = o + _untile(ap, n_tiles) * vprev + _untile(an, n_tiles) * vnext
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel_packed(q_ref, k_ref, v_ref, do_ref, mself_ref, padd_ref,
                       nadd_ref, dq_ref, dk_ref, dv_ref, *, scale, n_tiles, vp):
    """Flash-style fused backward: recompute probabilities, then
    dV = A·dOᵀ, dS = A∘(dP − D), dQ = K·dS, dK = Q·dSᵀ — all per-plane in
    VMEM, identity-band terms on the VPU via the same lane shifts."""
    qw, kw, vw, dow = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    sc = jnp.float32(scale)
    s_prev, s_next = _band_scores(qw, kw, vp, scale)
    s_prev = s_prev + padd_ref[:]
    s_next = s_next + nadd_ref[:]
    qs, ks, vs = (_tiles(w, n_tiles) for w in (qw, kw, vw))
    st = _bdot(ks, qs, 1, 1) * sc + mself_ref[:][None]
    a_self, ap, an = _packed_softmax(st, s_prev, s_next, n_tiles)

    dos = _tiles(dow, n_tiles)                          # (T, dh, 128q)
    dp_self = _bdot(vs, dos, 1, 1)                      # (T, 128k, 128q)
    vprev = _shift_lanes(vw, vp, left=False).astype(jnp.float32)
    vnext = _shift_lanes(vw, vp, left=True).astype(jnp.float32)
    dof = dow.astype(jnp.float32)
    dp_prev = jnp.sum(dof * vprev, axis=0, keepdims=True)   # (1, L)
    dp_next = jnp.sum(dof * vnext, axis=0, keepdims=True)
    dp_prev_t = _tiles(dp_prev, n_tiles)                # (T, 1, 128)
    dp_next_t = _tiles(dp_next, n_tiles)

    # D[q] = Σ_keys a·dp (all three bands)
    d_vec = (jnp.sum(a_self * dp_self, axis=1, keepdims=True)
             + ap * dp_prev_t + an * dp_next_t)         # (T, 1, 128)

    ds_self = a_self * (dp_self - d_vec)                # (T, 128k, 128q)
    ds_prev = ap * (dp_prev_t - d_vec)                  # (T, 1, 128)
    ds_next = an * (dp_next_t - d_vec)
    dsp = _untile(ds_prev, n_tiles)                     # (1, L)
    dsn = _untile(ds_next, n_tiles)

    kprev = _shift_lanes(kw, vp, left=False).astype(jnp.float32)
    knext = _shift_lanes(kw, vp, left=True).astype(jnp.float32)
    qf = qw.astype(jnp.float32)

    dq3 = _bdot(ks, ds_self.astype(kw.dtype), 2, 1)     # (T, dh, 128q)
    dq = _untile(dq3, n_tiles) * sc + sc * (dsp * kprev + dsn * knext)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk3 = _bdot(qs, ds_self.astype(qw.dtype), 2, 2)     # (T, dh, 128k)
    # key at token t receives: from query t+Vp via its prev-band score, and
    # from query t−Vp via its next-band score
    dk = (_untile(dk3, n_tiles) * sc
          + sc * _shift_lanes(dsp * qf, vp, left=True)
          + sc * _shift_lanes(dsn * qf, vp, left=False))
    dk_ref[0] = dk.astype(dk_ref.dtype)

    dv3 = _bdot(dos, a_self.astype(dow.dtype), 2, 2)    # (T, dh, 128k)
    dv = (_untile(dv3, n_tiles)
          + _shift_lanes(_untile(ap, n_tiles) * dof, vp, left=True)
          + _shift_lanes(_untile(an, n_tiles) * dof, vp, left=False))
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _packed_masks(band_key, vp: int, f: int):
    """Static masks for the packed kernel: M_selfT (128, 128) transposed
    (key, query) same-frame additive plane; prev/next per-token additive
    vectors (1, F·Vp) carrying the band diagonal + global-boundary NEG."""
    band = _BAND_CACHE[band_key]
    v = band.shape[1]
    ft = ROWS // vp
    bp1 = np.full((vp, vp), np.float32(NEG))
    bp1[:v, :v] = band[1]
    mself = np.full((ROWS, ROWS), np.float32(NEG))
    for fq in range(ft):
        blk = slice(fq * vp, (fq + 1) * vp)
        mself[blk, blk] = bp1.T                         # (key, query)
    diag0 = np.full((vp,), np.float32(NEG))
    diag2 = np.full((vp,), np.float32(NEG))
    diag0[:v] = np.diag(band[0])
    diag2[:v] = np.diag(band[2])
    prev_add = np.tile(diag0, f)
    next_add = np.tile(diag2, f)
    prev_add[: vp] = NEG                                # global f == 0
    next_add[-vp:] = NEG                                # global f == F−1
    return mself, prev_add[None], next_add[None]


def _pack_plane(x, vp):
    """(G, H, F, V, dh) → (G·H, dh, F·Vp)."""
    g, h, f, v, dh = x.shape
    if vp != v:
        x = jnp.pad(x, [(0, 0)] * 3 + [(0, vp - v), (0, 0)])
    return x.reshape(g * h, f * vp, dh).swapaxes(1, 2)


def _unpack_plane(x, g, h, f, v, dh, vp):
    return x.swapaxes(1, 2).reshape(g, h, f, vp, dh)[:, :, :, :v]


def _diag_band(band: np.ndarray) -> bool:
    """Packed-kernel applicability: prev/next planes must be diagonal
    (identity-temporal structure, as in GATE/WGATE)."""
    v = band.shape[1]
    off = ~np.eye(v, dtype=bool)
    return bool(np.all(band[0][off] <= NEG / 2) and np.all(band[2][off] <= NEG / 2))


# The custom_vjp boundary sits at the PLANE level ((G·H, dh, F·Vp) streams):
# the (G,H,F,V,dh) pack/unpack views outside it differentiate automatically,
# and callers that already hold the plane layout (the WGATE TransposedDense
# zero-pad path, `models/wgate.py`) skip the pack entirely.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _packed_planes(qs, ks, vs, band_key, scale, vp, f, out_dtype):
    out, _ = _packed_planes_fwd(qs, ks, vs, band_key, scale, vp, f, out_dtype)
    return out


def _packed_planes_fwd(qs, ks, vs, band_key, scale, vp, f, out_dtype):
    masks = _packed_masks(band_key, vp, f)
    out = _packed_call(_fwd_kernel_packed, 1, qs, ks, vs, (), masks,
                       scale=scale, vp=vp, out_dtype=jnp.dtype(out_dtype))
    return out, (qs, ks, vs)


def _packed_planes_bwd(band_key, scale, vp, f, out_dtype, res, grad):
    qs, ks, vs = res
    # dO rides in the STREAM dtype: the kernel's MXU dots contract it
    # against the bf16 q/k/v planes (mixed-dtype dot_general is an untested
    # Mosaic lowering, and an f32 dO stream doubles its HBM traffic); the
    # VPU band terms upcast per-element inside the kernel as before.
    gs = grad.astype(qs.dtype)
    masks = _packed_masks(band_key, vp, f)
    dq, dk, dv = _packed_call(_bwd_kernel_packed, 3, qs, ks, vs, (gs,), masks,
                              scale=scale, vp=vp, out_dtype=qs.dtype)
    return dq, dk, dv


_packed_planes.defvjp(_packed_planes_fwd, _packed_planes_bwd)


def _packed(q, k, v, band_key, scale, vp, out_dtype):
    g, h, f, vtok, dh = q.shape
    qs, ks, vs = (_pack_plane(x, vp) for x in (q, k, v))
    out = _packed_planes(qs, ks, vs, band_key, scale, vp, f, out_dtype)
    return _unpack_plane(out, g, h, f, vtok, dh, vp)


def _packed_call(kernel, n_out, qs, ks, vs, extra, masks, *, scale, vp,
                 out_dtype):
    gh, dh, length = qs.shape
    n_tiles = length // ROWS
    plane = pl.BlockSpec((1, dh, length), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    mself = pl.BlockSpec((ROWS, ROWS), lambda b: (0, 0),
                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, length), lambda b: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(qs.shape, out_dtype)
    return pl.pallas_call(
        functools.partial(kernel, scale=scale, n_tiles=n_tiles, vp=vp),
        grid=(gh,),
        in_specs=[plane] * (3 + len(extra)) + [mself, vec, vec],
        out_specs=plane if n_out == 1 else (plane,) * n_out,
        out_shape=shape if n_out == 1 else (shape,) * n_out,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(qs, ks, vs, *extra, *(jnp.asarray(m) for m in masks))


def pallas_packed_banded_attention_planes(qs, ks, vs, band_mask, *,
                                          scale: float, vp: int, frames: int,
                                          out_dtype=jnp.float32):
    """Plane-layout entry to the frame-packed banded kernel: q/k/v arrive
    ALREADY in the kernel's (G·H, dh, F·Vp) stream layout — no pack/unpack.

    The WGATE zero-pad path (`models/wgate.py::BandedMSA`, V == Vp and
    F·Vp % 128 == 0) emits this layout straight from TransposedDense
    projections (major-axis permutes only), removing the ~1.2 ms/chain pack
    relayout the array-level entry pays (VERDICT r4 item 2 residual).
    Differentiable via the fused flash-style backward kernel.
    """
    band = np.asarray(band_mask, np.float32)
    if not _diag_band(band):
        raise ValueError("packed banded kernel needs diagonal prev/next "
                         "band planes")
    if qs.ndim != 3 or qs.shape[2] % ROWS:
        raise ValueError(f"plane layout is (GH, dh, F*Vp) with F*Vp a "
                         f"multiple of {ROWS}; got {qs.shape}")
    if qs.shape[2] != frames * vp:
        raise ValueError(f"plane lane dim {qs.shape[2]} != frames*vp "
                         f"({frames}*{vp})")
    key = _cache_band(band)
    return _packed_planes(qs, ks, vs, key, float(scale), int(vp), int(frames),
                          out_dtype)


def pallas_packed_banded_attention(q, k, v, band_mask, *, scale: float,
                                   vp: int | None = None,
                                   out_dtype=jnp.float32):
    """Frame-packed fused drop-in for ``banded_frame_attention`` (no-halo
    case) — requires diagonal prev/next band planes (identity-temporal
    structure, true for GATE/WGATE: `GATE.py:56-66`, `WGATE.py:94-104`).

    q, k, v: (G, H, F, V, dh). F·Vp must be a multiple of 128.
    Differentiable via the fused flash-style backward kernel.
    """
    band = np.asarray(band_mask, np.float32)
    if not _diag_band(band):
        raise ValueError("packed banded kernel needs diagonal prev/next "
                         "band planes; use pallas_banded_frame_attention")
    v_tok = q.shape[3]
    if vp is None:
        vp = ROWS
        for cand in (8, 16, 32, 64, 128):
            if v_tok <= cand:
                vp = cand
                break
    if (q.shape[2] * vp) % ROWS:
        raise ValueError(f"F·Vp ({q.shape[2]}·{vp}) must be a multiple of {ROWS}")
    key = _cache_band(band)
    import os

    if os.environ.get("PALLAS_BANDED_PACKED_MM") == "1":
        # MM-only decomposition probe, selected HOST-side so it compiles as
        # a different kernel (a trace-time env read inside the kernel body
        # would silently reuse the stale cache on toggle). Forward-only: no
        # custom_vjp is attached, so differentiating the probe raises
        # instead of pairing it with the real backward.
        g, h, f, vtok, dh = q.shape
        qs, ks, vs = (_pack_plane(x, vp) for x in (q, k, v))
        masks = _packed_masks(key, vp, f)
        out = _packed_call(_fwd_kernel_packed_mm, 1, qs, ks, vs, (), masks,
                           scale=float(scale), vp=int(vp),
                           out_dtype=jnp.dtype(out_dtype))
        return _unpack_plane(out, g, h, f, vtok, dh, vp)
    return _packed(q, k, v, key, float(scale), int(vp), out_dtype)


def pallas_banded_frame_attention(q, k, v, band_mask, *, scale: float,
                                  vp: int | None = None):
    """Fused drop-in for ``banded_frame_attention`` (no-halo case).

    q, k, v: (G, H, F, V, dh); ``band_mask``: static (3, V, V) additive masks
    [prev | self | next] with entries {0, −1e4}. F·(128//Vp)⁻¹ must be an
    integer (F is padded by the caller if needed). Differentiable via the
    fused flash-style backward kernel.
    """
    band = np.asarray(band_mask, np.float32)
    v_tok = q.shape[3]
    if vp is None:
        vp = ROWS
        for cand in (16, 32, 64, 128):
            if v_tok <= cand:
                vp = cand
                break
    f = q.shape[2]
    ft = ROWS // vp
    if f % ft:
        raise ValueError(f"frames ({f}) must be a multiple of {ft} (=128/{vp})")
    key = _cache_band(band)
    return _banded(q, k, v, key, float(scale), int(vp))
