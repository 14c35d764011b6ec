"""Adjacency-masked multi-head attention.

Three levels:

1. ``masked_msa_oracle`` — literal transcription of the reference MSA semantics
   (`hwgat/models/HWGATE.py:84-118`, `HGATE.py:84-108`, `WGATE.py:87-108`,
   `GATE.py:49-69`) used as the numerics oracle in tests.

2. ``stacked_window_attention`` — the TPU-native dense path for small-token
   attention (HWGATE 32-token windows, HGATE 58-token blocks). S units of N
   tokens are stacked into one supertile of S·N=128 rows so both attention
   matmuls are MXU-shaped (128×128×64). Cross-unit score entries are driven to
   -1e4 exactly like masked edges; after softmax they are exactly 0.0 in f32
   (exp underflow), so the stacked result is bitwise-equivalent to per-unit
   softmax while running at full MXU utilization.

3. ``banded_frame_attention`` — the sparse-structured path for the large-token
   models (WGATE F·16 tokens, GATE F·29 tokens) whose adjacency is
   block-tridiagonal over frames. Instead of materializing the O((F·V)²) score
   matrix the reference uses, each query frame attends only to its ±1 frame
   band (3·V keys): a 64×–2000× reduction in score work with f32-exact parity
   (out-of-band scores carry -1e4 and underflow to exactly 0 after softmax).

The reference's quirks are reproduced under flags:
- multiplicative masking maps *genuinely zero* scores to -1e4 too
  (``attn.masked_fill(attn == 0, -1e4)``, `HWGATE.py:110`) — ``zero_quirk``;
- HWGATE's train-time random attention pruning (`HWGATE.py:94-100`) zeroes
  entries whose per-row softmax probability exceeds a single uniform scalar
  drawn once per MSA call — ``prune_u``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

NEG = -10000.0
# Finite stand-in for -inf when isolating units inside a supertile; chosen so
# exp(x - max) underflows to exactly 0 yet never produces NaN via inf - inf.
UNIT_NEG = -1e30


def _apply_mul_mask_quirk(scores: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
    """s*adj then masked_fill(==0, -1e4)  ≡  where(adj==0 or s==0, -1e4, s)."""
    return jnp.where((adj == 0) | (scores == 0), jnp.float32(NEG), scores)


def _prune(scores: jnp.ndarray, prune_u, axis: int = -1) -> jnp.ndarray:
    """Train-time attention pruning, `HWGATE.py:94-100`.

    Zeroes score entries whose softmax probability (over raw scores) exceeds
    the uniform scalar ``prune_u``; zeros are then caught by the ==0 quirk.
    """
    prob = jnp.exp(scores - jnp.max(scores, axis=axis, keepdims=True))
    prob = prob / jnp.sum(prob, axis=axis, keepdims=True)
    return jnp.where(prob > prune_u, 0.0, scores)


def masked_msa_oracle(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    adj: jnp.ndarray | None = None,
    add_mask: jnp.ndarray | None = None,
    scale: float,
    zero_quirk: bool = True,
    prune_u=None,
) -> jnp.ndarray:
    """Reference-ordered masked attention on (G, H, N, dh) tensors.

    ``adj``: (M, N, N) multiplicative {0,1} mask; group g uses ``adj[g % M]``.
    ``add_mask``: (M, N, N) additive {-1e4, 0} mask, same periodicity.
    Exactly one of the two may be given (or neither = plain attention).
    """
    g, h, n, dh = q.shape
    s = jnp.einsum("ghnd,ghmd->ghnm", q * scale, k)
    if prune_u is not None:
        s = _prune(s, prune_u)
    if adj is not None:
        m = adj.shape[0]
        s = s.reshape(g // m, m, h, n, n)
        s = s * adj[None, :, None]
        s = s.reshape(g, h, n, n)
        if zero_quirk:
            s = jnp.where(s == 0, jnp.float32(NEG), s)
    if add_mask is not None:
        m = add_mask.shape[0]
        s = s.reshape(g // m, m, h, n, n) + add_mask[None, :, None]
        s = s.reshape(g, h, n, n)
    a = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    a = a / jnp.sum(a, axis=-1, keepdims=True)
    return jnp.einsum("ghnm,ghmd->ghnd", a, v)


def stacked_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    adj: jnp.ndarray,
    *,
    scale: float,
    stack: int = 4,
    pad_tokens: int | None = None,
    zero_quirk: bool = True,
    prune_u=None,
) -> jnp.ndarray:
    """Masked attention over (U, N, dh) units via S·N-token supertiles.

    ``U`` = flattened (group, head) units, all sharing one (N, N)
    multiplicative ``adj`` (true for HWGATE/HGATE: the reference uses an
    identical edge topology for all four windows, `model_params.py:261-369`).
    ``pad_tokens`` pads N up (e.g. HGATE 58 → 64) so S·Np hits the 128 lane
    width; padded tokens are masked out and stripped from the output.
    """
    u, n, dh = q.shape
    np_ = n if pad_tokens is None else pad_tokens
    if np_ != n:
        pad = [(0, 0), (0, np_ - n), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    s_tok = stack * np_
    t = u // stack
    qs = q.reshape(t, s_tok, dh)
    ks = k.reshape(t, s_tok, dh)
    vs = v.reshape(t, s_tok, dh)

    # Static supertile masks.
    adj_p = np.zeros((np_, np_), dtype=np.float32)
    adj_p[:n, :n] = np.asarray(adj, dtype=np.float32)
    tile_adj = np.kron(np.eye(stack, dtype=np.float32), adj_p)        # block-diag adjacency
    unit_blk = np.kron(np.eye(stack, dtype=np.float32), np.ones((np_, np_), np.float32))
    valid = np.zeros((np_,), np.float32)
    valid[:n] = 1.0
    tok_valid = np.tile(valid, stack)                                  # 1 for real tokens
    tile_adj *= tok_valid[None, :] * tok_valid[:, None]
    tile_adj_j = jnp.asarray(tile_adj)
    unit_blk_j = jnp.asarray(unit_blk * (tok_valid[None, :] * tok_valid[:, None]))

    s = jnp.einsum("tid,tjd->tij", qs * scale, ks, preferred_element_type=jnp.float32)
    if prune_u is not None:
        # Per-unit softmax for the prune probability: isolate cross-unit /
        # padded entries before normalizing.
        s_iso = jnp.where(unit_blk_j == 1, s, jnp.float32(UNIT_NEG))
        prob = jnp.exp(s_iso - jnp.max(s_iso, axis=-1, keepdims=True))
        prob = prob / jnp.sum(prob, axis=-1, keepdims=True)
        s = jnp.where(prob > prune_u, 0.0, s)
    if zero_quirk:
        s = jnp.where((tile_adj_j == 0) | (s == 0), jnp.float32(NEG), s)
    else:
        s = jnp.where(tile_adj_j == 0, jnp.float32(NEG), s)
    # Cross-unit / padded entries sit strictly below the -1e4 mask level so a
    # fully-masked row (e.g. aggressive pruning) still softmaxes uniformly over
    # its own unit's tokens, exactly like the reference's per-window softmax.
    s = jnp.where(unit_blk_j == 0, jnp.float32(2 * NEG), s)
    a = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    a = a / jnp.sum(a, axis=-1, keepdims=True)
    out = jnp.einsum("tij,tjd->tid", a, vs, preferred_element_type=jnp.float32)
    out = out.reshape(u, np_, dh)
    return out[:, :n] if np_ != n else out


def banded_frame_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    band_mask: jnp.ndarray,
    *,
    scale: float,
    halo: tuple | None = None,
    edge_valid: tuple | None = None,
) -> jnp.ndarray:
    """Additive-masked attention with block-tridiagonal (±1 frame) structure.

    q, k, v: (G, H, F, V, dh) — tokens grouped by frame. ``band_mask``:
    (3, V, V) additive masks for the [prev | self | next] frame key blocks
    (entries are 0 on edges, -1e4 off-edges). Out-of-range neighbor frames are
    masked with -1e4, matching the dense computation exactly in f32.

    Replaces the reference's dense (F·V)² additive-mask attention
    (`WGATE.py:94-104`, `GATE.py:56-66`) with O(F·V·3V) score work.

    Sharded use (frame axis split across devices): pass
    ``halo = (left_k, left_v, right_k, right_v)`` — the neighbor shard's
    boundary frame (G, H, 1, V, dh) each — and ``edge_valid = (left, right)``
    {0,1} scalars marking whether a neighbor shard exists (0 at the global
    clip boundary). See ``parallel/edge_partition.py``.
    """
    g, h, f, vtok, dh = q.shape
    if halo is None:
        zeros = jnp.zeros_like(k[:, :, :1])
        lk = lv = rk = rv = zeros
        left_exists = right_exists = jnp.float32(0.0)
    else:
        lk, lv, rk, rv = halo
        left_exists, right_exists = edge_valid

    k_prev = jnp.concatenate([lk, k[:, :, :-1]], axis=2)
    k_next = jnp.concatenate([k[:, :, 1:], rk], axis=2)
    v_prev = jnp.concatenate([lv, v[:, :, :-1]], axis=2)
    v_next = jnp.concatenate([v[:, :, 1:], rv], axis=2)

    k_band = jnp.concatenate([k_prev, k, k_next], axis=3)   # (G,H,F,3V,dh)
    v_band = jnp.concatenate([v_prev, v, v_next], axis=3)

    s = jnp.einsum("ghfvd,ghfwd->ghfvw", q * scale, k_band,
                   preferred_element_type=jnp.float32)       # (G,H,F,V,3V)

    mask = jnp.concatenate([band_mask[0], band_mask[1], band_mask[2]], axis=-1)  # (V,3V)
    s = s + mask[None, None, None]

    # Invalidate the out-of-range neighbor blocks at the (local or global)
    # clip boundaries; with a halo present the boundary is valid.
    fidx = jnp.arange(f)
    left_invalid = (fidx == 0).astype(jnp.float32) * (1.0 - left_exists) * NEG
    right_invalid = (fidx == f - 1).astype(jnp.float32) * (1.0 - right_exists) * NEG
    edge = jnp.concatenate(
        [
            jnp.broadcast_to(left_invalid[:, None], (f, vtok)),
            jnp.zeros((f, vtok)),
            jnp.broadcast_to(right_invalid[:, None], (f, vtok)),
        ],
        axis=-1,
    )                                                         # (F,3V)
    s = s + edge[None, None, :, None, :]

    a = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    a = a / jnp.sum(a, axis=-1, keepdims=True)
    # bf16 inputs: scores/softmax stay f32 (above); the AV matmul runs in the
    # value dtype with f32 accumulation (mixed-precision fast path)
    return jnp.einsum("ghfvw,ghfwd->ghfvd", a.astype(v_band.dtype), v_band,
                      preferred_element_type=jnp.float32)


def compact_banded_frame_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    spatial_mask: jnp.ndarray,
    *,
    scale: float,
    halo: tuple | None = None,
    edge_valid: tuple | None = None,
) -> jnp.ndarray:
    """Banded attention specialized to the actual band structure of this
    model family: the prev/next planes of the band are IDENTITY-masked
    (`models/wgate.py::_band` — only the same joint one frame away is an
    edge), so the ``banded_frame_attention`` formulation computes V keys per
    temporal direction where exactly ONE is unmasked.

    This form computes the same-frame block densely and the two temporal
    links as elementwise dots: scores are (V, V+2) instead of (V, 3V) —
    3× less SDDMM/SpMM FLOPs and ~2.8× less score traffic. Numerically
    EQUAL to ``banded_frame_attention`` with band
    ``[additive(eye), spatial_mask, additive(eye)]``: the dropped entries
    carry the -1e4 additive mask, whose softmax weight underflows to exactly
    0.0 in f32, and the row max always comes from an unmasked entry.

    q, k, v: (G, H, F, V, dh); ``spatial_mask``: (V, V) additive plane.
    ``halo``/``edge_valid``: as in ``banded_frame_attention``.
    """
    g, h, f, vtok, dh = q.shape
    if halo is None:
        zeros = jnp.zeros_like(k[:, :, :1])
        lk = lv = rk = rv = zeros
        left_exists = right_exists = jnp.float32(0.0)
    else:
        lk, lv, rk, rv = halo
        left_exists, right_exists = edge_valid

    k_prev = jnp.concatenate([lk, k[:, :, :-1]], axis=2)
    k_next = jnp.concatenate([k[:, :, 1:], rk], axis=2)
    v_prev = jnp.concatenate([lv, v[:, :, :-1]], axis=2)
    v_next = jnp.concatenate([v[:, :, 1:], rv], axis=2)

    qs = q * scale
    s_self = jnp.einsum("ghfvd,ghfwd->ghfvw", qs, k,
                        preferred_element_type=jnp.float32)
    s_self = s_self + spatial_mask[None, None, None]
    s_prev = jnp.sum(qs.astype(jnp.float32) * k_prev.astype(jnp.float32), -1)
    s_next = jnp.sum(qs.astype(jnp.float32) * k_next.astype(jnp.float32), -1)

    fidx = jnp.arange(f)
    left_invalid = (fidx == 0).astype(jnp.float32) * (1.0 - left_exists) * NEG
    right_invalid = (fidx == f - 1).astype(jnp.float32) * (1.0 - right_exists) * NEG
    s_prev = s_prev + left_invalid[None, None, :, None]
    s_next = s_next + right_invalid[None, None, :, None]

    s = jnp.concatenate([s_prev[..., None], s_self, s_next[..., None]], -1)
    a = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    a = a / jnp.sum(a, axis=-1, keepdims=True)
    out = jnp.einsum("ghfvw,ghfwd->ghfvd", a[..., 1:-1].astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out + a[..., :1] * v_prev.astype(jnp.float32)
    out = out + a[..., -1:] * v_next.astype(jnp.float32)
    return out
