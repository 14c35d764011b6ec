"""Window/block layout transforms.

These are pure reshape/transpose index maps — XLA compiles them to layout
changes, so they cost at most one HBM copy and usually fuse away entirely.

Shape conventions follow the reference:
- ``window_partition``  ≡ `hwgat/models/HWGATE.py:30-47`  (B,F,K,D) → (B·f·nW, TP·W, D)
- ``block_partition``   ≡ `hwgat/models/HGATE.py:30-47`   (B,F,K,D) → (B·f, TP·K, D)
- ``spatial_window_partition`` ≡ `hwgat/models/WGATE.py:32-66` (B,F,K,D) → (B·nW, F·W, D)
- ``temporal_merge``    ≡ `hwgat/models/HWGATE.py:49-63`  (B,F,K,D) → (B,F/TP,K,TP·D)
"""

from __future__ import annotations

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window_size: int, temporal_patch: int) -> jnp.ndarray:
    """(B, F, K, D) → (B·f·nW, TP·W, D): group TP frames × one spatial window."""
    b, f_total, k, d = x.shape
    tp, w = temporal_patch, window_size
    f, nw = f_total // tp, k // w
    x = x.reshape(b, f, tp, nw, w, d).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * f * nw, tp * w, d)


def window_reverse(x: jnp.ndarray, window_size: int, temporal_patch: int,
                   temporal_dim: int, num_kps: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition`."""
    tp, w = temporal_patch, window_size
    f, nw = temporal_dim // tp, num_kps // w
    d = x.shape[-1]
    b = x.shape[0] // (f * nw)
    x = x.reshape(b, f, nw, tp, w, d).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, temporal_dim, num_kps, d)


def block_partition(x: jnp.ndarray, temporal_patch: int) -> jnp.ndarray:
    """(B, F, K, D) → (B·f, TP·K, D): whole-skeleton temporal blocks (HGATE)."""
    b, f_total, k, d = x.shape
    f = f_total // temporal_patch
    return x.reshape(b * f, temporal_patch * k, d)


def block_reverse(x: jnp.ndarray, temporal_patch: int, temporal_dim: int,
                  num_kps: int) -> jnp.ndarray:
    """Inverse of :func:`block_partition`."""
    d = x.shape[-1]
    f = temporal_dim // temporal_patch
    b = x.shape[0] // f
    return x.reshape(b, temporal_dim, num_kps, d)


def spatial_window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, F, K, D) → (B·nW, F·W, D): one spatial window over all frames (WGATE)."""
    b, f, k, d = x.shape
    nw = k // window_size
    x = x.reshape(b, f, nw, window_size, d).transpose(0, 2, 1, 3, 4)
    return x.reshape(b * nw, f * window_size, d)


def spatial_window_reverse(x: jnp.ndarray, window_size: int, temporal_dim: int,
                           num_kps: int) -> jnp.ndarray:
    """Inverse of :func:`spatial_window_partition`."""
    d = x.shape[-1]
    nw = num_kps // window_size
    b = x.shape[0] // nw
    x = x.reshape(b, nw, temporal_dim, window_size, d).transpose(0, 2, 1, 3, 4)
    return x.reshape(b, temporal_dim, num_kps, d)


def temporal_merge(x: jnp.ndarray, temporal_patch: int) -> jnp.ndarray:
    """(B, F, K, D) → (B, F/TP, K, TP·D).

    The reference transposes (TP, K) before flattening
    (`HWGATE.py:55-63`), so output channel c of joint k is
    [x[t=0,k,:], x[t=1,k,:], ...] concatenated — preserved here exactly.
    """
    b, f_total, k, d = x.shape
    f = f_total // temporal_patch
    x = x.reshape(b, f, temporal_patch, k, d).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, f, k, temporal_patch * d)


# --- Feature-major stream regime (round 4) ---------------------------------
#
# The wide-kernel program (ROADMAP batch-41/43) proved the ~1 ms/block
# "attn/reshape" cost is the price of CROSSING between the token-major
# (g, n, d) stream and any head-separated attention layout — whichever side
# of the kernel boundary the crossing sits on. These transforms keep the
# stream FEATURE-MAJOR (D, B, f, nW·TP·W) through LN/FFN/residual for a whole
# stage: the qkv projections (FeatureDense) emit the wide kernel's
# (H, DH, T_h, 128) input as a pure reshape, and the attention exit
# (FeatureDenseFromWide) contracts (h, dh) back in place — the per-block
# crossings disappear; the only full-stream relayout left is the model entry.
# The minor 128 lanes are ordered (nW, TP, W) — exactly one supertile of the
# wide kernel when nW·TP·W = 128 (the flagship: 4·2·16).


def feature_major_entry(x: jnp.ndarray, window_size: int,
                        temporal_patch: int) -> jnp.ndarray:
    """(B, F, K, D) → (D, B, f, nW·TP·W) — one real relayout per model."""
    b, f_total, k, d = x.shape
    tp, w = temporal_patch, window_size
    f, nw = f_total // tp, k // w
    x = x.reshape(b, f, tp, nw, w, d).transpose(5, 0, 1, 3, 2, 4)
    return x.reshape(d, b, f, nw * tp * w)


def feature_major_exit(xf: jnp.ndarray, window_size: int, temporal_patch: int,
                       num_kps: int) -> jnp.ndarray:
    """Inverse of :func:`feature_major_entry`."""
    d, b, f, _ = xf.shape
    tp, w = temporal_patch, window_size
    nw = num_kps // w
    x = xf.reshape(d, b, f, nw, tp, w).transpose(1, 2, 4, 3, 5, 0)
    return x.reshape(b, f * tp, num_kps, d)


def feature_major_roll(xf: jnp.ndarray, shift: int, window_size: int,
                       temporal_patch: int) -> jnp.ndarray:
    """``jnp.roll(x, shift, axis=F)`` expressed on the feature-major stream
    (the frame axis lives split as (f, TP) with TP inside the lane dim)."""
    d, b, f, length = xf.shape
    tp, w = temporal_patch, window_size
    nw = length // (tp * w)
    x = xf.reshape(d, b, f, nw, tp, w).transpose(0, 1, 2, 4, 3, 5)
    x = x.reshape(d, b, f * tp, nw, w)
    x = jnp.roll(x, shift, axis=2)
    x = x.reshape(d, b, f, tp, nw, w).transpose(0, 1, 2, 4, 3, 5)
    return x.reshape(d, b, f, length)


def feature_major_temporal_merge(xf: jnp.ndarray, window_size: int,
                                 temporal_patch: int) -> jnp.ndarray:
    """≡ :func:`temporal_merge` + the next stage's re-windowing, on the
    feature-major stream: (D, B, f, (nW,TP,W)) → (TP·D, B, f/TP, (nW,TP,W)).
    Merged channel order is (tp, d) major — identical to the token path's
    (…, TP·D) flatten."""
    d, b, f, length = xf.shape
    tp, w = temporal_patch, window_size
    nw = length // (tp * w)
    x = xf.reshape(d, b, f, nw, tp, w).transpose(4, 0, 1, 2, 3, 5)
    x = x.reshape(tp * d, b, f, nw, w)          # merged frames U = old f
    x = x.reshape(tp * d, b, f // tp, tp, nw, w).transpose(0, 1, 2, 4, 3, 5)
    return x.reshape(tp * d, b, f // tp, length)
