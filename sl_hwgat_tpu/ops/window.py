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
