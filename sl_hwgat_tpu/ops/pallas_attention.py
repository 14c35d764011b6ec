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
    a = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    return a / jnp.sum(a, axis=-1, keepdims=True), s


def _tile_loop(body, tiles_per_step):
    """Iterate the per-supertile body.

    Default: python unroll (known-good Mosaic path on the v5e remote-compile
    relay). ``PALLAS_ATTN_FORI=1`` switches to ``lax.fori_loop`` with dynamic
    ref indexing — constant compile time in tiles_per_step, but unvalidated
    on-hardware compile behavior (see ROADMAP).
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


def _fwd_kernel(u_ref, q_ref, k_ref, v_ref, allowed_ref, fill_ref, o_ref,
                *, scale, zero_quirk, prune, tiles_per_step):
    allowed = allowed_ref[:]
    fill = fill_ref[:]
    pu = u_ref[0] if prune else None

    def body(g, _):
        v = v_ref[g]
        s = _sddmm(q_ref[g], k_ref[g], scale)
        a, _ = _masked_attn_matrix(s, allowed, fill, pu, zero_quirk)
        o_ref[g] = jnp.dot(a.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return 0

    _tile_loop(body, tiles_per_step)


def _bwd_kernel(u_ref, q_ref, k_ref, v_ref, do_ref, allowed_ref, fill_ref,
                dq_ref, dk_ref, dv_ref, *, scale, zero_quirk, prune, tiles_per_step):
    allowed = allowed_ref[:]
    fill = fill_ref[:]
    pu = u_ref[0] if prune else None

    def body(g, _):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        dt = q.dtype
        do = do_ref[g].astype(dt)
        s = _sddmm(q, k, scale)
        a, s_masked = _masked_attn_matrix(s, allowed, fill, pu, zero_quirk)
        a_lp = a.astype(dt)
        # dV = Aᵀ dO ; dA = dO Vᵀ — expressed as dot_generals (no transposes)
        dv_ref[g] = jax.lax.dot_general(
            a_lp, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dt)
        da = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
        # gradient flows only through entries that kept their raw score
        # (masked / zero / pruned entries were replaced by constants; the
        # prune mask itself is detached in the reference, HWGATE.py:95)
        passthrough = (s_masked == s).astype(jnp.float32)
        ds = (ds * passthrough).astype(dt)
        dq_ref[g] = (jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale).astype(dt)
        dk_ref[g] = (
            jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        ).astype(dt)
        return 0

    _tile_loop(body, tiles_per_step)


def _pad_stack(q, k, v, n, pad_tokens, stack):
    np_ = n if pad_tokens is None else pad_tokens
    if np_ != n:
        padcfg = [(0, 0), (0, np_ - n), (0, 0)]
        q, k, v = jnp.pad(q, padcfg), jnp.pad(k, padcfg), jnp.pad(v, padcfg)
    u, _, dh = q.shape
    t = u // stack
    sn = stack * np_
    return (x.reshape(t, sn, dh) for x in (q, k, v)), t, sn, np_


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


def _call(kernel, n_out, t, sn, dh, tiles_per_step, args, interpret,
          out_dtype=jnp.float32):
    grid = (t // tiles_per_step,)
    tile_spec = pl.BlockSpec(
        (tiles_per_step, sn, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec((sn, sn), lambda i: (0, 0), memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
    n_tensor_in = len(args) - 3  # minus scalar u and the two masks
    in_specs = [scalar_spec] + [tile_spec] * n_tensor_in + [mask_spec, mask_spec]
    out_specs = tuple([tile_spec] * n_out) if n_out > 1 else tile_spec
    shape = jax.ShapeDtypeStruct((t, sn, dh), out_dtype)
    out_shape = tuple([shape] * n_out) if n_out > 1 else shape
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


_ADJ_CACHE: dict[Any, np.ndarray] = {}


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _attention(q, k, v, u_val, prune, adj_key, scale, stack, pad_tokens, zero_quirk):
    out, _ = _attention_fwd(q, k, v, u_val, prune, adj_key, scale, stack, pad_tokens, zero_quirk)
    return out


def _attention_fwd(q, k, v, u_val, prune, adj_key, scale, stack, pad_tokens, zero_quirk):
    adj = _ADJ_CACHE[adj_key]
    u_units, n, dh = q.shape
    (qs, ks, vs), t, sn, np_ = _pad_stack(q, k, v, n, pad_tokens, stack)
    allowed_m, fill_m = _tile_masks(adj, n, np_, stack)
    tiles_per_step = _pick_tiles_per_step(t, sn, dh)
    kern = functools.partial(
        _fwd_kernel, scale=scale, zero_quirk=zero_quirk, prune=prune,
        tiles_per_step=tiles_per_step,
    )
    o = _call(
        kern, 1, t, sn, dh, tiles_per_step,
        (u_val, qs, ks, vs, jnp.asarray(allowed_m), jnp.asarray(fill_m)),
        _interpret(),
    )
    out = o.reshape(u_units, np_, dh)[:, :n]
    return out, (q, k, v, u_val)


def _attention_bwd(prune, adj_key, scale, stack, pad_tokens, zero_quirk, res, g):
    adj = _ADJ_CACHE[adj_key]
    q, k, v, u_val = res
    u_units, n, dh = q.shape
    (qs, ks, vs), t, sn, np_ = _pad_stack(q, k, v, n, pad_tokens, stack)
    if np_ != n:
        g = jnp.pad(g, [(0, 0), (0, np_ - n), (0, 0)])
    gs = g.reshape(t, sn, dh)
    allowed_m, fill_m = _tile_masks(adj, n, np_, stack)
    tiles_per_step = _pick_tiles_per_step(t, sn, dh)
    kern = functools.partial(
        _bwd_kernel, scale=scale, zero_quirk=zero_quirk, prune=prune,
        tiles_per_step=tiles_per_step,
    )
    dq, dk, dv = _call(
        kern, 3, t, sn, dh, tiles_per_step,
        (u_val, qs, ks, vs, gs, jnp.asarray(allowed_m), jnp.asarray(fill_m)),
        _interpret(), out_dtype=q.dtype,
    )

    def unstack(x):
        return x.reshape(u_units, np_, dh)[:, :n]

    return unstack(dq), unstack(dk), unstack(dv), None


_attention.defvjp(_attention_fwd, _attention_bwd)


def _pick_tiles_per_step(t: int, sn: int, dh: int) -> int:
    """Supertiles per grid step: enough to amortize grid overhead, small
    enough to keep q/k/v/(do)/outputs inside the 16MB scoped-VMEM limit.

    Accounting per tile: up to 8 streamed operands (q,k,v,do,o,dq,dk,dv) ×
    double buffering, plus per-iteration (SN,SN) score/attention intermediates
    the unrolled loop keeps live — budget conservatively."""
    import os

    override = os.environ.get("PALLAS_ATTN_TG")
    if override:
        tg = int(override)
        while t % tg:
            tg -= 1
        return max(1, tg)
    # Validated on-hardware configuration (bench completes reliably): the
    # per-tile term deliberately includes the score intermediates so the
    # unrolled default lands at tg≈8 for SN=128/dh=64.
    per_tile = 2 * 8 * sn * dh * 4 + 3 * sn * sn * 4
    budget = 8 * 1024 * 1024
    best = max(1, min(t, budget // max(per_tile, 1)))
    while t % best:
        best -= 1
    return best


def pallas_window_attention(q, k, v, adj: np.ndarray, *, scale: float,
                            stack: int = 4, pad_tokens: int | None = None,
                            zero_quirk: bool = True, prune_u=None):
    """Drop-in fused replacement for ``stacked_window_attention``.

    q, k, v: (U, N, dh) float32; ``adj``: static (N, N) {0,1} numpy mask.
    Differentiable via the fused backward kernel.
    """
    key = (adj.shape, adj.tobytes())
    _ADJ_CACHE.setdefault(key, np.asarray(adj, dtype=np.float32))
    prune = prune_u is not None
    u_val = jnp.asarray([prune_u if prune else 0.0], jnp.float32)
    return _attention(q, k, v, u_val, prune, key, float(scale), int(stack),
                      pad_tokens, bool(zero_quirk))
