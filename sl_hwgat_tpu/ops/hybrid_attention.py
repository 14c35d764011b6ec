"""Hybrid window attention: XLA batched GEMMs + fused Pallas masked-softmax.

Why (on-chip evidence, tools/kernel_batch*_results.jsonl):
- XLA's batched einsum on the kernel's exact matmul shapes runs 746µs f32 /
  477µs bf16 at the stage-0 working set — 2.9× faster than any matmul
  schedule Mosaic produces inside a Pallas kernel (unrolled 2264µs, batched
  dot_general 2086µs): the MXU pipelining of XLA's GEMM emitter is not
  reproducible from Pallas for 128×128×64 ops.
- But XLA's own fused attention chain (`stacked_window_attention`) is slow:
  2099µs f32 / 1912µs bf16 — the mask/softmax chain between the GEMMs costs
  ~3 extra HBM round-trips of the (T,SN,SN) score tensor.

So: let XLA do what it is best at (the two batched GEMMs) and Pallas do what
it is best at (ONE fused read→mask→softmax→write pass over the scores).
Scores make exactly one HBM round-trip; reference masking semantics
(multiplicative adjacency, zero-score quirk, train-time pruning, dual-mask
tail selection) are identical to `pallas_attention._masked_attn_matrix` and
tested against the stacked oracle.

The masked-softmax is a @jax.custom_vjp: backward is a second fused Pallas
pass computing dS = P·(dP − Σ(dP·P))·passthrough from the saved raw scores;
the GEMMs around it are differentiated by XLA as usual.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sl_hwgat_tpu.ops.pallas_attention import (
    _cache_adj,
    _interpret,
    _make_sel,
    _masked_attn_matrix,
    _masks,
    _pad_stack,
    _pick_tiles_per_step,
)


def _softmax_fwd_kernel(u_ref, sel_ref, s_ref, allowed_ref, fill_ref, p_ref,
                        *, zero_quirk, prune, tiles_per_step, dual):
    pu = u_ref[0] if prune else None
    for g in range(tiles_per_step):
        if dual:
            sel = sel_ref[pl.program_id(0) * tiles_per_step + g] == 1
            allowed = jnp.where(sel, allowed_ref[1], allowed_ref[0])
            fill = jnp.where(sel, fill_ref[1], fill_ref[0])
        else:
            allowed, fill = allowed_ref[:], fill_ref[:]
        a, _ = _masked_attn_matrix(s_ref[g].astype(jnp.float32), allowed,
                                   fill, pu, zero_quirk)
        p_ref[g] = a.astype(p_ref.dtype)


def _softmax_bwd_kernel(u_ref, sel_ref, s_ref, dp_ref, allowed_ref, fill_ref,
                        ds_ref, *, zero_quirk, prune, tiles_per_step, dual):
    pu = u_ref[0] if prune else None
    for g in range(tiles_per_step):
        if dual:
            sel = sel_ref[pl.program_id(0) * tiles_per_step + g] == 1
            allowed = jnp.where(sel, allowed_ref[1], allowed_ref[0])
            fill = jnp.where(sel, fill_ref[1], fill_ref[0])
        else:
            allowed, fill = allowed_ref[:], fill_ref[:]
        s = s_ref[g].astype(jnp.float32)
        a, s_masked = _masked_attn_matrix(s, allowed, fill, pu, zero_quirk)
        dp = dp_ref[g].astype(jnp.float32)
        ds = a * (dp - jnp.sum(dp * a, axis=-1, keepdims=True))
        ds_ref[g] = (ds * (s_masked == s).astype(jnp.float32)).astype(ds_ref.dtype)


def _softmax_call(kernel, t, sn, tiles_per_step, args, dual,
                  out_dtype=jnp.float32):
    grid = (t // tiles_per_step,)
    tile = pl.BlockSpec((tiles_per_step, sn, sn), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    if dual:
        mask = pl.BlockSpec((2, sn, sn), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        mask = pl.BlockSpec((sn, sn), lambda i: (0, 0), memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
    sel = pl.BlockSpec((t,), lambda i: (0,), memory_space=pltpu.SMEM)
    n_tiles_in = len(args) - 4
    in_specs = [scalar, sel] + [tile] * n_tiles_in + [mask, mask]
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((t, sn, sn), out_dtype),
        interpret=_interpret(),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _masked_softmax(s, u_val, sel, prune, adj_key_masks, shape_info, p_dtype):
    p, _ = _masked_softmax_fwd(s, u_val, sel, prune, adj_key_masks, shape_info,
                               p_dtype)
    return p


def _build(adj_key_masks, shape_info):
    adj_key, tail, zero_quirk = adj_key_masks
    n, np_, stack, sn = shape_info
    allowed_m, fill_m, dual = _masks(adj_key, tail, n, np_, stack)
    return allowed_m, fill_m, dual, zero_quirk


def _masked_softmax_fwd(s, u_val, sel, prune, adj_key_masks, shape_info,
                        p_dtype):
    allowed_m, fill_m, dual, zero_quirk = _build(adj_key_masks, shape_info)
    t, sn, _ = s.shape
    tiles_per_step, t_pad = _pick_tiles_per_step(t, sn, sn)
    if t_pad != t:  # hybrid keeps the divisor-only policy (no tile padding)
        tiles_per_step = next(d for d in range(tiles_per_step, 0, -1) if t % d == 0)
    kern = functools.partial(
        _softmax_fwd_kernel, zero_quirk=zero_quirk, prune=prune,
        tiles_per_step=tiles_per_step, dual=dual,
    )
    p = _softmax_call(kern, t, sn, tiles_per_step,
                      (u_val, sel, s, jnp.asarray(allowed_m), jnp.asarray(fill_m)),
                      dual, out_dtype=jnp.dtype(p_dtype))
    return p, (s, u_val, sel)


def _masked_softmax_bwd(prune, adj_key_masks, shape_info, p_dtype, res, dp):
    s, u_val, sel = res
    allowed_m, fill_m, dual, zero_quirk = _build(adj_key_masks, shape_info)
    t, sn, _ = s.shape
    tiles_per_step, t_pad = _pick_tiles_per_step(t, sn, sn)
    if t_pad != t:  # hybrid keeps the divisor-only policy (no tile padding)
        tiles_per_step = next(d for d in range(tiles_per_step, 0, -1) if t % d == 0)
    kern = functools.partial(
        _softmax_bwd_kernel, zero_quirk=zero_quirk, prune=prune,
        tiles_per_step=tiles_per_step, dual=dual,
    )
    ds = _softmax_call(kern, t, sn, tiles_per_step,
                       (u_val, sel, s, dp, jnp.asarray(allowed_m),
                        jnp.asarray(fill_m)),
                       dual, out_dtype=s.dtype)
    return ds, None, None


_masked_softmax.defvjp(_masked_softmax_fwd, _masked_softmax_bwd)


def hybrid_window_attention(q, k, v, adj: np.ndarray, *, scale: float,
                            stack: int = 4, pad_tokens: int | None = None,
                            zero_quirk: bool = True, prune_u=None,
                            tail_adj: np.ndarray | None = None,
                            units_per_group: int | None = None,
                            groups: int | None = None,
                            unit_offset=None):
    """Drop-in alternative to ``pallas_window_attention`` (same signature and
    numerics): XLA batched GEMMs around a fused Pallas masked-softmax."""
    adj_key = _cache_adj(adj)
    tail = None
    if tail_adj is not None:
        tail = (_cache_adj(tail_adj), int(units_per_group), int(groups))
    u_units, n, dh = q.shape
    (qs, ks, vs), t, sn, np_ = _pad_stack(q, k, v, n, pad_tokens, stack)
    sel = _make_sel(t, stack, tail, unit_offset)
    prune = prune_u is not None
    u_val = jnp.asarray([prune_u if prune else 0.0], jnp.float32)

    s = jnp.einsum("tnd,tmd->tnm", qs * jnp.asarray(scale, qs.dtype), ks,
                   preferred_element_type=jnp.float32)
    # PALLAS_HYBRID_S_BF16=1: store the score tensor in bf16 (halves its HBM
    # round-trip; the kernel upcasts to f32 for the softmax math). Slightly
    # perturbs the ==0 zero-quirk comparison vs f32 scores — experiment-gated
    # until training quality is validated on hardware.
    import os

    if os.environ.get("PALLAS_HYBRID_S_BF16") == "1" and vs.dtype == jnp.bfloat16:
        s = s.astype(jnp.bfloat16)
    # P is written in the value dtype: halves its HBM round-trip under bf16
    # and feeds the AV GEMM its native input type (softmax math stays f32).
    p = _masked_softmax(s, u_val, sel, prune, (adj_key, tail, bool(zero_quirk)),
                        (n, np_, stack, sn), jnp.dtype(vs.dtype).name)
    o = jnp.einsum("tnm,tmd->tnd", p, vs,
                   preferred_element_type=jnp.float32)
    return o.reshape(u_units, np_, dh)[:, :n]
