"""WGATE — windowed graph attention WITHOUT hierarchy.

Ablation model, reference `hwgat/models/WGATE.py:8-263`: 8 identical blocks at
constant dim 128; each spatial window attends over ALL its frames (F·16
tokens) under an additive block-tridiagonal mask (`model_params.py:210-229`).

TPU mapping: the reference materializes the (F·16)² additive mask and scores
(151 MB of mask alone at F=192). Here each frame attends only to its ±1 frame
band via ``banded_frame_attention`` — f32-exact, 64× less score work.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from sl_hwgat_tpu.graphs.adjacency import additive_mask, window_adj
from sl_hwgat_tpu.models.common import (
    DENSE_INIT,
    FastDropout,
    FeedForward,
    FourierEmbed,
    PositionalEncoding,
    layer_norm,
)
from sl_hwgat_tpu.ops.attention import (banded_frame_attention,
                                         compact_banded_frame_attention)
from sl_hwgat_tpu.ops.window import spatial_window_partition, spatial_window_reverse


def _band(spatial_adj: np.ndarray) -> np.ndarray:
    eye = np.eye(spatial_adj.shape[0], dtype=np.float32)
    return np.stack([additive_mask(eye), additive_mask(spatial_adj), additive_mask(eye)])


class BandedMSA(nn.Module):
    """MSA over (G, F·V, D) tokens with a ±1-frame banded additive mask.
    ≡ `WGATE.py:68-108` / `GATE.py:30-69` numerics."""

    dim: int
    num_heads: int
    band: tuple  # static (3, V, V) additive masks [prev | self | next]
    frames: int
    tokens_per_frame: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    compute_dtype: str = "float32"
    # 'auto' → on TPU with a diagonal ±1 band: the frame-packed fused
    # kernel ('pallas_packed') — the IN-MODEL winner at the FDMSE config
    # (tools/banded_inmodel_r05.md: GATE train 81.8 vs 165.2 ms, WGATE
    # train 230.7 vs 560.6 ms against banded-XLA, b16 bf16); everywhere
    # else banded XLA. 'banded' | 'compact' | 'ell' | 'pallas_banded'
    # force the alternatives (policy table in ROADMAP.md).
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        g, n, d = x.shape
        h, f, vtok = self.num_heads, self.frames, self.tokens_per_frame
        dh = d // h
        cdt = jnp.dtype(self.compute_dtype)
        from sl_hwgat_tpu.parallel.edge_partition import call_sharded_banded, sp_active

        # ZERO-PAD plane path (VERDICT r4 item 2 residual): when V is already
        # lane-exact (V == Vp, F·V % 128 == 0 — true for WGATE's 16-joint
        # windows) the packed kernel's (G·H, dh, F·Vp) planes are emittable
        # straight from TransposedDense projections (major-axis permutes
        # only) — the ~1.2 ms/chain pack relayout of the array-level entry
        # disappears. Param tree ≡ nn.Dense, checkpoints interchangeable.
        from sl_hwgat_tpu.ops.pallas_banded import (
            ROWS, _diag_band, pallas_packed_banded_attention_planes)

        bandn = np.asarray(self.band, np.float32)
        on_tpu = jax.default_backend() == "tpu"
        use_planes = (
            self.attn_impl in ("auto", "pallas_packed")
            and vtok in (8, 16, 32, 64, 128)       # V == Vp, no pad
            and (f * vtok) % ROWS == 0
            and _diag_band(bandn)
            and (on_tpu or self.attn_impl == "pallas_packed")
            and not sp_active()
        )
        if use_planes:
            from sl_hwgat_tpu.models.common import DenseFromTransposed, TransposedDense

            qp, kp, vp = (
                TransposedDense(d, dtype=cdt, name=nm)(x)       # (d, g, n)
                .reshape(h, dh, g, n).transpose(2, 0, 1, 3)      # (g, h, dh, n)
                .reshape(g * h, dh, n)
                for nm in ("q", "k", "v")
            )
            out = pallas_packed_banded_attention_planes(
                qp, kp, vp, bandn, scale=dh**-0.5, vp=vtok, frames=f)
            out = DenseFromTransposed(d, dtype=cdt, name="proj")(
                out.astype(cdt).reshape(g, h, dh, n))
            return FastDropout(self.proj_drop, deterministic=not train)(out)

        # Separate q/k/v projections (head-major output columns): a Megatron
        # tp column split P(None, 'tp') lands on head groups and propagates
        # through the head reshape — the fused (3, h, dh) layout's split
        # crosses the q/k boundary and forces GSPMD replication (see
        # models/hwgate.py::WindowedMSA).
        q, k, v = (
            nn.Dense(d, kernel_init=DENSE_INIT, dtype=cdt, name=nm)(x)
            .reshape(g, f, vtok, h, dh).transpose(0, 3, 1, 2, 4)  # (G,H,F,V,dh)
            for nm in ("q", "k", "v")
        )
        band = jnp.asarray(self.band, jnp.float32)
        # attn_impl 'auto' → banded XLA, the measured on-chip winner.
        # 'compact' selects the identity-temporal form (3× fewer SDDMM/SpMM
        # FLOPs, numerically equal — ops/attention.py::compact_banded_
        # frame_attention) — which LOSES on v5e (6.30ms vs 3.30ms fwd,
        # tools/kernel_batch33): with V=29 both score layouts lane-pad to
        # 128, so the "smaller" (V, V+2) tensor moves the same bytes and
        # pays extra concat/slice relayouts. Kept selectable: the tradeoff
        # flips wherever V·3 exceeds the lane width (V ≥ 43) or on hardware
        # without 128-lane padding. 'pallas_banded' = the fused kernel.
        compact = self.attn_impl == "compact"
        # Under make_sharded_steps with an sp axis, route through the explicit
        # edge-partitioned (halo-exchange) path (BASELINE config 5); falls
        # back to the plain banded op (GSPMD-propagated) otherwise.
        out = call_sharded_banded(q, k, v, band, scale=dh**-0.5,
                                  impl="compact" if compact else "banded")
        if out is None and self.attn_impl == "ell":
            # true edge-space (gather/scatter) formulation on the same
            # topology — measured 23× slower than banded on v5e
            # (tools/kernel_batch29: 76.3ms vs 3.3ms); selectable for
            # policy verification and non-banded topologies
            from sl_hwgat_tpu.ops.sparse_attention import (ell_from_band,
                                                           ell_graph_attention)

            col, val = ell_from_band(np.asarray(self.band[1], np.float32), f)
            qf, kf, vf = (t.reshape(g, h, f * vtok, dh) for t in (q, k, v))
            out = ell_graph_attention(qf, kf, vf, col, val, scale=dh**-0.5)
            out = out.reshape(g, h, f, vtok, dh)
        if out is None and self.attn_impl in ("auto", "pallas_packed"):
            # Round-4 frame-packed fused kernel: 0.90ms fwd / ~2.9ms bwd
            # kernel-only vs banded-XLA's 3.23/5.9ms; full drop-in chain
            # (incl. the (G,H,F,V,dh)→(G·H,dh,F·Vp) pack) 2.09ms fwd,
            # 5.01ms fwd+bwd — the measured on-chip winner on TPU.
            # Requires diagonal prev/next band planes; elsewhere (CPU, or
            # non-identity temporal structure) 'auto' falls through to
            # banded-XLA as before.
            from sl_hwgat_tpu.ops.pallas_banded import (
                ROWS, _diag_band, pallas_packed_banded_attention)

            bandn = np.asarray(self.band, np.float32)
            vp_ = next((c for c in (8, 16, 32, 64, 128) if vtok <= c), ROWS)
            on_tpu = jax.default_backend() == "tpu"
            if (_diag_band(bandn) and (f * vp_) % ROWS == 0
                    and (on_tpu or self.attn_impl == "pallas_packed")):
                out = pallas_packed_banded_attention(
                    q, k, v, bandn, scale=dh**-0.5)
        if out is None and self.attn_impl == "pallas_banded":
            from sl_hwgat_tpu.ops.pallas_banded import (
                ROWS, pallas_banded_frame_attention)

            vp_ = next((c for c in (16, 32, 64, 128) if vtok <= c), ROWS)
            if f % (ROWS // vp_) == 0:
                out = pallas_banded_frame_attention(
                    q, k, v, np.asarray(self.band, np.float32), scale=dh**-0.5)
        if out is None and compact:
            out = compact_banded_frame_attention(q, k, v, band[1], scale=dh**-0.5)
        if out is None:
            out = banded_frame_attention(q, k, v, band, scale=dh**-0.5)
        out = out.transpose(0, 2, 3, 1, 4).reshape(g, n, d)  # (G,F,V,H,dh) → (G,N,D)
        out = out.astype(cdt)
        out = nn.Dense(d, kernel_init=DENSE_INIT, dtype=cdt, name="proj")(out)
        return FastDropout(self.proj_drop, deterministic=not train)(out)


class WPartAttentionBlock(nn.Module):
    """Per-window full-clip attention block. ≡ `WGATE.py:128-162`."""

    dim: int
    num_heads: int
    window_size: int
    band: tuple
    frames: int
    drop: float = 0.0
    attn_drop: float = 0.0
    ff_ratio: float = 2.0
    compute_dtype: str = "float32"
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, f, k, d = x.shape
        shortcut = x
        xw = spatial_window_partition(x, self.window_size)
        xw = layer_norm("norm1")(xw)
        xw = BandedMSA(
            dim=self.dim,
            num_heads=self.num_heads,
            band=self.band,
            frames=f,
            tokens_per_frame=self.window_size,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            compute_dtype=self.compute_dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )(xw, train=train)
        x = shortcut + spatial_window_reverse(xw, self.window_size, f, k)
        x = x + FeedForward(
            hidden=int(self.dim * self.ff_ratio), out=self.dim, drop_rate=self.drop,
            compute_dtype=self.compute_dtype, name="ff",
        )(layer_norm("norm2")(x), train=train)
        return x


class WGATE(nn.Module):
    """Windowed (non-hierarchical) graph-attention classifier.
    Input (B, F, K=64, C) → logits. Defaults ≡ ``WGATEParams``
    (`model_params.py:80-96`)."""

    kp_dim: int = 2
    num_kps: int = 64
    temporal_dim: int = 192
    num_classes: int = 2002
    embed_dim: int = 128
    pe: bool = True
    depths: int = 8
    num_heads: int = 8
    window_size: int = 16
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.0
    ff_ratio: float = 2.0
    compute_dtype: str = "float32"
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        band = tuple(
            map(lambda a: tuple(map(tuple, a)), _band(window_adj(window_size=self.window_size)).tolist())
        )
        x = FourierEmbed(self.embed_dim, self.kp_dim, name="fourier")(x)
        if self.pe:
            x = PositionalEncoding(
                self.embed_dim, self.temporal_dim, self.drop_rate, name="pos_encoder"
            )(x, train=train)
        for i in range(self.depths):
            x = WPartAttentionBlock(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                band=band,
                frames=self.temporal_dim,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                ff_ratio=self.ff_ratio,
                compute_dtype=self.compute_dtype,
                attn_impl=self.attn_impl,
                name=f"layers_{i}",
            )(x, train=train)
        x = layer_norm("norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, kernel_init=DENSE_INIT, name="head")(x)


def wgate_from_dataset(dataset_params: dict, input_dim: int, **overrides) -> WGATE:
    kw = dict(
        kp_dim=input_dim,
        num_kps=64,
        temporal_dim=dataset_params["src_len"],
        num_classes=dataset_params["num_class"],
        embed_dim=128,
        pe=True,
        depths=8,
        num_heads=8,
        window_size=16,
        drop_rate=0.1,
        attn_drop_rate=0.0,
        ff_ratio=2.0,
    )
    kw.update(overrides)
    return WGATE(**kw)
