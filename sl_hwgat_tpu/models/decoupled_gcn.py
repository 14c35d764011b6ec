"""DecoupledGCN baseline — decoupled-group GCN with DropGraph and S/T/C attention.

Reference `hwgat/models/DecoupledGCN.py:10-488` (CVPR21Chal-SLR). Channel-last
(N, T, V, C) layout; the per-channel decoupled aggregation
``einsum('nkctv,kcvw->nctw')`` becomes ``einsum('ntvkc,kcvw->ntwc')``.

DropGraph (spatial/temporal) is train-only stochastic regularization driven by
the ``dropgraph`` RNG stream; the eval path is deterministic and parity-tested
against the reference.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sl_hwgat_tpu.graphs.partition import spatial_graph
from sl_hwgat_tpu.models.common import FastDropout, TorchBatchNorm


def find_drop_size(num_nodes: int, num_edges: int, k: int = 1) -> float:
    """Expected 1-hop neighborhood size. ≡ `DecoupledGCN.py:20-26`."""
    s = 0.0
    for i in range(1, k + 1):
        s += (2 * num_edges / num_nodes) * math.pow((2 * num_edges / num_nodes) - 1, i - 1)
    return s


def drop_graph_temporal(x, keep_prob, block_size, rng):
    """Temporal DropGraph on (N, T, V, C). ≡ `DecoupledGCN.py:29-54`."""
    n, t, v, c = x.shape
    ia = jnp.mean(jnp.abs(x), axis=(2, 3))                      # (N, T)
    ia = ia / jnp.sum(ia) * ia.size
    gamma = (1.0 - keep_prob) / block_size
    m = jax.random.bernoulli(rng, jnp.clip(ia * gamma, max=1.0)).astype(x.dtype)
    pad = block_size // 2
    mp = jnp.pad(m, ((0, 0), (pad, pad)), constant_values=0)
    windows = jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(mp, s, t, 1))(jnp.arange(block_size))
    m_dilated = jnp.max(windows, axis=0)                        # (N, T) max-pool1d
    mask = 1.0 - m_dilated
    return x * mask[:, :, None, None] * mask.size / jnp.sum(mask)


def drop_graph_spatial(x, keep_prob, adj_sum, drop_size, rng):
    """Spatial DropGraph on (N, T, V, C). ≡ `DecoupledGCN.py:57-82`."""
    n, t, v, c = x.shape
    ia = jnp.mean(jnp.abs(x), axis=(1, 3))                      # (N, V)
    ia = ia / jnp.sum(ia) * ia.size
    gamma = (1.0 - keep_prob) / (1.0 + drop_size)
    seed = jax.random.bernoulli(rng, jnp.clip(ia * gamma, max=1.0)).astype(x.dtype)
    m = seed @ adj_sum
    m = jnp.where(m > 0.001, 1.0, m)
    m = jnp.where(m < 0.5, 0.0, m)
    mask = (1.0 - m)[:, None, :, None]                          # (N,1,V,1)
    return x * mask * mask.size / jnp.sum(mask)


_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class TCNUnit(nn.Module):
    """Temporal conv + BN (+DropGraph applied by the caller). ≡ `DecoupledGCN.py:85-119`."""

    out_channels: int
    kernel_size: int = 9
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.kernel_size, 1),
            strides=(self.stride, 1),
            padding=((pad, pad), (0, 0)),
            kernel_init=_KAIMING,
            name="conv",
        )(x)
        return TorchBatchNorm(use_running_average=not train, name="bn")(x)


class DecoupledGCNUnit(nn.Module):
    """Per-channel learned adjacency aggregation. ≡ `DecoupledGCN.py:122-206`."""

    in_channels: int
    out_channels: int
    groups: int
    num_points: int
    adj_init: tuple  # static (3, V, V)
    num_subset: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, t, v, c = x.shape
        out_ch, g, s = self.out_channels, self.groups, self.num_subset
        a0 = np.asarray(self.adj_init, dtype=np.float32)        # (3, V, V)

        dec_a = self.param(
            "decoupled_A",
            lambda key: jnp.asarray(np.tile(a0[:, None], (1, g, 1, 1))),
        )                                                        # (3, G, V, V)
        lin_w = self.param(
            "linear_weight",
            nn.initializers.normal(stddev=math.sqrt(0.5 / (out_ch * s))),
            (self.in_channels, out_ch * s),
        )
        lin_b = self.param(
            "linear_bias", nn.initializers.constant(1e-6), (out_ch * s,)
        )

        # repeat groups → per-channel adjacency, then column-normalize with
        # eps 0.001 per subset. ≡ `norm()` `DecoupledGCN.py:175-183`.
        learn_adj = jnp.repeat(dec_a, out_ch // g, axis=1)       # (3, out_ch, V, V)
        deg = jnp.sum(learn_adj, axis=2)[:, :, None, :]          # (3, out_ch, 1, V)
        normed = learn_adj * (1.0 / (deg + 0.001))               # A @ diag(1/(D+eps))

        h = x @ lin_w + lin_b                                    # (N,T,V,3·out)
        h = TorchBatchNorm(use_running_average=not train, name="bn0")(h)
        h = h.reshape(n, t, v, s, out_ch)
        h = jnp.einsum("ntvkc,kcvw->ntwc", h, normed)
        h = TorchBatchNorm(
            use_running_average=not train, scale_init=nn.initializers.constant(1e-6), name="bn"
        )(h)

        if self.in_channels != self.out_channels:
            down = nn.Conv(out_ch, kernel_size=(1, 1), kernel_init=_KAIMING, name="down_conv")(x)
            down = TorchBatchNorm(use_running_average=not train, name="down_bn")(down)
        else:
            down = x
        return nn.relu(h + down)


class DecoupledBlock(nn.Module):
    """GCN unit + S/T/C attention + TCN + DropGraph residual. ≡ `DecoupledGCN.py:209-323`."""

    in_channels: int
    out_channels: int
    groups: int
    num_points: int
    block_size: int
    drop_size: float
    adj_init: tuple
    stride: int = 1
    residual: bool = True
    use_attention: bool = True

    @nn.compact
    def __call__(self, x, keep_prob, train: bool = False):
        a0 = np.asarray(self.adj_init, dtype=np.float32)
        adj_sum = jnp.asarray(a0.sum(axis=0))                    # (V, V) buffer `self.A`

        y = DecoupledGCNUnit(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            groups=self.groups,
            num_points=self.num_points,
            adj_init=self.adj_init,
            name="gcn1",
        )(x, train=train)

        if self.use_attention:
            # spatial attention: conv1d over joints on time-averaged features
            se = jnp.mean(y, axis=1)                             # (N, V, C)
            ker = self.num_points - 1 if self.num_points % 2 == 0 else self.num_points
            se1 = nn.Conv(
                1, kernel_size=(ker,), padding=((ker - 1) // 2,),
                kernel_init=nn.initializers.xavier_normal(), name="conv_sa",
            )(se)                                                # (N, V, 1)
            y = y * jax.nn.sigmoid(se1)[:, None, :, :] + y

            # temporal attention
            se = jnp.mean(y, axis=2)                             # (N, T, C)
            se1 = nn.Conv(
                1, kernel_size=(9,), padding=(4,),
                kernel_init=nn.initializers.zeros, name="conv_ta",
            )(se)
            y = y * jax.nn.sigmoid(se1)[:, :, None, :] + y

            # channel attention
            se = jnp.mean(y, axis=(1, 2))                        # (N, C)
            se1 = nn.relu(nn.Dense(self.out_channels // 2, kernel_init=_KAIMING, name="fc1c")(se))
            se2 = jax.nn.sigmoid(nn.Dense(self.out_channels, kernel_init=nn.initializers.zeros, name="fc2c")(se1))
            y = y * se2[:, None, None, :] + y

        y = TCNUnit(self.out_channels, stride=self.stride, name="tcn1")(y, train=train)
        apply_drop = train and keep_prob < 1.0
        if apply_drop:
            y = drop_graph_spatial(y, keep_prob, adj_sum, self.drop_size, self.make_rng("dropgraph"))
            y = drop_graph_temporal(y, keep_prob, self.block_size, self.make_rng("dropgraph"))

        if not self.residual:
            skip = 0.0
        elif self.in_channels == self.out_channels and self.stride == 1:
            skip = x
        else:
            skip = TCNUnit(self.out_channels, kernel_size=1, stride=self.stride, name="residual")(x, train=train)
        if apply_drop and not isinstance(skip, float):
            skip = drop_graph_spatial(skip, keep_prob, adj_sum, self.drop_size, self.make_rng("dropgraph"))
            skip = drop_graph_temporal(skip, keep_prob, self.block_size, self.make_rng("dropgraph"))
        return nn.relu(y + skip)


class DecoupledGCN(nn.Module):
    """10-block decoupled GCN classifier. Input (B, T, V=29, C) → logits.
    Defaults ≡ ``DecoupledGCNParams`` (`model_params.py:540-588`)."""

    in_channels: int = 2
    num_points: int = 29
    edges: tuple = ()
    groups: int = 8
    block_size: int = 41
    n_out_features: int = 256
    num_classes: int = 1000
    dropout_ratio: float = 0.0
    keep_prob: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, t, v, c = x.shape
        a = spatial_graph(self.num_points, [list(e) for e in self.edges]).astype(np.float32)
        adj_init = tuple(map(lambda m: tuple(map(tuple, m)), a.tolist()))
        drop_size = find_drop_size(self.num_points, len(self.edges))

        xb = x.reshape(n, t, v * c)
        xb = TorchBatchNorm(use_running_average=not train, name="data_bn")(xb)
        x = xb.reshape(n, t, v, c)

        schedule = [
            (self.in_channels, 64, 1, False, 1.0),
            (64, 64, 1, True, 1.0),
            (64, 64, 1, True, 1.0),
            (64, 64, 1, True, 1.0),
            (64, 128, 2, True, 1.0),
            (128, 128, 1, True, 1.0),
            (128, 128, 1, True, self.keep_prob),
            (128, 256, 2, True, self.keep_prob),
            (256, 256, 1, True, self.keep_prob),
            (256, self.n_out_features, 1, True, self.keep_prob),
        ]
        for i, (cin, cout, stride, res, kp) in enumerate(schedule):
            x = DecoupledBlock(
                in_channels=cin,
                out_channels=cout,
                groups=self.groups,
                num_points=self.num_points,
                block_size=self.block_size,
                drop_size=drop_size,
                adj_init=adj_init,
                stride=stride,
                residual=res,
                name=f"l{i + 1}",
            )(x, kp, train=train)

        x = jnp.mean(x, axis=(1, 2))
        x = FastDropout(self.dropout_ratio, deterministic=not train)(x)
        head_init = nn.initializers.normal(stddev=math.sqrt(2.0 / self.num_classes))
        return nn.Dense(self.num_classes, kernel_init=head_init, name="classifier")(x)


def decoupled_gcn_from_dataset(dataset_params: dict, input_dim: int, **overrides) -> DecoupledGCN:
    from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES

    kw = dict(
        in_channels=input_dim,
        num_points=29,
        edges=BODY29_EDGES,
        groups=8,
        block_size=41,
        n_out_features=256,
        num_classes=dataset_params["num_class"],
        dropout_ratio=0.0,
    )
    kw.update(overrides)
    return DecoupledGCN(**kw)
